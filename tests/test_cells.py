"""Cell-cover compaction (operators/cells.py) — the S2 CellUnion
Normalize / H3 compactCells semantics over quad-tree tile keys and
S2-style (face, pos) ids."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.cellindex import s2
from gdal_spark.operators import cells as C


def _quad_df(spark, rows):
    return spark.createDataFrame(rows, "z int, x long, y long")


def _got(df):
    return {(r.z, r.x, r.y) for r in df.collect()}


def test_full_square_cascades_to_single_cell(spark):
    # all 16 z=5 descendants of (z=3, x=2, y=1) — two full cascade steps
    rows = [
        (5, 8 + i, 4 + j) for i in range(4) for j in range(4)
    ]
    out = C.compact_quad_cells(_quad_df(spark, rows))
    assert _got(out) == {(3, 2, 1)}


def test_partial_square_keeps_incomplete_branch(spark):
    rows = [(5, 8 + i, 4 + j) for i in range(4) for j in range(4)]
    rows.remove((5, 11, 7))  # break one z=4 family
    out = C.compact_quad_cells(_quad_df(spark, rows))
    got = _got(out)
    # three complete z=4 children collapse; the broken family keeps its
    # three z=5 cells; nothing completes at z=3
    assert (4, 4, 2) in got and (4, 5, 2) in got and (4, 4, 3) in got
    assert (3, 2, 1) not in got
    assert {(5, 10, 6), (5, 10, 7), (5, 11, 6)} <= got
    assert len(got) == 6


def test_mixed_levels_dedup_into_parent(spark):
    # parent given explicitly AND all 4 children: one parent row out
    rows = [(4, 6, 6)] + [(5, 12 + i, 12 + j) for i in range(2) for j in range(2)]
    out = C.compact_quad_cells(_quad_df(spark, rows))
    assert _got(out) == {(4, 6, 6)}


def test_uncompact_roundtrip(spark):
    rows = [(5, 8 + i, 4 + j) for i in range(4) for j in range(4)]
    compacted = C.compact_quad_cells(_quad_df(spark, rows))
    back = C.uncompact_quad_cells(compacted, 5)
    assert _got(back) == set((5, x, y) for (_, x, y) in rows)
    # uncompact alone is codegen-only: no Python evaluation nodes
    solo = C.uncompact_quad_cells(_quad_df(spark, [(3, 2, 1)]), 5)
    plan = solo._sc._jvm.PythonSQLUtils.explainString(
        solo._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    assert _got(solo) == set((5, x, y) for (_, x, y) in rows)


def test_s2_pos_compaction_matches_cell_parent(spark):
    # one level-9 cell's 16 level-11 descendants -> the level-9 cell
    c9 = s2.lonlat_to_cell(np.array([2.35]), np.array([48.85]), 9)
    f, p, _ = s2.cell_face_pos(c9)
    kids = [
        (int(f[0]), int(p[0]) * 16 + i, 11) for i in range(16)
    ]
    # plus an incomplete triple elsewhere on the same face
    kids += [(int(f[0]), int(p[0]) * 16 + 64 + i, 11) for i in range(3)]
    df = spark.createDataFrame(kids, "face int, pos long, level int")
    out = C.compact_pos_cells(df)
    got = {(r.face, r.pos, r.level) for r in out.collect()}
    assert (int(f[0]), int(p[0]), 9) in got
    assert len([g for g in got if g[2] == 11]) == 3
    assert len(got) == 4
    # repacking the compacted id equals cell_parent of any child
    packed = s2.face_pos_to_cell(f, p, np.array([9]))
    child0 = s2.face_pos_to_cell(
        f, np.array([int(p[0]) * 16]), np.array([11])
    )
    assert int(s2.cell_parent(child0, 9)[0]) == int(packed[0])


def test_compaction_volume_shrinks_geometrically(spark):
    """Scale-shape guard: a full cover at z compacts through every
    level; per-round row counts shrink 4x (the geometric-series bound
    in the module docstring)."""
    rows = [(4, i, j) for i in range(16) for j in range(16)]
    out = C.compact_quad_cells(_quad_df(spark, rows))
    assert _got(out) == {(0, 0, 0)}
