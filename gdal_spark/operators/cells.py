"""Hierarchical cell-cover compaction / expansion — the "vectorized
cell encode + compaction" stage of the north star (BASELINE.json):
replace every complete set of 4 sibling cells by their parent,
repeatedly, producing the minimal cover set — the S2 CellUnion
Normalize() / H3 compactCells operation, implemented over quad-tree
keys generally so the SAME machinery serves XYZ tiles (z, x, y) and
S2-style (face, pos) ids (gdal_spark.cellindex.s2: parent = bit-prefix
truncation ⇒ pos div 4).

Scale shape: one groupBy + one anti-join per level, both on the parent
key, over a set that SHRINKS 4× per promoted level — the total shuffled
volume is a geometric series bounded by 4/3 of the input. Levels are
bounded (≤30), so the driver loop is O(30) rounds of linear jobs, the
same discipline as the polygonize CC loop. No collect anywhere; the
cover can be 10^12 cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_quad_cells(
    df: DataFrame,
    z_col: str = "z",
    x_col: str = "x",
    y_col: str = "y",
    min_level: int = 0,
) -> DataFrame:
    """Minimal quad-tree cover of the input cell set (mixed levels
    allowed): any (z, x, y) whose 4 children are all present collapses
    to the parent (2x+dx, 2y+dy → x, y), cascading upward to
    `min_level`. Output columns (z, x, y), duplicates removed."""
    d = df.select(
        F.col(z_col).cast("int").alias("z"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).distinct()
    zmax = d.agg(F.max("z")).first()[0]  # bounded-metadata: one row
    if zmax is None or int(zmax) <= min_level:
        return d
    kept = d.where(F.col("z") <= F.lit(min_level))
    cur = d.where(F.col("z") > F.lit(min_level))
    for lvl in range(int(zmax), int(min_level), -1):
        at_l = cur.where(F.col("z") == lvl).distinct()
        rest = cur.where(F.col("z") != lvl)
        parents = at_l.groupBy(
            F.expr("x div 2").alias("px"), F.expr("y div 2").alias("py")
        ).count()
        complete = parents.where(F.col("count") == 4).select("px", "py")
        keep = at_l.join(
            complete,
            (F.expr("x div 2") == complete["px"])
            & (F.expr("y div 2") == complete["py"]),
            "left_anti",
        )
        kept = kept.unionByName(keep)
        promoted = complete.select(
            F.lit(lvl - 1).alias("z"),
            F.col("px").alias("x"),
            F.col("py").alias("y"),
        )
        cur = rest.unionByName(promoted)
    return kept.unionByName(cur)


def uncompact_quad_cells(df: DataFrame, level: int) -> DataFrame:
    """Inverse: expand every (z, x, y) with z <= level into its
    4^(level-z) descendants at `level` (H3 uncompactCells). Pure
    codegen — two sequence explodes, no Python, no shuffle."""
    k = f"({int(level)} - z)"
    seq = f"sequence(0, shiftleft(cast(1 as bigint), {k}) - 1)"
    return (
        df.where(F.col("z") <= level)
        .withColumn("_i", F.explode(F.expr(seq)))
        .withColumn("_j", F.explode(F.expr(seq)))
        .select(
            F.lit(int(level)).alias("z"),
            F.expr(f"x * shiftleft(cast(1 as bigint), {k}) + _i").alias("x"),
            F.expr(f"y * shiftleft(cast(1 as bigint), {k}) + _j").alias("y"),
        )
    )


def compact_pos_cells(
    df: DataFrame,
    face_col: str = "face",
    pos_col: str = "pos",
    level_col: str = "level",
    min_level: int = 0,
) -> DataFrame:
    """S2-style compaction over (face, hilbert-position) ids: parent =
    pos div 4 (one coarser Hilbert level), complete when all 4 child
    positions are present on the same face. Same loop/scale shape as
    the tile variant. Use cellindex.s2.cell_face_pos to derive the
    columns from packed cell ids (vectorized numpy, Arrow-side)."""
    d = df.select(
        F.col(face_col).cast("int").alias("face"),
        F.col(pos_col).cast("bigint").alias("pos"),
        F.col(level_col).cast("int").alias("level"),
    ).distinct()
    lmax = d.agg(F.max("level")).first()[0]  # bounded-metadata: one row
    if lmax is None or int(lmax) <= min_level:
        return d
    kept = d.where(F.col("level") <= F.lit(min_level))
    cur = d.where(F.col("level") > F.lit(min_level))
    for lvl in range(int(lmax), int(min_level), -1):
        at_l = cur.where(F.col("level") == lvl).distinct()
        rest = cur.where(F.col("level") != lvl)
        parents = at_l.groupBy(
            "face", F.expr("pos div 4").alias("ppos")
        ).count()
        complete = parents.where(F.col("count") == 4).select(
            F.col("face").alias("pface"), "ppos"
        )
        keep = at_l.join(
            complete,
            (F.col("face") == complete["pface"])
            & (F.expr("pos div 4") == complete["ppos"]),
            "left_anti",
        )
        kept = kept.unionByName(keep)
        promoted = complete.select(
            F.col("pface").alias("face"),
            F.col("ppos").alias("pos"),
            F.lit(lvl - 1).alias("level"),
        )
        cur = rest.unionByName(promoted)
    return kept.unionByName(cur)
