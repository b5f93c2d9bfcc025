"""Coverage hygiene ops (reference apps/gdalalg_vector_check_geometry,
…_check_coverage, …_clean_coverage, …_simplify_coverage) on seeded
defect fixtures: a bowtie, an escaped hole, an overlap, a T-junction
mis-snap, a sliver gap, and a zigzag shared boundary."""

import numpy as np
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.operators.coverage import (
    check_coverage,
    check_geometry,
    clean_coverage,
    simplify_coverage,
    validate_geometry,
)


def sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )


def poly(*rings):
    return W.polygon_to_wkb([np.asarray(r, dtype=np.float64) for r in rings])


BOWTIE = np.array(
    [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=np.float64
)


# --------------------------------------------------------------------------
# check_geometry
# --------------------------------------------------------------------------


def test_validate_kernel_labels():
    assert validate_geometry(poly(sq(0, 0, 1, 1)))[0] is None
    err, x, y = validate_geometry(poly(BOWTIE))
    assert err == "Ring Self-intersection"
    assert (x, y) == (1.0, 1.0)  # the crossing point
    err, x, y = validate_geometry(poly(sq(0, 0, 1, 1), sq(5, 5, 6, 6)))
    assert err == "Hole lies outside shell"
    err, _, _ = validate_geometry(
        poly(sq(0, 0, 10, 10), sq(1, 1, 5, 5), sq(2, 2, 3, 3))
    )
    assert err == "Holes are nested"
    # non-simple linestring → self-intersection at the crossing
    ls = W.linestring_to_wkb(
        np.array([[0, 0], [2, 2], [2, 0], [0, 2]], dtype=np.float64)
    )
    err, x, y = validate_geometry(ls)
    assert err == "self-intersection"
    assert (x, y) == (1.0, 1.0)
    # points are always valid (reference warns, passes)
    assert validate_geometry(W.points_to_wkb([1.0], [2.0])[0])[0] is None


def test_check_geometry_df(spark):
    rows = [
        (1, poly(sq(0, 0, 1, 1))),
        (2, poly(BOWTIE)),
        (3, poly(sq(0, 0, 4, 4), sq(1, 1, 2, 2))),  # valid w/ hole
    ]
    df = spark.createDataFrame(rows, "id long, wkb binary")
    out = {r.id: r for r in check_geometry(df).collect()}
    assert set(out) == {2}
    assert out[2].error == "Ring Self-intersection"
    out2 = {r.id: r for r in check_geometry(df, include_valid=True).collect()}
    assert set(out2) == {1, 2, 3}
    assert out2[1].error is None and out2[3].error is None


# --------------------------------------------------------------------------
# check_coverage
# --------------------------------------------------------------------------


def grid_coverage():
    """Valid 2x2 unit-square coverage, ids 1..4."""
    return [
        (1, poly(sq(0, 0, 1, 1))),
        (2, poly(sq(1, 0, 2, 1))),
        (3, poly(sq(0, 1, 1, 2))),
        (4, poly(sq(1, 1, 2, 2))),
    ]


def test_check_coverage_valid_grid(spark):
    df = spark.createDataFrame(grid_coverage(), "id long, wkb binary")
    assert check_coverage(df).count() == 0


def test_check_coverage_overlap_flagged(spark):
    rows = grid_coverage()
    rows[0] = (1, poly(sq(0, 0, 1.25, 1)))  # overlaps feature 2
    df = spark.createDataFrame(rows, "id long, wkb binary")
    out = {r.id: r.n_invalid for r in check_coverage(df).collect()}
    assert 1 in out and 2 in out
    assert out[1] >= 1 and out[2] >= 1


def test_check_coverage_tjunction_flagged(spark):
    # feature 2's left edge is split at y=0.5; feature 1's right edge
    # is not → partial collinear overlap on both sides.
    left = poly(sq(0, 0, 1, 1))
    right = W.polygon_to_wkb(
        [
            np.array(
                [[1, 0], [2, 0], [2, 1], [1, 1], [1, 0.5], [1, 0]],
                dtype=np.float64,
            )
        ]
    )
    df = spark.createDataFrame(
        [(1, left), (2, right)], "id long, wkb binary"
    )
    out = {r.id for r in check_coverage(df).collect()}
    assert out == {1, 2}


# --------------------------------------------------------------------------
# clean_coverage
# --------------------------------------------------------------------------


def _areas(df):
    return {r.id: r.area for r in df.collect()}


def test_clean_overlap_min_index(spark):
    rows = [
        (1, poly(sq(0, 0, 1.5, 1))),  # overlaps 2 on [1, 1.5]
        (2, poly(sq(1, 0, 2, 1))),
    ]
    df = spark.createDataFrame(rows, "id long, wkb binary")
    out = _areas(clean_coverage(df, merge_strategy="min-index"))
    assert out[1] == pytest.approx(1.5)  # winner keeps
    assert out[2] == pytest.approx(0.5)  # loser cut back
    assert sum(out.values()) == pytest.approx(2.0)  # union area


def test_clean_overlap_strategies(spark):
    rows = [
        (1, poly(sq(0, 0, 1.5, 1))),  # area 1.5
        (2, poly(sq(1, 0, 3, 1))),  # area 2.0 — larger
    ]
    df = spark.createDataFrame(rows, "id long, wkb binary")
    out = _areas(clean_coverage(df, merge_strategy="max-area"))
    assert out[2] == pytest.approx(2.0) and out[1] == pytest.approx(1.0)
    out = _areas(clean_coverage(df, merge_strategy="min-area"))
    assert out[1] == pytest.approx(1.5) and out[2] == pytest.approx(1.5)
    # longest-border: overlap strip [1,1.5]x[0,1] — its border on ∂B
    # (x=1, length 1) exceeds its border on ∂A (x=1.5, length 1)…
    # equal here, so tie-break goes to the smaller id.
    out = _areas(clean_coverage(df, merge_strategy="longest-border"))
    assert sum(out.values()) == pytest.approx(3.0)


def test_clean_gap_closed(spark):
    # an ENCLOSED 0.02-wide sliver: feature 2's left edge notches back
    # to x=1.02 between y=0.4 and 0.6 (gaps open to the outside are
    # not gaps — GEOS only closes bounded uncovered faces)
    notched = np.array(
        [
            [1, 0], [2, 0], [2, 1], [1, 1],
            [1, 0.6], [1.02, 0.6], [1.02, 0.4], [1, 0.4],
            [1, 0],
        ],
        dtype=np.float64,
    )
    rows = [
        (1, poly(sq(0, 0, 1, 1))),
        (2, W.polygon_to_wkb([notched])),
    ]
    df = spark.createDataFrame(rows, "id long, wkb binary")
    out = _areas(
        clean_coverage(df, maximum_gap_width=0.05, cell_size=4.0)
    )
    assert sum(out.values()) == pytest.approx(2.0)  # sliver absorbed
    assert out[1] == pytest.approx(1.0)  # winner is the notched side
    # too narrow a budget → gap survives
    out = _areas(
        clean_coverage(df, maximum_gap_width=0.001, cell_size=4.0)
    )
    assert sum(out.values()) == pytest.approx(2.0 - 0.004)


def test_clean_snapping(spark):
    # vertex off by 1e-4 from the shared corner snaps onto it
    rows = [
        (1, poly(sq(0, 0, 1, 1))),
        (2, poly(np.array(
            [[1.0001, 0], [2, 0], [2, 1], [1.0001, 1], [1.0001, 0]]
        ))),
    ]
    df = spark.createDataFrame(rows, "id long, wkb binary")
    out = clean_coverage(df, snapping_distance=0.001)
    got = {r.id: W.parse_wkb(bytes(r.wkb)) for r in out.collect()}
    # feature 2's left edge now exactly at x=1
    t, parts = got[2]
    xs = np.vstack([r for (_, rs) in parts for r in rs])[:, 0]
    assert xs.min() == pytest.approx(1.0, abs=1e-12)


def test_clean_rejects_bad_strategy(spark):
    df = spark.createDataFrame(grid_coverage(), "id long, wkb binary")
    with pytest.raises(ValueError):
        clean_coverage(df, merge_strategy="nope")


# --------------------------------------------------------------------------
# simplify_coverage
# --------------------------------------------------------------------------


def zigzag_pair():
    """Two rectangles sharing a zigzag boundary at x≈5; exterior is
    the outline of [0,10]x[0,4]."""
    zz = [[5, 0], [5.4, 1], [4.6, 2], [5.4, 3], [5, 4]]
    left = np.array(
        [[0, 0]] + zz + [[0, 4], [0, 0]], dtype=np.float64
    )
    right = np.array(
        [[10, 0], [10, 4]] + zz[::-1] + [[10, 0]], dtype=np.float64
    )
    return [
        (1, W.polygon_to_wkb([left])),
        (2, W.polygon_to_wkb([right])),
    ]


def test_simplify_shared_arc_consistent(spark):
    df = spark.createDataFrame(zigzag_pair(), "id long, wkb binary")
    out = simplify_coverage(
        df, tolerance=2.0, preserve_boundary=True
    )
    rows = {r.id: r for r in out.collect()}
    # sum of areas is invariant when the exterior is preserved:
    # what one neighbor loses along the shared arc the other gains
    assert rows[1].area + rows[2].area == pytest.approx(40.0)
    # the zigzag actually simplified
    assert rows[1].n_points < 7 and rows[2].n_points < 7
    # and the result is still a valid coverage (identical shared arc)
    assert check_coverage(out.selectExpr("id", "wkb")).count() == 0


def test_simplify_zero_tolerance_identity(spark):
    df = spark.createDataFrame(zigzag_pair(), "id long, wkb binary")
    out = simplify_coverage(df, tolerance=0.0)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].area == pytest.approx(
        20.0 + 0.0, abs=1.0
    )  # unchanged shape: area of left polygon
    before = {r[0]: r[1] for r in zigzag_pair()}
    # vertex counts unchanged
    assert rows[1].n_points == 7
    del before


def test_simplify_without_preserve_boundary(spark):
    # add a redundant midpoint on the exterior; without
    # preserve_boundary it is dropped too
    left = np.array(
        [[0, 0], [5, 0], [5, 4], [0, 4], [0, 2], [0, 0]], dtype=np.float64
    )
    right = np.array(
        [[5, 0], [10, 0], [10, 4], [5, 4], [5, 0]], dtype=np.float64
    )
    df = spark.createDataFrame(
        [(1, W.polygon_to_wkb([left])), (2, W.polygon_to_wkb([right]))],
        "id long, wkb binary",
    )
    kept = simplify_coverage(df, tolerance=0.5, preserve_boundary=True)
    k = {r.id: r.n_points for r in kept.collect()}
    assert k[1] == 5  # collinear exterior vertex kept
    dropped = simplify_coverage(df, tolerance=0.5, preserve_boundary=False)
    d = {r.id: r.n_points for r in dropped.collect()}
    assert d[1] == 4  # …and dropped when the boundary may move
    # areas unchanged either way (collinear vertex carries no area)
    assert {r.id: r.area for r in dropped.collect()}[1] == pytest.approx(20.0)
