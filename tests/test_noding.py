"""Polygonize / BuildArea / constrained-Delaunay kernels
(ogr/ogr_geometry.h:588-591 parity) — numpy-level plus the registered
ST functions."""

import numpy as np
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.geometry.kernels import ring_area
from gdal_spark.geometry.noding import (
    build_area,
    cdt_polygon,
    node_lines,
    polygonize_lines,
)


def test_node_lines_splits_at_crossing():
    segs = node_lines(
        [np.array([[0.0, 0.0], [4.0, 4.0]]), np.array([[0.0, 4.0], [4.0, 0.0]])]
    )
    # each diagonal splits into 2 at (2,2) -> 4 segments, all meeting there
    assert len(segs) == 4
    assert all((2.0, 2.0) in s for s in segs)


def test_polygonize_square_with_diagonal_and_dangle():
    lines = [
        np.array([[0.0, 0.0], [4.0, 0.0]]),
        np.array([[4.0, 0.0], [4.0, 4.0]]),
        np.array([[4.0, 4.0], [0.0, 4.0]]),
        np.array([[0.0, 4.0], [0.0, 0.0]]),
        np.array([[0.0, 0.0], [4.0, 4.0]]),  # diagonal -> 2 faces
        np.array([[5.0, 5.0], [9.0, 9.0]]),  # dangle -> dropped
    ]
    faces = polygonize_lines(lines)
    assert len(faces) == 2
    assert sorted(round(ring_area(f), 9) for f in faces) == [8.0, 8.0]
    # every face ring is closed and CCW
    for f in faces:
        assert np.allclose(f[0], f[-1])
        assert ring_area(f) > 0


def test_polygonize_irregular_grid():
    """n vertical x m horizontal full-span lines -> (n-1)(m-1) faces
    whose areas sum to the bounding extent (the SQL-expressible
    invariant the oracle query uses)."""
    xs, ys = [0.0, 1.5, 4.0, 5.0], [0.0, 2.0, 7.0]
    lines = [np.array([[x, ys[0]], [x, ys[-1]]]) for x in xs]
    lines += [np.array([[xs[0], y], [xs[-1], y]]) for y in ys]
    faces = polygonize_lines(lines)
    assert len(faces) == (len(xs) - 1) * (len(ys) - 1)
    total = sum(ring_area(f) for f in faces)
    assert abs(total - (xs[-1] - xs[0]) * (ys[-1] - ys[0])) < 1e-9


def test_build_area_nesting():
    sq = lambda a, b: np.array(  # noqa: E731
        [[a, a], [b, a], [b, b], [a, b], [a, a]], dtype=float
    )
    # two nested rings -> one polygon with a hole
    polys = build_area([sq(0, 10), sq(3, 7)])
    assert len(polys) == 1 and len(polys[0]) == 2
    assert abs(ring_area(polys[0][0]) - 100.0) < 1e-9
    assert ring_area(polys[0][1]) < 0  # hole ring stored CW
    # three nested rings -> hole + island
    polys = build_area([sq(0, 10), sq(3, 7), sq(4, 6)])
    got = sorted((len(p), round(ring_area(p[0]), 6)) for p in polys)
    assert got == [(1, 4.0), (2, 100.0)]


def test_cdt_partitions_and_delaunay_property():
    L = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], dtype=float
    )
    tris = cdt_polygon([L])
    assert abs(sum(ring_area(t) for t in tris) - 12.0) < 1e-9
    assert all(ring_area(t) > 0 for t in tris)
    # constraint edges survive: every boundary edge appears in some tri
    key = lambda p: (round(p[0], 9), round(p[1], 9))  # noqa: E731
    tri_edges = set()
    for t in tris:
        for k in range(3):
            a, b = key(t[k]), key(t[(k + 1) % 3])
            tri_edges.add((a, b) if a < b else (b, a))
    for k in range(len(L) - 1):
        a, b = key(L[k]), key(L[k + 1])
        assert ((a, b) if a < b else (b, a)) in tri_edges
    # local Delaunay: no interior non-constraint edge is flippable
    from gdal_spark.geometry.noding import _in_circumcircle

    constraints = {
        ((a, b) if a < b else (b, a))
        for a, b in (
            (key(L[k]), key(L[k + 1])) for k in range(len(L) - 1)
        )
    }
    owners = {}
    for ti, t in enumerate(tris):
        for k in range(3):
            a, b = key(t[k]), key(t[(k + 1) % 3])
            owners.setdefault((a, b) if a < b else (b, a), []).append(ti)
    for e, own in owners.items():
        if len(own) != 2 or e in constraints:
            continue
        t1, t2 = tris[own[0]], tris[own[1]]
        ek = set(e)
        c = next(p for p in t1 if key(p) not in ek)
        d = next(p for p in t2 if key(p) not in ek)
        assert not _in_circumcircle(t1[0], t1[1], t1[2], d) or (
            np.cross(np.array(d) - np.array(c), np.array(e[0]) - np.array(c))
            * np.cross(np.array(d) - np.array(c), np.array(e[1]) - np.array(c))
            >= 0
        )


def test_cdt_polygon_with_hole():
    shell = np.array(
        [[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], dtype=float
    )
    hole = np.array([[3, 3], [5, 3], [5, 5], [3, 5], [3, 3]], dtype=float)
    tris = cdt_polygon([shell, hole])
    assert abs(sum(ring_area(t) for t in tris) - 60.0) < 1e-9
    # no triangle centroid falls inside the hole
    from gdal_spark.geometry.kernels import points_in_rings

    cx = np.array([t.mean(axis=0)[0] for t in tris])
    cy = np.array([t.mean(axis=0)[1] for t in tris])
    assert not points_in_rings(cx, cy, [hole]).any()


def test_st_polygonize_buildarea_cdt_sql(spark):
    from gdal_spark.functions import register_st_functions
    from gdal_spark.functions.st import register_extra_st

    register_st_functions(spark)
    register_extra_st(spark)
    rows = [
        (
            1,
            W.multilinestring_to_wkb(
                [
                    np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]]),
                    np.array([[4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]),
                    np.array([[0.0, 0.0], [4.0, 4.0]]),
                ]
            ),
        )
    ]
    df = spark.createDataFrame(rows, "id int, g binary")
    df.createOrReplaceTempView("linework")
    got = spark.sql(
        "select st_numgeometries(st_polygonize(g)) as n,"
        " round(st_area(st_polygonize(g)), 9) as a,"
        " st_area(st_buildarea(g)) as ba from linework"
    ).collect()[0]
    assert got.n == 2 and abs(got.a - 16.0) < 1e-9
    assert abs(got.ba - 16.0) < 1e-9

    poly = W.polygon_to_wkb(
        [np.array([[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [0.0, 6.0]])]
    )
    df2 = spark.createDataFrame([(1, poly)], "id int, g binary")
    df2.createOrReplaceTempView("polys_cdt")
    got = spark.sql(
        "select st_numgeometries(st_constraineddelaunaytriangles(g)) as n,"
        " round(st_area(st_constraineddelaunaytriangles(g)), 9) as a"
        " from polys_cdt"
    ).collect()[0]
    assert got.n >= 2 and abs(got.a - 36.0) < 1e-9
