"""ST_* registry tests (SQL-callable geometry functions over WKB)."""

import numpy as np
import pytest

from gdal_spark.functions import register_st_functions
from gdal_spark.geometry import wkb as W
from gdal_spark.geometry import wkt as T


@pytest.fixture(scope="module")
def st(spark):
    register_st_functions(spark)
    sq = W.polygon_to_wkb(
        [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])]
    )
    sq_shift = W.polygon_to_wkb(
        [np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])]
    )
    far = W.polygon_to_wkb(
        [np.array([[10.0, 0.0], [12.0, 0.0], [12.0, 2.0], [10.0, 2.0]])]
    )
    spark.createDataFrame(
        [(1, bytearray(sq)), (2, bytearray(sq_shift)), (3, bytearray(far))],
        "id long, g binary",
    ).createOrReplaceTempView("shapes")
    return spark


def _one(st, expr):
    return st.sql(f"select {expr} as v from shapes where id = 1").collect()[0].v


def test_scalars(st):
    assert _one(st, "st_area(g)") == 4.0
    assert _one(st, "st_length(g)") == 8.0
    assert _one(st, "st_numpoints(g)") == 5  # closed ring
    assert _one(st, "st_isvalid(g)")
    assert _one(st, "st_srid(g)") == 4326
    assert _one(st, "st_x(st_centroid(g))") == 1.0
    assert _one(st, "st_y(st_centroid(g))") == 1.0
    assert _one(st, "st_astext(st_centroid(g))") == "POINT (1 1)"


def test_geomfromtext_roundtrip(st):
    row = st.sql(
        "select st_astext(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) as v"
    ).collect()[0]
    assert row.v == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    row = st.sql(
        "select st_area(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) as v"
    ).collect()[0]
    assert row.v == 1.0


def test_predicates_and_setops(st):
    m = st.sql(
        """
        select a.id as ia, b.id as ib,
               st_intersects(a.g, b.g) as inter,
               st_disjoint(a.g, b.g) as disj,
               round(st_distance(a.g, b.g), 6) as dist
        from shapes a join shapes b on a.id < b.id
        """
    ).collect()
    by = {(r.ia, r.ib): r for r in m}
    assert by[(1, 2)].inter and not by[(1, 2)].disj and by[(1, 2)].dist == 0.0
    assert not by[(1, 3)].inter and by[(1, 3)].disj and by[(1, 3)].dist == 8.0

    areas = st.sql(
        """
        select round(st_area(st_intersection(a.g, b.g)), 9) as i,
               round(st_area(st_union(a.g, b.g)), 9) as u,
               round(st_area(st_difference(a.g, b.g)), 9) as d,
               round(st_area(st_symdifference(a.g, b.g)), 9) as s
        from shapes a join shapes b on a.id = 1 and b.id = 2
        """
    ).collect()[0]
    assert areas.i == 1.0
    assert areas.u == 7.0
    assert areas.d == 3.0
    assert areas.s == 6.0


def test_contains_within(st):
    inner = W.polygon_to_wkb(
        [np.array([[0.5, 0.5], [1.0, 0.5], [1.0, 1.0], [0.5, 1.0]])]
    )
    st.createDataFrame([(9, bytearray(inner))], "id long, g binary") \
        .createOrReplaceTempView("inner_shape")
    r = st.sql(
        """
        select st_contains(s.g, i.g) as c, st_within(i.g, s.g) as w
        from shapes s cross join inner_shape i where s.id = 1
        """
    ).collect()[0]
    assert r.c and r.w


def test_buffer_hull_simplify(st):
    r = st.sql(
        """
        select round(st_area(st_buffer(g, cast(0.5 as double))), 3) as b,
               round(st_area(st_convexhull(g)), 6) as h,
               st_numpoints(st_simplify(g, cast(0.01 as double))) as s
        from shapes where id = 1
        """
    ).collect()[0]
    assert abs(r.b - (4.0 + 8.0 * 0.5 + np.pi * 0.25)) < 0.05
    assert r.h == 4.0
    assert r.s == 5


def test_envelope(st):
    r = st.sql(
        "select st_astext(st_envelope(g)) as v from shapes where id = 2"
    ).collect()[0]
    assert r.v == "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"


def test_wkt_module_roundtrip():
    for wkt in [
        "POINT (1.5 -2.25)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
    ]:
        assert T.wkb_to_wkt(T.wkt_to_wkb(wkt)) == wkt


def test_swap_xy_and_numgeometries(st):
    from gdal_spark.functions.st import register_extra_st

    register_extra_st(st)
    r = st.sql(
        "select st_astext(st_swapxy(st_geomfromtext('POINT (1 2)'))) as p, "
        "st_numgeometries(st_geomfromtext("
        "'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((2 2, 3 2, 3 3, 2 3, 2 2)))')) as n, "
        "st_numgeometries(g) as n1 from shapes where id = 1"
    ).collect()[0]
    assert r.p == "POINT (2 1)"
    assert r.n == 2 and r.n1 == 1
    # swap twice = identity on a polygon
    r2 = st.sql(
        "select st_astext(st_swapxy(st_swapxy(g))) = st_astext(g) as same "
        "from shapes where id = 2"
    ).collect()[0]
    assert r2.same


def test_explode_collections(st):
    import numpy as np

    from gdal_spark.geometry import wkb as W2
    from gdal_spark.operators.layer_algebra import explode_collections

    mp = W2.multipolygon_to_wkb(
        [
            [np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])],
            [np.array([[5.0, 5], [6, 5], [6, 6], [5, 6]])],
        ]
    )
    single = W2.polygon_to_wkb([np.array([[9.0, 9], [10, 9], [10, 10]])])
    df = st.createDataFrame(
        [(1, bytearray(mp)), (2, bytearray(single))],
        "polygon_id long, geometry binary",
    )
    rows = explode_collections(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r.polygon_id, []).append(r)
    assert len(by[1]) == 2 and len(by[2]) == 1
    t0, payload = W2.parse_wkb(bytes(by[1][0].geometry))
    assert t0 == W2.POLYGON


def _sq(x0, y0, s):
    import numpy as np

    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], dtype=float
    )


def test_hole_aware_predicates():
    """ogr/ogrgeometry.cpp:569-599 semantics: interior rings flip
    containment — a geometry inside a hole does NOT intersect."""
    import numpy as np

    from gdal_spark.functions.st import _predicate
    from gdal_spark.geometry import wkb as W

    donut = W.polygon_to_wkb([_sq(0, 0, 10), _sq(3, 3, 4)])
    pt_in_hole = W.points_to_wkb([5.0], [5.0])[0]
    pt_in_ring = W.points_to_wkb([1.0], [1.0])[0]
    poly_in_hole = W.polygon_to_wkb([_sq(4, 4, 2)])
    straddler = W.polygon_to_wkb([_sq(2, 2, 3)])
    assert not _predicate("intersects", donut, pt_in_hole)
    assert _predicate("intersects", donut, pt_in_ring)
    assert _predicate("contains", donut, pt_in_ring)
    assert not _predicate("contains", donut, pt_in_hole)
    assert not _predicate("intersects", donut, poly_in_hole)
    assert _predicate("disjoint", donut, poly_in_hole)
    assert _predicate("overlaps", donut, straddler)
    assert not _predicate("contains", donut, straddler)


def test_touches_crosses_overlaps_equals():
    import numpy as np

    from gdal_spark.functions.st import _predicate
    from gdal_spark.geometry import wkb as W

    plain = W.polygon_to_wkb([_sq(0, 0, 10)])
    adj = W.polygon_to_wkb([_sq(10, 0, 5)])  # shares the x=10 edge
    corner = W.polygon_to_wkb([_sq(10, 10, 5)])  # shares one vertex
    overl = W.polygon_to_wkb([_sq(8, 8, 5)])
    rot = W.polygon_to_wkb(
        [np.array([[10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)]
    )
    line = W.linestring_to_wkb(np.array([[-1, 5], [11, 5]], dtype=float))
    line_touch = W.linestring_to_wkb(np.array([[10, 2], [15, 2]], dtype=float))
    assert _predicate("touches", plain, adj)
    assert _predicate("touches", plain, corner)
    assert not _predicate("overlaps", plain, adj)
    assert _predicate("overlaps", plain, overl)
    assert not _predicate("touches", plain, overl)
    assert _predicate("equals", plain, rot)
    assert _predicate("contains", plain, rot)
    assert _predicate("within", plain, rot)
    assert _predicate("crosses", line, plain)
    assert not _predicate("crosses", line_touch, plain)
    assert not _predicate("crosses", plain, overl)  # area×area: false


def test_set_ops_multipolygon_and_line():
    """Set ops over the wider WKB lattice (ogr/ogr_core.h:422-556):
    MultiPolygon operands decompose into parts; line ∩ polygon clips to
    (multi)linestrings. Area/length invariants exact."""
    import numpy as np

    from gdal_spark.functions.st import (
        _difference,
        _intersection,
        _sym_difference,
        _union,
    )
    from gdal_spark.geometry.kernels import polygon_area
    from gdal_spark.geometry import wkb as W

    def area_of(buf):
        t, payload = W.parse_wkb(buf)
        if t == W.POLYGON:
            return polygon_area(payload)
        return sum(polygon_area(rings) for (_, rings) in payload)

    mp = W.multipolygon_to_wkb([[_sq(0, 0, 4)], [_sq(10, 0, 4)]])  # two squares
    big = W.polygon_to_wkb([_sq(2, -1, 10)])  # overlaps both parts
    inter = _intersection(mp, big)
    assert abs(area_of(inter) - (2 * 4 + 2 * 4)) < 1e-9  # 8 + 8
    diff = _difference(mp, big)
    assert abs(area_of(diff) - (16 + 16 - 16)) < 1e-9
    uni = _union(mp, big)
    assert abs(area_of(uni) - (16 + 16 + 100 - 16)) < 1e-9
    sym = _sym_difference(mp, big)
    assert abs(area_of(sym) - (16 + 16 + 100 - 2 * 16)) < 1e-9

    line = W.linestring_to_wkb(np.array([[-5.0, 2.0], [20.0, 2.0]]))
    out = _intersection(line, mp)
    t, payload = W.parse_wkb(out)
    assert t == W.MULTILINESTRING
    total = sum(
        float(np.hypot(*(p[1][-1] - p[1][0]))) for p in payload
    )
    assert abs(total - 8.0) < 1e-9  # 4 in each square


def test_constructive_set(spark):
    """MakeValid / DelaunayTriangles / ConcaveHull / Segmentize /
    SetPrecision registry surface (ogr/ogr_geometry.h:429-600)."""
    import numpy as np

    from gdal_spark.functions import register_st_functions
    from gdal_spark.geometry import wkb as W
    from gdal_spark.geometry.kernels import polygon_area

    register_st_functions(spark)
    # ring with a duplicate vertex → makevalid drops it
    bad = W.polygon_to_wkb(
        [np.array([[0, 0], [4, 0], [4, 0], [4, 4], [0, 4]], dtype=float)]
    )
    sq = W.polygon_to_wkb([_sq(0, 0, 4)])
    df = spark.createDataFrame([(1, bad), (2, sq)], "id long, g binary")
    df.createOrReplaceTempView("cg")
    rows = spark.sql(
        """
        select id,
               st_numpoints(st_makevalid(g)) as np_valid,
               st_area(st_delaunaytriangles(g)) as tri_area,
               st_area(st_concavehull(g, cast(100.0 as double))) as hull_area,
               st_numpoints(st_segmentize(g, cast(1.0 as double))) as np_seg,
               st_astext(st_setprecision(st_makepoint(
                   cast(1.2345 as double), cast(2.5 as double)),
                   cast(0.5 as double))) is not null as prec_ok
        from cg order by id
        """
    ).collect()
    assert rows[0].np_valid == 5  # duplicate dropped, closed ring = 4+1
    for r in rows:
        assert abs(r.tri_area - 16.0) < 1e-9  # triangles tile the square
        assert abs(r.hull_area - 16.0) < 1e-9
        assert r.np_seg > 5  # segmentize added vertices


def test_set_ops_with_holes():
    """Hole-aware set operations: A = Ae − ∪holes identities
    (ogr/ogrgeometry.cpp Intersection/Difference/Union with interior
    rings). All areas exact."""
    import numpy as np

    from gdal_spark.functions.st import (
        _difference,
        _intersection,
        _sym_difference,
        _union,
    )
    from gdal_spark.geometry import wkb as W
    from gdal_spark.geometry.kernels import polygon_area

    def area(buf):
        if buf is None:
            return 0.0
        t, p = W.parse_wkb(buf)
        return (
            polygon_area(p)
            if t == W.POLYGON
            else sum(polygon_area(r) for (_, r) in p)
        )

    donut = W.polygon_to_wkb([_sq(0, 0, 10), _sq(3, 3, 4)])  # 84
    probe = W.polygon_to_wkb([_sq(2, 2, 6)])  # 36, overlapping the hole
    big = W.polygon_to_wkb([_sq(-2, -2, 20)])  # 400, covers donut
    assert area(_intersection(donut, probe)) == 20.0
    assert area(_difference(probe, donut)) == 16.0  # exactly the hole
    assert area(_difference(donut, probe)) == 64.0
    assert area(_union(donut, probe)) == 100.0
    assert area(_sym_difference(donut, probe)) == 80.0
    assert area(_difference(big, donut)) == 316.0
    assert area(_intersection(donut, big)) == 84.0


def test_boundary_normalize_simple_union_project(spark):
    """Remaining OGRGeometry method surface (ogr/ogr_geometry.h:429-600):
    Boundary, Normalize, IsSimple, IsRing, UnaryUnion, Project."""
    import numpy as np

    from gdal_spark.functions.st import (
        _boundary,
        _is_ring,
        _is_simple,
        _normalize,
        _project_point,
        _unary_union,
    )
    from gdal_spark.geometry import wkb as W
    from gdal_spark.geometry.kernels import EARTH_RADIUS_M, polygon_area

    donut = W.polygon_to_wkb([_sq(0, 0, 10), _sq(3, 3, 4)])
    t, rings = W.parse_wkb(_boundary(donut))
    assert t == W.MULTILINESTRING and len(rings) == 2
    # normalize: rotated/reversed square canonicalizes identically
    a = W.polygon_to_wkb([_sq(0, 0, 4)])
    b = W.polygon_to_wkb(
        [np.array([[4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)]
    )
    assert _normalize(a) == _normalize(b)
    bow = W.linestring_to_wkb(np.array([[0, 0], [2, 2], [2, 0], [0, 2]], float))
    assert not _is_simple(bow)
    ring = W.linestring_to_wkb(
        np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    )
    assert _is_ring(ring) and not _is_ring(bow)
    mp = W.multipolygon_to_wkb([[_sq(0, 0, 4)], [_sq(2, 2, 4)]])
    t2, pl2 = W.parse_wkb(_unary_union(mp))
    area = (
        polygon_area(pl2)
        if t2 == W.POLYGON
        else sum(polygon_area(r) for (_, r) in pl2)
    )
    assert abs(area - 28.0) < 1e-9  # 16 + 16 − 4 overlap
    pt = W.points_to_wkb([0.0], [0.0])[0]
    dest = W.parse_wkb(
        _project_point(pt, np.pi / 4 * EARTH_RADIUS_M, 90.0)
    )[1]
    assert abs(dest[0, 0] - 45.0) < 1e-9 and abs(dest[0, 1]) < 1e-9


def test_line_intersection_with_holes():
    """line ∩ donut: pieces skip the hole; total length exact."""
    import numpy as np

    from gdal_spark.functions.st import _intersection
    from gdal_spark.geometry import wkb as W

    donut = W.polygon_to_wkb([_sq(0, 0, 10), _sq(3, 3, 4)])
    line = W.linestring_to_wkb(np.array([[-5.0, 5.0], [15.0, 5.0]]))
    out = _intersection(line, donut)
    t, payload = W.parse_wkb(out)
    assert t == W.MULTILINESTRING and len(payload) == 2
    total = sum(float(np.hypot(*(p[1][-1] - p[1][0]))) for p in payload)
    assert abs(total - 6.0) < 1e-9  # (0..3) + (7..10)


def _sq_wkb(x0, y0, s=1.0):
    import numpy as np
    from gdal_spark.geometry import wkb as W

    ring = np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]
    )
    return W.polygon_to_wkb([ring])


def test_batch_setop_matches_each2():
    """Bbox-prescreened batch set ops == per-pair kernel, on a mixed
    batch (disjoint, overlapping, touching, identical pairs)."""
    import pandas as pd

    from gdal_spark.functions import st as S
    from gdal_spark.geometry import wkb as W
    from gdal_spark.geometry.kernels import polygon_area

    a = [_sq_wkb(0, 0), _sq_wkb(0, 0), _sq_wkb(0, 0), _sq_wkb(0, 0), _sq_wkb(2, 2)]
    b = [_sq_wkb(5, 5), _sq_wkb(0.5, 0.5), _sq_wkb(1, 0), _sq_wkb(0, 0), _sq_wkb(-3, -3)]
    sa, sb = pd.Series(a), pd.Series(b)

    def areas(series):
        out = []
        for buf in series:
            if buf is None:
                out.append(0.0)
            else:
                out.append(
                    round(sum(abs(polygon_area([r]))
                              for r in W.polygon_rings(bytes(buf))), 9)
                )
        return out

    for fn, op in [
        (S._intersection, "intersection"),
        (S._difference, "difference"),
        (S._union, "union"),
        (S._sym_difference, "symdifference"),
    ]:
        fast = S._batch_setop(sa, sb, fn, op)
        slow = S._each2(sa, sb, fn)
        assert areas(fast) == areas(slow), op
        # disjoint intersection is empty in both paths
        if op == "intersection":
            assert fast[0] is None and slow[0] is None


def test_batch_astext_envelope_byte_parity():
    """The uniform-batch fast paths emit byte-identical results to the
    per-row fallbacks."""
    import pandas as pd

    from gdal_spark.functions import st as S
    from gdal_spark.geometry import wkt as T

    polys = [_sq_wkb(0, 0), _sq_wkb(1.25, -2.5, 3.0), _sq_wkb(1e6, 1e-6, 0.125)]
    s = pd.Series(polys)
    assert list(S._batch_astext(s)) == [T.wkb_to_wkt(b) for b in polys]
    assert [bytes(v) for v in S._batch_envelope(s)] == [
        S._envelope(b) for b in polys
    ]
    # non-uniform batch (a point) falls back cleanly
    from gdal_spark.geometry import wkb as W
    import numpy as np

    mixed = pd.Series([_sq_wkb(0, 0), W.points_to_wkb(
        np.array([1.0]), np.array([2.0]))[0]])
    assert list(S._batch_astext(mixed)) == [
        T.wkb_to_wkt(bytes(b)) for b in mixed
    ]


def test_batch_setop_microbench():
    """PLANS.md evidence: the prescreened path is >=5x faster than
    _each2 on a mostly-disjoint batch (the big-select shape)."""
    import time

    import pandas as pd

    from gdal_spark.functions import st as S

    n = 2000
    a = pd.Series([_sq_wkb(3 * (i % 50), 3 * (i // 50)) for i in range(n)])
    b = pd.Series([_sq_wkb(3 * ((i + 7) % 50) + 0.25, 3 * (((i + 7) % n) // 50) + 0.25)
                   for i in range(n)])
    t0 = time.perf_counter()
    fast = S._batch_setop(a, b, S._intersection, "intersection")
    t1 = time.perf_counter()
    slow = S._each2(a, b, S._intersection)
    t2 = time.perf_counter()
    speedup = (t2 - t1) / max(t1 - t0, 1e-9)
    assert [v is None for v in fast] == [v is None for v in slow]
    assert speedup >= 5.0, f"speedup {speedup:.1f}x"


def test_st_multi_promotion(spark):
    """st_multi (forceTo wkbMulti*, apps/gdalalg_vector_set_geom_type):
    single geometries wrap in the matching container, numgeometries
    becomes 1, type string changes, multis pass through unchanged."""
    from gdal_spark import tables
    from gdal_spark.functions import register_st_functions
    from gdal_spark.geometry import wkb as W

    register_st_functions(spark)
    pid = 3
    poly = W.polygon_to_wkb([tables.polygon_rings_local(pid)])
    pt = W.points_to_wkb([1.5], [2.5])[0]
    df = spark.createDataFrame(
        [(0, bytearray(pt)), (1, bytearray(poly))],
        "fid long, geometry binary",
    )
    rows = {
        r.fid: r
        for r in df.selectExpr(
            "fid",
            "st_geometrytype(st_multi(geometry)) as t",
            "st_numgeometries(st_multi(geometry)) as n",
            "st_multi(st_multi(geometry)) = st_multi(geometry) as idem",
            "st_area(st_multi(geometry)) = st_area(geometry) as area_eq",
        ).collect()
    }
    assert rows[0].t == "MULTIPOINT" and rows[0].n == 1 and rows[0].idem
    assert rows[1].t == "MULTIPOLYGON" and rows[1].n == 1
    assert rows[1].idem and rows[1].area_eq
