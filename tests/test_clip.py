"""Geometry clipping kernel tests — area invariants + golden shapes."""

import numpy as np
import pytest

from gdal_spark.geometry import clip as C
from gdal_spark.geometry.kernels import ring_area
from gdal_spark.tables import polygon_b_ring_local, polygon_rings_local

SQ = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
SQ_SHIFT = SQ + 1.0  # overlaps in [1,2]^2


def area(r):
    return abs(ring_area(r))


def pieces_area(ps):
    return sum(area(p) for p in ps)


def test_clip_convex_squares():
    inter = C.clip_convex(SQ, SQ_SHIFT)
    assert area(inter) == pytest.approx(1.0, abs=1e-12)
    assert sorted(map(tuple, inter.tolist())) == [
        (1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)
    ]


def test_clip_disjoint_and_contained():
    far = SQ + 10.0
    assert len(C.clip_convex(SQ, far)) == 0
    small = SQ * 0.25 + 0.5
    inter = C.clip_convex(small, SQ)
    assert area(inter) == pytest.approx(0.25, abs=1e-12)


def test_difference_decomposition_invariant():
    d = C.difference_convex(SQ, SQ_SHIFT)
    assert pieces_area(d) == pytest.approx(4.0 - 1.0, abs=1e-12)
    # pieces are disjoint: pairwise intersection empty
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            inter = C.clip_convex(d[i], d[j])
            assert len(inter) == 0 or area(inter) < 1e-12


def test_union_symdiff_areas():
    u = C.union_convex(SQ, SQ_SHIFT)
    assert pieces_area(u) == pytest.approx(4.0 + 4.0 - 1.0, abs=1e-12)
    s = C.sym_difference_convex(SQ, SQ_SHIFT)
    assert pieces_area(s) == pytest.approx(4.0 + 4.0 - 2.0, abs=1e-12)


@pytest.mark.parametrize("n", range(0, 25, 5))
def test_octagon_invariants(n):
    a = polygon_rings_local(n)[:-1]
    b = polygon_b_ring_local(n)
    ia = area(C.clip_convex(a, b)) if len(C.clip_convex(a, b)) else 0.0
    da = pieces_area(C.difference_convex(a, b))
    assert ia + da == pytest.approx(area(a), rel=1e-10)
    ua = pieces_area(C.union_convex(a, b))
    assert ua == pytest.approx(area(a) + area(b) - ia, rel=1e-10)


def test_concave_subject_convex_clip():
    """Subjects may be concave (L-shape); clip is convex."""
    L = np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], dtype=np.float64
    )
    win = np.array([[0.5, 0.5], [2.5, 0.5], [2.5, 2.5], [0.5, 2.5]])
    inter = C.clip_convex(L, win)
    # L ∩ window: bottom bar part (2.0 x 0.5) + left column part (0.5 x 2.0)
    # = 1.0 + 1.0 minus double-counted corner 0.25 -> 1.75
    assert area(inter) == pytest.approx(1.75, abs=1e-12)
    d = C.difference_convex(L, win)
    assert pieces_area(d) == pytest.approx(area(L) - 1.75, abs=1e-12)


def test_predicates():
    assert C.polygons_intersect(SQ, SQ_SHIFT)
    assert not C.polygons_intersect(SQ, SQ + 10.0)
    assert C.polygon_contains(SQ, SQ * 0.25 + 0.5)
    assert not C.polygon_contains(SQ, SQ_SHIFT)
    # containment also counts as intersecting
    assert C.polygons_intersect(SQ, SQ * 0.25 + 0.5)


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]])
    h = C.convex_hull(pts)
    assert area(h) == pytest.approx(4.0, abs=1e-12)
    assert len(h) == 4


def test_simplify_dp():
    # square with a redundant midpoint on each edge
    r = np.array(
        [[0, 0], [1, 0], [2, 0], [2, 1], [2, 2], [1, 2], [0, 2], [0, 1]],
        dtype=np.float64,
    )
    s = C.simplify_dp(r, tol=0.01)
    assert len(s) == 4
    assert area(s) == pytest.approx(4.0, abs=1e-12)
    # below-tolerance wiggle removed, above-tolerance kept
    r2 = r.astype(float)
    r2[1, 1] = 0.005
    assert len(C.simplify_dp(r2, tol=0.01)) == 4
    r2[1, 1] = 0.5
    assert len(C.simplify_dp(r2, tol=0.01)) == 5


def test_segmentize():
    seg = C.segmentize(SQ, max_len=0.5)
    d = np.diff(np.vstack([seg, seg[:1]]), axis=0)
    assert np.hypot(d[:, 0], d[:, 1]).max() <= 0.5 + 1e-12
    assert area(seg) == pytest.approx(4.0, abs=1e-12)


def test_buffer_point_and_polygon():
    circle = C.buffer_point(0.0, 0.0, 1.0, quadrant_segments=16)
    # inscribed 64-gon area = (k/2)·sin(2π/k) ≈ π·(1 − 1.6e-3)
    assert area(circle) == pytest.approx(np.pi, rel=5e-3)
    buf = C.buffer_polygon(SQ, 0.5, quadrant_segments=16)
    # area + perim*d + pi*d^2 for convex round-join buffer
    want = 4.0 + 8.0 * 0.5 + np.pi * 0.25
    assert area(buf) == pytest.approx(want, rel=1e-3)
    ero = C.buffer_polygon(SQ, -0.5)
    assert area(ero) == pytest.approx(1.0, abs=1e-9)
    gone = C.buffer_polygon(SQ, -1.5)
    assert len(gone) == 0


def test_distance():
    assert C.polygon_distance(SQ, SQ_SHIFT) == 0.0
    far = SQ + np.array([5.0, 0.0])
    assert C.polygon_distance(SQ, far) == pytest.approx(3.0, abs=1e-12)
    diag = SQ + 3.0
    assert C.polygon_distance(SQ, diag) == pytest.approx(np.sqrt(2.0), abs=1e-12)


# --- general (concave) clipping via ear-clipping decomposition ---


def test_triangulate_partitions_area():
    L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], dtype=float)
    tris = C.triangulate(L)
    assert sum(area(t) for t in tris) == pytest.approx(area(L), abs=1e-12)
    # triangles are disjoint (pairwise intersection area 0)
    for i in range(len(tris)):
        for j in range(i + 1, len(tris)):
            inter = C.clip_convex(tris[i], tris[j])
            assert len(inter) == 0 or area(inter) < 1e-12
    # star (concave at every other vertex)
    ang = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    rad = np.where(np.arange(10) % 2 == 0, 2.0, 0.7)
    star = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    tris2 = C.triangulate(star)
    assert sum(area(t) for t in tris2) == pytest.approx(area(star), rel=1e-9)


def test_general_clip_concave_clip_operand():
    """Concave CLIP operand (the former limitation)."""
    L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], dtype=float)
    # subject square overlapping the L's notch
    S = np.array([[0.5, 0.5], [2.5, 0.5], [2.5, 2.5], [0.5, 2.5]])
    inter = C.clip_general(S, L)
    ia = pieces_area(inter)
    # S ∩ L: bottom strip 2x0.5 + left strip 0.5x1.5 = 1.0 + 0.75
    assert ia == pytest.approx(1.75, abs=1e-9)
    da = pieces_area(C.difference_general(S, L))
    assert ia + da == pytest.approx(area(S), abs=1e-9)
    ua = pieces_area(C.union_general(S, L))
    assert ua == pytest.approx(area(S) + area(L) - ia, abs=1e-9)
    sa = pieces_area(C.sym_difference_general(S, L))
    assert sa == pytest.approx(area(S) + area(L) - 2 * ia, abs=1e-9)


def test_general_matches_convex_on_convex_inputs():
    got = pieces_area(C.clip_general(SQ, SQ_SHIFT))
    want = area(C.clip_convex(SQ, SQ_SHIFT))
    assert got == pytest.approx(want, abs=1e-12)
    assert C.is_convex(SQ)
    L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], dtype=float)
    assert not C.is_convex(L)


def test_buffer_styles_exact_areas():
    """apps/gdalalg_vector_buffer.cpp:32-56 style semantics on segment
    fixtures: flat/square/round caps, bevel/mitre/round joins, sides —
    all with closed-form expected areas."""
    import numpy as np

    from gdal_spark.geometry.clip import buffer_line, buffer_polygon_styled
    from gdal_spark.geometry.kernels import polygon_area

    def area(r):
        return abs(polygon_area([np.vstack([r, r[:1]])]))

    seg = np.array([[0.0, 0.0], [4.0, 0.0]])
    assert area(buffer_line(seg, 1.0, endcap="flat")) == 8.0
    assert area(buffer_line(seg, 1.0, endcap="square")) == 12.0
    k = 32  # 4 * quadrant_segments
    circ = 0.5 * k * np.sin(2 * np.pi / k)
    assert abs(area(buffer_line(seg, 1.0, endcap="round")) - (8 + circ)) < 1e-9
    assert area(buffer_line(seg, 1.0, side="left")) == 4.0
    assert area(buffer_line(seg, 1.0, side="right")) == 4.0

    L = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]])  # 90-degree turn
    assert area(buffer_line(L, 1.0, endcap="flat", join="bevel")) == 15.5
    assert area(buffer_line(L, 1.0, endcap="flat", join="mitre")) == 16.0
    q = 0.25 * circ
    got = area(buffer_line(L, 1.0, endcap="flat", join="round"))
    assert abs(got - (15.0 + q)) < 1e-9
    # mitre_limit: ratio at 90 deg is sqrt(2); limit below it → bevel
    assert area(
        buffer_line(L, 1.0, endcap="flat", join="mitre", mitre_limit=1.2)
    ) == 15.5

    sq = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    assert area(buffer_polygon_styled(sq, 1.0, join="mitre")) == 16.0
    assert area(buffer_polygon_styled(sq, 1.0, join="bevel")) == 14.0


def test_buffer_styled_udf_points(spark):
    """Point buffers per endcap: round→circle, square→square, flat→empty
    (GEOS semantics)."""
    from gdal_spark.functions import register_st_functions
    from gdal_spark.geometry import wkb as W
    import numpy as np

    register_st_functions(spark)
    pt = W.points_to_wkb(np.array([3.0]), np.array([4.0]))[0]
    df = spark.createDataFrame([(bytearray(pt),)], "g binary")
    df.createOrReplaceTempView("t")
    rows = spark.sql("""
        select st_area(st_buffer_style(g, 2.0, 'endcap=square')) as sq,
               st_area(st_buffer_style(g, 2.0, '')) as rnd,
               st_buffer_style(g, 2.0, 'endcap=flat') as flat
        from t
    """).collect()[0]
    assert rows.sq == 16.0
    k = 32
    assert abs(rows.rnd - 0.5 * k * 4 * np.sin(2 * np.pi / k)) < 1e-9
    assert rows.flat is None


def test_simplify_preserve_topology():
    """ogr_geometry.h SimplifyPreserveTopology: where plain DP yields a
    self-intersecting ring (shallow zigzag chord crossing a retained deep
    spike), the preserving variant re-adds vertices until simple; where
    DP is already valid the two agree."""
    import numpy as np

    from gdal_spark.geometry.clip import (
        _open_ring_simple,
        simplify_dp,
        simplify_preserve_topology,
    )

    ring = np.array([
        [0, 0], [2, 0.4], [4, -0.4], [6, 0.4], [8, 0],
        [8, 5], [4.4, 5], [4.2, -0.2], [4.0, 5], [0, 5],
    ], float)
    assert not _open_ring_simple(ring)
    dp = simplify_dp(ring, 0.5)
    dpo = dp[:-1] if np.array_equal(dp[0], dp[-1]) else dp
    assert _open_ring_simple(dpo)  # plain DP breaks topology here
    sp = simplify_preserve_topology(ring, 0.5)
    spo = sp[:-1] if np.array_equal(sp[0], sp[-1]) else sp
    assert not _open_ring_simple(spo)
    assert len(spo) < len(ring)  # still simplified
    # all output vertices are input vertices
    inset = {tuple(p) for p in ring}
    assert all(tuple(p) in inset for p in spo)

    # benign ring: identical to DP
    sq = np.array([[0, 0], [4, 0.1], [8, 0], [8, 8], [0, 8]], float)
    a = simplify_dp(sq, 0.5)
    b = simplify_preserve_topology(sq, 0.5)
    assert np.array_equal(a, b)
