"""Property-based tests (hypothesis) — randomized invariants for the
geometry kernels the whole engine leans on. The reference's test suite
is fixture-only (SURVEY §5 'randomized: none'); this goes beyond it."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.geometry import clip as C
from gdal_spark.geometry import wkb as W
from gdal_spark.geometry import wkt as T
from gdal_spark.geometry.kernels import points_in_rings, ring_area


def convex_polygon(draw, n_min=3, n_max=10):
    """Random convex polygon: sorted random angles + radii around a
    random center."""
    n = draw(st.integers(n_min, n_max))
    angles = sorted(
        draw(
            st.lists(
                st.floats(0, 2 * np.pi - 1e-6, allow_nan=False),
                min_size=n,
                max_size=n,
                unique=True,
            )
        )
    )
    r = draw(st.floats(0.5, 5.0))
    cx = draw(st.floats(-50, 50))
    cy = draw(st.floats(-50, 50))
    pts = np.array(
        [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in angles]
    )
    hull = C.convex_hull(pts)
    return hull if len(hull) >= 3 else None


poly_pair = st.builds(lambda: None)


@st.composite
def two_convex(draw):
    a = convex_polygon(draw)
    b = convex_polygon(draw)
    if a is None or b is None:
        return None
    return a, b


@given(two_convex())
@settings(max_examples=60, deadline=None)
def test_clip_area_invariants(pair):
    if pair is None:
        return
    a, b = pair
    area_a = abs(ring_area(a))
    inter = C.clip_convex(a, b)
    ia = abs(ring_area(inter)) if len(inter) >= 3 else 0.0
    da = sum(abs(ring_area(p)) for p in C.difference_convex(a, b))
    # partition: |A∩B| + |A−B| = |A|
    assert ia + da == (
        __import__("pytest").approx(area_a, rel=1e-7, abs=1e-9)
    )
    # intersection is bounded by both operands
    assert ia <= area_a + 1e-9
    assert ia <= abs(ring_area(b)) + 1e-9
    # union area identity
    ua = sum(abs(ring_area(p)) for p in C.union_convex(a, b))
    assert ua == __import__("pytest").approx(
        area_a + abs(ring_area(b)) - ia, rel=1e-7, abs=1e-9
    )


@given(two_convex())
@settings(max_examples=40, deadline=None)
def test_intersects_consistent_with_area(pair):
    if pair is None:
        return
    a, b = pair
    inter = C.clip_convex(a, b)
    ia = abs(ring_area(inter)) if len(inter) >= 3 else 0.0
    if ia > 1e-7:
        assert C.polygons_intersect(a, b)
    if not C.polygons_intersect(a, b):
        assert ia < 1e-6


@given(two_convex())
@settings(max_examples=40, deadline=None)
def test_pip_consistent_with_clip(pair):
    """Points inside A∩B are inside both A and B (sampled at the clip
    result's centroid)."""
    if pair is None:
        return
    a, b = pair
    inter = C.clip_convex(a, b)
    if len(inter) < 3 or abs(ring_area(inter)) < 1e-7:
        return
    cx = inter[:, 0].mean()
    cy = inter[:, 1].mean()  # centroid of convex region is interior
    assert points_in_rings([cx], [cy], [a])[0]
    assert points_in_rings([cx], [cy], [b])[0]


@given(
    st.lists(
        st.tuples(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(-1e6, 1e6, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_wkb_roundtrip_polygon(coords):
    ring = np.array(coords, dtype=np.float64)
    buf = W.polygon_to_wkb([ring])
    t, rings = W.parse_wkb(buf)
    assert t == W.POLYGON
    # closed on write (unless the input was already closed); points
    # bit-identical
    got = rings[0]
    if np.array_equal(ring[0], ring[-1]):
        assert np.array_equal(got, ring)
    else:
        assert np.array_equal(got[:-1], ring)
    assert np.array_equal(got[0], got[-1])


@given(
    st.floats(-180, 180, allow_nan=False),
    st.floats(-85, 85, allow_nan=False),
)
@settings(max_examples=80, deadline=None)
def test_wkt_point_roundtrip(x, y):
    wkt = T.wkb_to_wkt(W.points_to_wkb([x], [y])[0])
    back = W.parse_wkb(T.wkt_to_wkb(wkt))[1]
    assert back[0, 0] == x and back[0, 1] == y  # repr is shortest-roundtrip


@given(
    st.lists(
        st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
        min_size=3,
        max_size=30,
    )
)
@settings(max_examples=40, deadline=None)
def test_convex_hull_contains_all_points(pts):
    arr = np.array(pts, dtype=np.float64)
    h = C.convex_hull(arr)
    if len(h) < 3:
        return  # collinear degenerate input
    # every input point is inside or on the hull: no point strictly
    # outside any hull edge
    hull = C._ccw(h)
    n = len(hull)
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        d = b - a
        side = d[0] * (arr[:, 1] - a[1]) - d[1] * (arr[:, 0] - a[0])
        assert (side >= -1e-6 * max(1.0, np.abs(arr).max())).all()


# --- portable hash64 parity across engines ---


def test_hash64_spark_duckdb_parity(spark):
    """The portable md5-derived hash is bit-identical in Spark and
    DuckDB for arbitrary strings — the keystone of every oracle."""
    import duckdb

    from gdal_spark.portable import hash64

    samples = [
        "", "a", "hello world", "https://src7.example/123",
        "ünïcødé ☃", "x" * 500, "tab\tnewline\n", "0", "-1", " ",
    ] + [f"doc-{i}-{i*i}" for i in range(50)]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got_spark = {
        r.s: r.h
        for r in sdf.selectExpr("s", f"{hash64('s', 'spark')} as h").collect()
    }
    con = duckdb.connect()
    rel = con.execute(
        "select s, " + hash64("s", "duckdb") + " as h "
        "from (select unnest($1) as s)",
        [samples],
    ).fetchall()
    got_duck = {s: h for s, h in rel}
    assert got_spark == got_duck


# --- general clipping on randomized star (concave) polygons ---


@st.composite
def star_polygon(draw):
    n = draw(st.integers(5, 12))
    base = draw(st.floats(0.5, 3.0))
    cx = draw(st.floats(-20, 20))
    cy = draw(st.floats(-20, 20))
    radii = [draw(st.floats(0.3, 1.0)) * base + 0.1 for _ in range(n)]
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.column_stack(
        [cx + np.array(radii) * np.cos(ang), cy + np.array(radii) * np.sin(ang)]
    )
    return ring


@given(star_polygon(), star_polygon())
@settings(max_examples=40, deadline=None)
def test_general_clip_invariants_star(a, b):
    from gdal_spark.geometry.kernels import ring_area

    area_a = abs(ring_area(a))
    ia = sum(abs(ring_area(p)) for p in C.clip_general(a, b))
    da = sum(abs(ring_area(p)) for p in C.difference_general(a, b))
    ib = sum(abs(ring_area(p)) for p in C.clip_general(b, a))
    pytest = __import__("pytest")
    assert ia + da == pytest.approx(area_a, rel=1e-6, abs=1e-9)
    # symmetry: |A∩B| == |B∩A| regardless of decomposition
    assert ia == pytest.approx(ib, rel=1e-6, abs=1e-9)
    ua = sum(abs(ring_area(p)) for p in C.union_general(a, b))
    assert ua == pytest.approx(
        area_a + abs(ring_area(b)) - ia, rel=1e-6, abs=1e-9
    )


# --- hex cover margin proof (property form) ---


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-170.0, 160.0),   # bbox min lon
    st.floats(-75.0, 65.0),     # bbox min lat
    st.floats(0.01, 10.0),      # lon extent
    st.floats(0.01, 10.0),      # lat extent
    st.floats(0.0, 1.0),        # point position within bbox (u)
    st.floats(0.0, 1.0),        # point position within bbox (v)
    st.sampled_from([25000.0, 100000.0, 400000.0]),
)
def test_hex_cover_contains_any_bbox_point(
    lon0, lat0, dlon, dlat, u, v, size
):
    """The ±2 axial margin provably covers: for ANY bbox and ANY point
    inside it, the point's cube-rounded hex cell is in the bbox's
    cover rows (the correctness precondition of hex_pip_join — a miss
    here would be a wrong join row, not just a slow one)."""
    import math

    import numpy as np

    from gdal_spark.operators.spatial_join import polygon_hex_cover

    poly = {
        "polygon_id": 1,
        "bbox": (lon0, lat0, lon0 + dlon, lat0 + dlat),
        "rings": [],
    }
    cover = {t[:2] for t in polygon_hex_cover([poly], size)}
    lon = lon0 + u * dlon
    lat = lat0 + v * dlat
    shift = 20037508.342789244
    mx = lon * shift / 180.0
    my = (
        np.log(np.tan((90.0 + lat) * np.pi / 360.0))
        / (np.pi / 180.0) * shift / 180.0
    )
    s3 = math.sqrt(3.0) / 3.0
    qf = (s3 * mx - my / 3.0) / size
    rf = (2.0 * my / 3.0) / size
    sf = -qf - rf
    rq, rr, rs = round(qf), round(rf), round(sf)
    dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
    if dq > ds and dq > dr:
        rq = -rs - rr
    elif not (ds > dr):
        rr = -rq - rs
    assert (int(rq), int(rr)) in cover
