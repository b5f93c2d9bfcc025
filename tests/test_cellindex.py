"""Cell-index goldens: tile math pinned to GDAL's GlobalMercator
(gdal2tiles.py:315-505), S2 invariants, Hilbert locality."""

import numpy as np

from gdal_spark.cellindex import (
    hilbert_code,
    lonlat_to_tile,
    quadkey,
    parent_tile,
    lonlat_to_cell,
    cell_parent,
    cell_level,
    cell_to_lonlat,
)
from gdal_spark.cellindex.s2 import cell_range
from gdal_spark.cellindex.tile import tile_bounds_3857, lonlat_to_meters


def test_tile_goldens():
    # NYC at z12: x=1205 y=1540 (standard slippy-map values)
    tx, ty = lonlat_to_tile(np.array([-74.0060]), np.array([40.7128]), 12)
    assert (tx[0], ty[0]) == (1205, 1540)
    # Sydney z10 (lon>0, lat<0 quadrant)
    tx, ty = lonlat_to_tile(np.array([151.2093]), np.array([-33.8688]), 10)
    assert (tx[0], ty[0]) == (942, 614)
    # z0 is always (0,0)
    tx, ty = lonlat_to_tile(np.array([123.0]), np.array([-45.0]), 0)
    assert (tx[0], ty[0]) == (0, 0)


def test_mercator_roundtrip_constants():
    mx, my = lonlat_to_meters(np.array([180.0]), np.array([0.0]))
    assert abs(mx[0] - 20037508.342789244) < 1e-6
    assert abs(my[0]) < 1e-6


def test_tile_bounds_contain_point():
    lon, lat = np.array([2.3522]), np.array([48.8566])
    tx, ty = lonlat_to_tile(lon, lat, 11)
    minx, miny, maxx, maxy = tile_bounds_3857(tx, ty, 11)
    mx, my = lonlat_to_meters(lon, lat)
    assert minx[0] <= mx[0] <= maxx[0]
    assert miny[0] <= my[0] <= maxy[0]


def test_quadkey_parent_prefix():
    tx, ty = np.array([1205]), np.array([1540])
    k12 = quadkey(tx, ty, 12)
    px, py = parent_tile(tx, ty)
    k11 = quadkey(px, py, 11)
    # parent quadkey is the child's with the last bit-pair dropped
    assert k12[0] >> 2 == k11[0]


def test_s2_roundtrip_and_hierarchy():
    rng = np.random.default_rng(42)
    lons = rng.uniform(-179.9, 179.9, 500)
    lats = rng.uniform(-84.9, 84.9, 500)
    for lev in (4, 9, 13, 30):
        c = lonlat_to_cell(lons, lats, lev)
        assert np.all(cell_level(c) == lev)
        clon, clat = cell_to_lonlat(c)
        assert np.array_equal(lonlat_to_cell(clon, clat, lev), c)
    c30 = lonlat_to_cell(lons, lats, 30)
    c9 = lonlat_to_cell(lons, lats, 9)
    assert np.array_equal(cell_parent(c30, 9), c9)
    lo, hi = cell_range(c9)
    u30 = c30.astype(np.uint64)
    assert np.all((u30 >= lo.astype(np.uint64)) & (u30 <= hi.astype(np.uint64)))


def test_s2_locality():
    # two points 10 m apart share the level-12 cell almost always;
    # use a known in-cell pair
    a = lonlat_to_cell(np.array([-74.0, -74.00005]), np.array([40.7, 40.70005]), 10)
    assert a[0] == a[1]


def test_hilbert_locality_beats_row_major():
    # hilbert: consecutive codes are spatially adjacent
    n = 32
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    x = (gx.ravel() + 0.5) / n
    y = (gy.ravel() + 0.5) / n
    h = hilbert_code(x, y, 0, 0, 1, 1, order=5)
    assert len(np.unique(h)) == n * n
    order = np.argsort(h)
    dx = np.abs(np.diff(x[order])) + np.abs(np.diff(y[order]))
    assert np.max(dx) <= 1.0 / n + 1e-9  # every hilbert step is one cell


def test_tms_from_json_both_versions():
    """OGC TMS JSON parsing (gcore/tilematrixset.cpp:256-470): a TMS 2.0
    WebMercatorQuad definition reproduces the built-in matrices; TMS 1.0
    field names also parse; invalid series rejected."""
    import pytest

    from gdal_spark.cellindex import tms

    web = tms.get("WebMercatorQuad")
    m0, m1 = web.matrix(0), web.matrix(1)
    v2 = {
        "id": "MyWebMerc",
        "crs": {"uri": "http://www.opengis.net/def/crs/EPSG/0/3857"},
        "boundingBox": {
            "lowerCorner": [-20037508.342789244, -20037508.342789244],
            "upperCorner": [20037508.342789244, 20037508.342789244],
        },
        "tileMatrices": [
            {
                "id": "0",
                "scaleDenominator": m0.scale_denominator,
                "pointOfOrigin": [m0.top_left_x, m0.top_left_y],
                "tileWidth": 256, "tileHeight": 256,
                "matrixWidth": 1, "matrixHeight": 1,
            },
            {
                "id": "1",
                "scaleDenominator": m1.scale_denominator,
                "pointOfOrigin": [m1.top_left_x, m1.top_left_y],
                "tileWidth": 256, "tileHeight": 256,
                "matrixWidth": 2, "matrixHeight": 2,
            },
        ],
    }
    t = tms.from_json(v2)
    assert t.identifier == "MyWebMerc"
    assert t.crs.endswith("EPSG/0/3857")
    for z in (0, 1):
        assert t.matrix(z).res_x == pytest.approx(web.matrix(z).res_x, rel=1e-15)
        assert t.matrix(z).matrix_width == web.matrix(z).matrix_width
    # same tile assignment as the built-in
    import numpy as np
    tx, ty = t.matrix(1).tile_for(np.array([1e7]), np.array([-1e7]))
    wx, wy = web.matrix(1).tile_for(np.array([1e7]), np.array([-1e7]))
    assert (tx[0], ty[0]) == (wx[0], wy[0]) == (1, 1)

    v1 = {
        "type": "TileMatrixSetType",
        "identifier": "Legacy",
        "tileMatrix": [
            {
                "identifier": "0",
                "scaleDenominator": 1000.0,
                "topLeftCorner": [0.0, 100.0],
                "tileWidth": 512, "tileHeight": 512,
                "matrixWidth": 3, "matrixHeight": 2,
            }
        ],
    }
    t1 = tms.from_json(v1)
    assert t1.matrix(0).tile_width == 512
    assert t1.matrix(0).res_x == pytest.approx(0.28, rel=1e-15)
    # non-decreasing scale denominators rejected
    bad = dict(v2)
    bad["tileMatrices"] = [v2["tileMatrices"][1], v2["tileMatrices"][0]]
    with pytest.raises(ValueError):
        tms.from_json(bad)


def test_hex_cells_match_independent_numpy(spark):
    """portable.hex_cells_sql vs an independent numpy cube-round hex
    binning over the geocoded pages — same cells, bit-for-bit."""
    import numpy as np

    from gdal_spark import portable, tables

    tables.register_views(spark, "/root/testdata/sf0.001")
    rows = spark.sql(
        "with g as ({g}) select url, lat, lon from g".format(
            g=portable.geo_pages_cte("spark")
        )
    ).collect()
    got = {
        r["url"]: (r["hex_q"], r["hex_r"])
        for r in spark.sql(
            "with g as ({g}), h as ({h}) select url, hex_q, hex_r from h"
            .format(
                g=portable.geo_pages_cte("spark"),
                h=portable.hex_cells_sql(
                    "select url, lang, lat, lon from g", 100000.0
                ),
            )
        ).collect()
    }
    size = 100000.0
    shift = 20037508.342789244
    for r in rows:
        mx = r["lon"] * shift / 180.0
        my = (
            np.log(np.tan((90.0 + r["lat"]) * np.pi / 360.0))
            / (np.pi / 180.0)
            * shift
            / 180.0
        )
        qf = (np.sqrt(3.0) / 3.0 * mx - my / 3.0) / size
        rf = (2.0 * my / 3.0) / size
        sf = -qf - rf
        # ties-away round (numpy rounds half-to-even -> emulate)
        rnd = lambda v: float(np.floor(v + 0.5)) if v >= 0 else float(
            np.ceil(v - 0.5)
        )
        rq, rr, rs = rnd(qf), rnd(rf), rnd(sf)
        dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
        if dq > ds and dq > dr:
            rq = -rs - rr
        elif not (ds > dr):
            rr = -rq - rs
        assert got[r["url"]] == (int(rq), int(rr)), r["url"]


def test_hex_cells_axial_adjacency(spark):
    """Points a hair apart land in the same cell; points a full cell
    apart land in different cells (sanity of the size parameter)."""
    from gdal_spark import portable

    df = spark.createDataFrame(
        [
            ("a", "en", 10.0, 20.0),
            ("b", "en", 10.001, 20.001),
            ("c", "en", 12.0, 22.0),
        ],
        "url string, lang string, lat double, lon double",
    )
    df.createOrReplaceTempView("_hexpts")
    out = {
        r["url"]: (r["hex_q"], r["hex_r"])
        for r in spark.sql(
            "select url, hex_q, hex_r from ({})".format(
                portable.hex_cells_sql("select * from _hexpts", 100000.0)
            )
        ).collect()
    }
    assert out["a"] == out["b"]
    assert out["a"] != out["c"]


def test_tms_to_json_roundtrip():
    """exportToTMSJsonV1 parity (gcore/tilematrixset.cpp:611-656):
    to_json -> from_json preserves scale denominators exactly and tile
    assignment bit-for-bit (resolution re-derives from the scale
    denominator, so compare behavior, not float identity)."""
    import json

    import numpy as np

    from gdal_spark.cellindex import tms

    web = tms.get("WebMercatorQuad")
    rt = tms.from_json(json.dumps(tms.to_json(web)))
    assert rt.identifier == "WebMercatorQuad"
    assert rt.max_zoom == web.max_zoom
    xs = np.linspace(-2.003e7, 2.003e7, 101)
    ys = np.linspace(-2.003e7, 2.003e7, 101)
    for z in (0, 3, 11):
        a, b = web.matrix(z), rt.matrix(z)
        assert b.scale_denominator == a.scale_denominator
        assert abs(b.res_x - a.res_x) <= 1e-13 * a.res_x
        assert (
            np.array(a.tile_for(xs, ys)) == np.array(b.tile_for(xs, ys))
        ).all()
    geo = tms.get("geodetic")
    rg = tms.from_json(
        tms.to_json(geo), meters_per_unit=tms.HALF_CIRCUMFERENCE / 180.0
    )
    for z in (0, 6):
        assert (
            rg.matrix(z).scale_denominator == geo.matrix(z).scale_denominator
        )
        assert abs(rg.matrix(z).res_x - geo.matrix(z).res_x) <= 1e-13


def test_geohash_published_vectors():
    """Pin the numpy kernel to the PUBLISHED standard, independent of
    our SQL: the two canonical examples every geohash implementation
    ships (geohash.org / Wikipedia)."""
    from gdal_spark.cellindex import geohash

    assert list(
        geohash.encode(np.array([10.40744]), np.array([57.64911]), 11)
    ) == ["u4pruydqqvj"]
    assert list(
        geohash.encode(np.array([-5.6]), np.array([42.6]), 5)
    ) == ["ezs42"]
    # decode inverts encode: bbox contains the point, prefix nests
    lo_x, lo_y, hi_x, hi_y = geohash.decode_bbox("ezs42")
    assert lo_x <= -5.6 < hi_x and lo_y <= 42.6 < hi_y
    plo_x, plo_y, phi_x, phi_y = geohash.decode_bbox("ezs4")
    assert plo_x <= lo_x and phi_x >= hi_x and plo_y <= lo_y and phi_y >= hi_y


def test_geohash_sql_matches_numpy(spark):
    """The portable SQL twin produces the numpy kernel's strings on a
    lat/lon grid covering all four quadrants + cell-edge values."""
    from gdal_spark.cellindex import geohash
    from gdal_spark.queries.spatial import _geohash_sql

    lons = np.array([-179.9, -45.0, -5.6, 0.0, 10.40744, 90.0, 179.9])
    lats = np.array([-89.9, -42.6, 42.6, 0.0, 57.64911, 45.0, 89.9])
    pts = [(float(lo), float(la)) for lo in lons for la in lats]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = [
        r.gh
        for r in df.selectExpr(
            "lon", "lat", f"{_geohash_sql('spark', 'lon', 'lat', 7)} as gh"
        )
        .orderBy("lon", "lat")
        .collect()
    ]
    want = list(
        geohash.encode(
            np.array([p[0] for p in sorted(pts)]),
            np.array([p[1] for p in sorted(pts)]),
            7,
        )
    )
    assert got == want


def test_geohash_neighbors_published_adjacency():
    """The 8 neighbors of 'ezs42' per the published tables; bbox
    adjacency (shared edges/corners) holds; pole cells drop the
    out-of-range directions; antimeridian cells wrap longitude."""
    from gdal_spark.cellindex import geohash

    assert set(geohash.neighbors("ezs42")) == {
        "ezs48", "ezs49", "ezs43", "ezs41", "ezs40",
        "ezefp", "ezefr", "ezefx",
    }
    # every neighbor's bbox touches the cell's bbox
    lo_x, lo_y, hi_x, hi_y = geohash.decode_bbox("ezs42")
    for n in geohash.neighbors("ezs42"):
        a, b, c, d = geohash.decode_bbox(n)
        assert a <= hi_x + 1e-9 and c >= lo_x - 1e-9
        assert b <= hi_y + 1e-9 and d >= lo_y - 1e-9
    # north-pole cell: no northern neighbors
    top = geohash.encode(
        __import__("numpy").array([0.0]),
        __import__("numpy").array([89.9]), 1,
    )[0]
    assert len(geohash.neighbors(str(top))) == 5
    # antimeridian cell wraps west
    west = geohash.neighbors(
        str(geohash.encode(__import__("numpy").array([-179.9]),
                           __import__("numpy").array([0.1]), 3)[0])
    )
    assert any(
        geohash.decode_bbox(n)[0] >= 170.0 for n in west
    )
