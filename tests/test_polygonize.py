"""Polygonize / connected-components / sieve tests on planted patterns."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.raster import model
from gdal_spark.raster.polygonize import (
    _label_block,
    connected_components,
    polygonize,
    sieve,
)


def _blocks_from_array(spark, arr, block=8):
    h, w = arr.shape
    rows = []
    nb = (w + block - 1) // block
    for by in range((h + block - 1) // block):
        for bx in range(nb):
            x0, y0 = bx * block, by * block
            sub = arr[y0 : y0 + block, x0 : x0 + block]
            rows.append(
                ("ccl", 1, bx, by, x0, y0, sub.shape[1], sub.shape[0],
                 "float64", 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub.astype(np.float64)).tobytes()))
            )
    return spark.createDataFrame(rows, model.BLOCK_SCHEMA)


def test_label_block_simple():
    a = np.array(
        [[1, 1, 2], [1, 2, 2], [3, 3, 2]], dtype=np.float64
    )
    lab = _label_block(a, 0, 0, 3)
    # region of value 1: pixels (0,0),(0,1),(1,0) → min index 0
    assert lab[0, 0] == lab[0, 1] == lab[1, 0] == 0
    # value-2 region: (0,2),(1,1),(1,2),(2,2) connected → min index 2
    assert lab[0, 2] == lab[1, 1] == lab[1, 2] == lab[2, 2] == 2
    assert lab[2, 0] == lab[2, 1] == 6
    # diagonal does NOT connect (4-connectivity)
    b = np.array([[1, 0], [0, 1]], dtype=np.float64)
    lb = _label_block(b, 0, 0, 2)
    assert lb[0, 0] != lb[1, 1]


def test_polygonize_regions_cross_block(spark):
    # 16x16, two-block-spanning shapes: a 16-wide stripe of 5s at rows
    # 3..4, background 0, a 3x3 square of 7s inside one block
    arr = np.zeros((16, 16))
    arr[3:5, :] = 5.0          # crosses the vertical seam at x=8
    arr[10:13, 2:5] = 7.0
    df = _blocks_from_array(spark, arr, block=8)
    regions = polygonize(df, width_full=16).collect()
    by_val = {}
    for r in regions:
        by_val.setdefault(r.value, []).append(r)
    assert len(by_val[5.0]) == 1           # stripe merged across seam
    s = by_val[5.0][0]
    assert s.n_pixels == 32
    assert (s.minx, s.miny, s.maxx, s.maxy) == (0, 3, 15, 4)
    assert len(by_val[7.0]) == 1
    assert by_val[7.0][0].n_pixels == 9
    # background splits: above stripe (rows 0-2) and below (rows 5+, with
    # the square punched out) — still 4-connected around the square → 2
    assert len(by_val[0.0]) == 2
    total = sum(r.n_pixels for r in regions)
    assert total == 256


def test_connected_components_chain(spark):
    # chain 1-2-3-4-5 and isolated pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "la long, lb long"
    )
    m = {r.label: r.root for r in connected_components(edges).collect()}
    assert m[1] == m[2] == m[3] == m[4] == m[5] == 1
    assert m[10] == m[11] == 10


def test_sieve_flags_small_regions(spark):
    arr = np.zeros((16, 16))
    arr[0, 0] = 9.0            # 1-px speck
    arr[5:9, 5:9] = 4.0        # 16-px square
    df = _blocks_from_array(spark, arr, block=8)
    out = {(r.value, r.n_pixels): r.keep for r in sieve(df, 16, threshold=2).collect()}
    assert out[(9.0, 1)] is False          # speck flagged
    assert out[(4.0, 16)] is True
    assert out[(0.0, 256 - 17)] is True


# --- contour ---


def test_contour_segments_on_plane(spark):
    from gdal_spark.raster.contour import contour_segments

    blocks = model.synth_blocks(spark, model.plane_spec())
    segs = contour_segments(blocks, levels=[60.0], width=60, height=60).collect()
    assert len(segs) > 10
    for s in segs:
        # plane value(x, y) = 3x + 4y: every interpolated endpoint lies
        # exactly on the level line
        assert 3.0 * s.x1 + 4.0 * s.y1 == pytest.approx(60.0, abs=1e-9)
        assert 3.0 * s.x2 + 4.0 * s.y2 == pytest.approx(60.0, abs=1e-9)
    # segments cover the whole crossing span of the line within the grid
    xs = [s.x1 for s in segs] + [s.x2 for s in segs]
    assert min(xs) == pytest.approx(0.0, abs=1.0)
    assert max(xs) == pytest.approx(20.0, abs=1.0)  # x=20 at y=0


def test_contour_multiple_levels(spark):
    from gdal_spark.raster.contour import contour_segments

    blocks = model.synth_blocks(spark, model.plane_spec())
    segs = contour_segments(
        blocks, levels=[30.0, 120.0], width=60, height=60
    ).collect()
    lv = {s.level for s in segs}
    assert lv == {30.0, 120.0}


# --- ring tracing (region mask → WKB polygon with holes) ---


def test_trace_region_rings_shapes():
    from gdal_spark.geometry.kernels import polygon_area, ring_area
    from gdal_spark.geometry.wkb import parse_wkb
    from gdal_spark.raster.polygonize import region_wkb, trace_region_rings

    # rectangle
    m = np.zeros((8, 8), dtype=bool)
    m[2:5, 2:6] = True
    rings = trace_region_rings(m)
    assert len(rings) == 1
    assert abs(ring_area(rings[0])) == m.sum()
    # donut: exterior + one hole, net area exact
    d = np.zeros((10, 10), dtype=bool)
    d[1:8, 1:8] = True
    d[3:5, 3:6] = False
    t, payload = parse_wkb(region_wkb(d))
    assert len(payload) == 2
    assert polygon_area(payload) == d.sum()
    # concave L traces a single simple ring
    L = np.zeros((6, 6), dtype=bool)
    L[0:5, 0:2] = True
    L[3:5, 0:5] = True
    rings = trace_region_rings(L)
    assert len(rings) == 1
    assert abs(ring_area(rings[0])) == L.sum()


def test_polygonize_wkb_matches_region_table(spark):
    from gdal_spark.geometry.kernels import polygon_area
    from gdal_spark.geometry.wkb import parse_wkb
    from gdal_spark.raster.polygonize import polygonize_wkb

    blocks = _blocks_from_array(spark, model.plateau_values(0, 0, 48, 48), block=32)
    wkb_rows = {r[0]: r for r in polygonize_wkb(blocks, 48, 48).collect()}
    table_rows = {
        r.region_id: r for r in polygonize(blocks, width_full=48).collect()
    }
    assert set(wkb_rows) == set(table_rows)
    for rid, (_, val, n, wkb) in wkb_rows.items():
        assert table_rows[rid].n_pixels == n
        assert table_rows[rid].value == val
        _, payload = parse_wkb(wkb)
        assert polygon_area(payload) == n  # traced area == pixel count


def test_footprint_with_nodata_hole(spark):
    """apps/gdal_footprint_lib.cpp analog: a nodata island inside the
    data mask becomes an interior ring; traced area == data pixel
    count."""
    import numpy as np

    from gdal_spark.geometry.kernels import polygon_area
    from gdal_spark.geometry.wkb import parse_wkb
    from gdal_spark.raster.polygonize import footprint

    a = np.full((48, 48), 5.0)
    a[10:20, 12:22] = 0.0  # nodata island
    a[:, 40:] = 0.0  # nodata margin strip
    blocks = _blocks_from_array(spark, a, block=32)
    rows = footprint(blocks, width=48, height=48, nodata=0.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_pixels == int((a != 0).sum())
    t, payload = parse_wkb(bytes(r.wkb))
    assert len(payload) == 2  # exterior + hole
    assert polygon_area(payload) == r.n_pixels


def test_contour_polylines_stitch(spark):
    """Segment merger (alg/contour.cpp:332): the plane's level-60
    contour stitches into ONE polyline from (20,0) to (0,15), length 25
    (3-4-5 line); closed loops detected on a bump fixture."""
    from gdal_spark.raster.contour import contour_polylines, contour_segments

    blocks = model.synth_blocks(spark, model.plane_spec())
    segs = contour_segments(blocks, levels=[60.0], width=60, height=60)
    lines = contour_polylines(segs).collect()
    assert len(lines) == 1
    ln = lines[0]
    assert ln.closed is False
    assert abs(ln.length - 25.0) < 1e-6
    # bump: closed contour around a peak
    a = np.zeros((20, 20))
    a[8:12, 8:12] = 10.0
    blocks2 = _blocks_from_array(spark, a, block=8)
    segs2 = contour_segments(blocks2, levels=[5.0], width=20, height=20)
    loops = contour_polylines(segs2).collect()
    assert len(loops) == 1
    assert loops[0].closed is True


def test_contour_polygons_bands_on_plane(spark):
    """contour --polygonize (apps/gdalalg_raster_contour.cpp:75):
    level bands of the analytic plane -> one connected region per
    band, amin/amax = band bounds (NULL open ends), traced polygon
    area == pixel count."""
    from gdal_spark.geometry.kernels import polygon_area
    from gdal_spark.geometry.wkb import parse_wkb
    from gdal_spark.raster.contour import contour_polygons

    g = model.synth_blocks(spark, model.plane_spec())
    rows = contour_polygons(g, [50.0, 100.0, 200.0, 300.0], 60, 60).collect()
    by_code = {}
    for r in rows:
        by_code.setdefault(r.band_code, []).append(r)
    assert set(by_code) == {0, 1, 2, 3, 4}
    assert all(len(v) == 1 for v in by_code.values())
    assert sum(r.n_pixels for r in rows) == 3600
    bounds = {0: (None, 50.0), 1: (50.0, 100.0), 2: (100.0, 200.0),
              3: (200.0, 300.0), 4: (300.0, None)}
    for code, (lo, hi) in bounds.items():
        r = by_code[code][0]
        assert r.amin == lo and r.amax == hi
        _, payload = parse_wkb(bytes(r.wkb))
        assert polygon_area(payload) == r.n_pixels
    # pixel-level truth: z = 3x + 4y, band = #levels <= z
    import numpy as np

    z = model.plane_values(0, 0, 60, 60).astype(np.float64)
    for code in bounds:
        want = int(
            (np.searchsorted([50.0, 100.0, 200.0, 300.0], z.ravel(),
                             side="right") == code).sum()
        )
        assert by_code[code][0].n_pixels == want
