

def test_nodata_to_alpha_band(spark):
    """nodata-to-alpha appends band 4; alpha 0 exactly where every band
    sits at its per-band nodata (apps/gdalalg_raster_nodata_to_alpha.cpp)."""
    import numpy as np

    from gdal_spark.raster import model, ops

    blocks = model.synth_blocks(spark, model.grad100_spec())
    out = ops.nodata_to_alpha(blocks, {1: 7.0, 2: 24.0, 3: 41.0})
    assert out.where("band = 4").count() == out.where("band = 1").count()
    rows = out.where("band = 4").collect()
    alpha = np.zeros((100, 100), np.uint8)
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        alpha[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    v1 = model.value_grid(0, 0, 100, 100, 1)
    exp = np.where(v1 == 7, 0, 255)  # bands differ by 17 -> one test
    assert np.array_equal(alpha, exp)
    assert (alpha == 0).sum() > 0  # the nodata set is non-trivial


def test_raster_index_footprints(spark):
    """gdaltindex: one envelope row per dataset, wkt ring closed,
    pixel sizes positive (apps/gdaltindex_lib.cpp)."""
    from gdal_spark.raster import model, ops

    blocks = model.synth_blocks(spark, model.plateau_spec()).unionByName(
        model.synth_blocks(spark, model.plane_spec())
    )
    rows = {r.location: r for r in ops.raster_index(blocks).collect()}
    assert set(rows) == {"plateau48", "plane60"}
    r = rows["plateau48"]
    assert (r.minlon, r.maxlon, r.minlat, r.maxlat) == (0.0, 48.0, -48.0, 0.0)
    assert r.pixel_sx == 1.0 and r.pixel_sy == 1.0
    assert r.wkt.startswith("POLYGON ((") and r.wkt.endswith("))")
    first = r.wkt[len("POLYGON (("):-2].split(", ")[0]
    last = r.wkt[len("POLYGON (("):-2].split(", ")[-1]
    assert first == last  # closed ring


def test_grid_linear_plane_and_fallbacks(spark):
    """GDALGridLinear (alg/gdalgrid.cpp:2458): planar input reproduced
    exactly inside the hull; outside-hull cells fall back to nearest
    neighbor (radius=inf) or nodata (radius=0)."""
    import numpy as np

    from gdal_spark.raster.grid import CellGrid, grid_linear

    pts_xy = [(1.0, 1.0), (9.0, 1.2), (8.8, 9.0), (1.2, 8.8), (5.0, 5.1)]
    xyz = [(x, y, 3.0 * x + 2.0 * y - 5.0) for x, y in pts_xy]
    pts = spark.createDataFrame(xyz, "lon double, lat double, value double")
    g = CellGrid(0.0, 0.0, 10.0, 10.0, 10, 10)
    rows = {(r.col, r.row): r.value for r in grid_linear(pts, g).collect()}
    assert len(rows) == 100
    # interior cell (center 4.5, 5.5) is inside the hull: exact plane
    assert abs(rows[(4, 5)] - (3.0 * 4.5 + 2.0 * 5.5 - 5.0)) < 1e-9
    # corner cell (center 0.5, 0.5) is outside: nearest is (1,1)
    assert abs(rows[(0, 0)] - (3.0 + 2.0 - 5.0)) < 1e-12
    # radius=0: outside-hull cells get nodata
    rows0 = {
        (r.col, r.row): r.value
        for r in grid_linear(pts, g, radius=0.0, nodata=-99.0).collect()
    }
    assert rows0[(0, 0)] == -99.0
    assert abs(rows0[(4, 5)] - rows[(4, 5)]) < 1e-12
    # non-planar sanity: values stay within the vertex z-range
    xyz2 = [(x, y, float((i * 37) % 11)) for i, (x, y) in enumerate(pts_xy)]
    pts2 = spark.createDataFrame(xyz2, "lon double, lat double, value double")
    vals = np.array([r.value for r in grid_linear(pts2, g).collect()])
    zs = [z for _, _, z in xyz2]
    assert vals.min() >= min(zs) - 1e-9 and vals.max() <= max(zs) + 1e-9


def test_raster_compare_diff_report(spark):
    """`gdal raster compare` (apps/gdalalg_raster_compare.cpp:860-890):
    per-band differing-pixel count and max abs value difference between
    two datasets zipped on block keys; identical inputs report zero."""
    import numpy as np

    from gdal_spark.raster import model, ops

    from pyspark.sql import functions as F

    blocks = model.synth_blocks(spark, model.grad100_spec())
    same = {
        r.band: r
        for r in ops.compare(
            blocks, blocks.withColumn("dataset", F.lit("copy"))
        ).collect()
    }
    assert set(same) == {1, 2, 3}
    assert all(r.pixels_differing == 0 for r in same.values())
    assert all(r.max_value_difference == 0.0 for r in same.values())

    # bump band 2 by +5 inside a 3x4 window, clipped at 255
    def bump(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                d = dict(r)
                if int(r["band"]) == 2:
                    a = model.decode(
                        (r["buf"], r["height"], r["width"], r["dtype"])
                    ).astype(np.int64)
                    ys, xs = np.mgrid[: int(r["height"]), : int(r["width"])]
                    gx, gy = xs + int(r["x0"]), ys + int(r["y0"])
                    win = (gx >= 10) & (gx < 14) & (gy >= 20) & (gy < 23)
                    a = np.where(win, np.minimum(a + 5, 255), a)
                    d["buf"] = np.ascontiguousarray(
                        a.astype(np.uint8)
                    ).tobytes()
                d["dataset"] = "edited"
                rows.append(d)
            yield pd.DataFrame(rows, columns=list(pdf.columns))

    edited = blocks.mapInPandas(bump, model.BLOCK_SCHEMA)
    diff = {r.band: r for r in ops.compare(blocks, edited).collect()}
    assert diff[1].pixels_differing == 0 and diff[3].pixels_differing == 0
    # band 2 window: 12 pixels; +5 clips at 255 for fixture values >= 251
    v = model.value_grid(10, 20, 4, 3, 2).astype(np.int64)
    exp_diff = int((np.minimum(v + 5, 255) != v).sum())
    assert diff[2].pixels_differing == exp_diff
    assert diff[2].max_value_difference == float(
        np.abs(np.minimum(v + 5, 255) - v).max()
    )
    assert diff[2].dataset_a == "grad100" and diff[2].dataset_b == "edited"


def test_pixel_info_positions(spark):
    """gdal raster pixel-info (gdallocationinfo): georeferenced
    positions at pixel centers resolve to the right pixel and value;
    positions outside the raster emit no rows."""
    import numpy as np

    from gdal_spark.raster import model, ops

    g = model.grad100_spec().gt
    pix = [(0, 0), (41, 87), (99, 99)]
    pts = spark.createDataFrame(
        [
            (i, g[0] + (px + 0.5) * g[1], g[3] + (py + 0.5) * g[5])
            for i, (px, py) in enumerate(pix)
        ]
        + [(9, g[0] - 1.0, g[3] + 1.0)],  # off-raster
        "point_id long, x double, y double",
    )
    blocks = model.synth_blocks(spark, model.grad100_spec())
    rows = ops.pixel_info(blocks, pts).collect()
    assert len(rows) == 9  # 3 in-raster points x 3 bands, none for id 9
    got = {(r.point_id, r.band): (r.px, r.py, r.value) for r in rows}
    for i, (px, py) in enumerate(pix):
        for b in (1, 2, 3):
            v = float(model.value_grid(px, py, 1, 1, b)[0, 0])
            assert got[(i, b)] == (px, py, v)


def test_raster_update_window(spark):
    """gdal raster update: src blocks overwrite the matching dst
    blocks, src_nodata pixels keep the dst value, non-overlapping
    blocks pass through byte-identical."""
    import numpy as np

    from pyspark.sql import functions as F

    from gdal_spark.raster import model, ops

    blocks = model.synth_blocks(spark, model.grad100_spec())

    def complement(it):
        import pandas as pd

        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                a = model.decode(
                    (r["buf"], r["height"], r["width"], r["dtype"])
                )
                d = dict(r)
                d["buf"] = np.ascontiguousarray(
                    (255 - a).astype(np.uint8)
                ).tobytes()
                out.append(d)
            yield pd.DataFrame(out, columns=list(pdf.columns))

    src = blocks.where(
        (F.col("bx") == 1) & (F.col("by") == 1) & (F.col("band") == 2)
    ).mapInPandas(complement, model.BLOCK_SCHEMA)
    upd = ops.update(blocks, src, src_nodata=0.0)
    full = np.zeros((3, 100, 100), np.int64)
    for r in upd.collect():
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.band - 1, r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    for b in (1, 2, 3):
        v = model.value_grid(0, 0, 100, 100, b).astype(np.int64)
        exp = v.copy()
        if b == 2:
            win = np.zeros_like(v, bool)
            win[32:64, 32:64] = True
            c = 255 - v
            exp = np.where(win & (c != 0), c, v)
        assert np.array_equal(full[b - 1], exp), f"band {b}"


def test_raster_create_distributed(spark):
    """gdal raster create: the block grid comes from spark.range (a
    distributed Range scan, never a driver-built row list), partial
    blocks are clipped at the raster edge, and buffers carry the burn
    value."""
    import numpy as np

    from gdal_spark.raster import model, ops

    spec = model.GridSpec(
        "b50", 50, 40, (0.0, 0.25, 0.0, 10.0, 0.0, -0.25),
        block=32, bands=1,
    )
    df = ops.create(spark, spec, burn=3.0)
    assert "Range" in df._jdf.queryExecution().executedPlan().toString()
    rows = df.collect()
    assert len(rows) == 4  # 2x2 block grid
    dims = {(r.bx, r.by): (r.width, r.height) for r in rows}
    assert dims == {(0, 0): (32, 32), (1, 0): (18, 32),
                    (0, 1): (32, 8), (1, 1): (18, 8)}
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        assert a.shape == (r.height, r.width) and (a == 3).all()
        assert (r.gt0, r.gt1, r.gt5) == (0.0, 0.25, -0.25)


def test_vector_tile_index(spark):
    """gdal vector index (ogrtindex): one row per layer with feature
    count and the aggregated extent; bounds match the numpy rings."""
    import numpy as np

    from gdal_spark import tables
    from gdal_spark.functions import register_st_functions
    from gdal_spark.operators.layer_algebra import vector_tile_index

    register_st_functions(spark)
    sf = "/root/testdata/sf0.001"
    a = tables.polygons_a_df(spark, sf)
    rows = vector_tile_index([("a", a)]).collect()
    assert len(rows) == 1 and rows[0].location == "a"
    assert rows[0].n_features == a.count()
    rings = np.vstack(
        [tables.polygon_rings_local(i) for i in range(rows[0].n_features)]
    )
    assert rows[0].minx == round(float(rings[:, 0].min()), 6)
    assert rows[0].maxy == round(float(rings[:, 1].max()), 6)


def test_vector_reproject(spark):
    """vector reproject: 3857 matches the numpy LatLonToMeters mirror
    exactly; UTM obeys the TM analytic invariants (central meridian →
    easting 500000, equator → northing 0, east-west symmetry); other
    columns pass through untouched."""
    import numpy as np

    from gdal_spark import tables
    from gdal_spark.geometry import wkb as W
    from gdal_spark.operators.reproject import (
        _merc_forward,
        vector_reproject,
    )

    sf = "/root/testdata/sf0.001"
    a = tables.polygons_a_df(spark, sf)
    out = {
        r.polygon_id: bytes(r.geometry)
        for r in vector_reproject(a, "EPSG:3857").collect()
    }
    for pid in (0, 7, 24):
        src = tables.polygon_rings_local(pid)
        got = W.parse_wkb(out[pid])[1][0]
        ex, ey = _merc_forward(src[:, 0], src[:, 1])
        assert np.array_equal(got[:, 0], ex) and np.array_equal(
            got[:, 1], ey
        )

    pts = spark.createDataFrame(
        [
            (0, bytearray(W.points_to_wkb([-75.0], [0.0])[0])),
            (1, bytearray(W.points_to_wkb([-75.0], [40.0])[0])),
            (2, bytearray(W.points_to_wkb([-74.0], [40.0])[0])),
            (3, bytearray(W.points_to_wkb([-76.0], [40.0])[0])),
        ],
        "fid long, geometry binary",
    )
    utm = {
        r.fid: W.parse_wkb(bytes(r.geometry))[1][0]
        for r in vector_reproject(pts, "utm:18").collect()
    }
    assert utm[0][0] == 500000.0 and abs(utm[0][1]) < 1e-6
    assert utm[1][0] == 500000.0 and utm[1][1] > 4.4e6
    assert abs((utm[2][0] - 500000.0) + (utm[3][0] - 500000.0)) < 1e-6
    assert abs(utm[2][1] - utm[3][1]) < 1e-6


def test_raster_scale_autorange(spark):
    """gdal raster scale with the source range omitted: per-band
    min/max computed distributed (the ComputeRasterMinMax analog) and
    broadcast back; output spans exactly [dst_min, dst_max]."""
    import numpy as np

    from gdal_spark.raster import model, ops

    blocks = model.synth_blocks(spark, model.grad100_spec())
    out = ops.scale_minmax(blocks, 10.0, 20.0)
    s = {r.band: r for r in ops.band_stats(out).collect()}
    for b in (1, 2, 3):
        assert s[b].vmin == 10.0 and s[b].vmax == 20.0
    # spot-check linearity on band 1 (src range is 0..255)
    v = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    exp = 10.0 + v * (10.0 / 255.0)
    got = np.zeros((100, 100))
    for r in out.where("band = 1").collect():
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        got[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    assert np.allclose(got, exp, rtol=0, atol=1e-12)


def test_raster_resize_roundtrip_dims(spark):
    """gdal raster resize: output grid has the requested dims, the
    same world extent, and nearest picks the expected lattice."""
    import numpy as np

    from gdal_spark.raster import model, ops

    blocks = model.synth_blocks(spark, model.grad100_spec())
    out = ops.resize(blocks, 40, 40, "nearest", band=1)
    rows = out.collect()
    W = max(r.x0 + r.width for r in rows)
    H = max(r.y0 + r.height for r in rows)
    assert (W, H) == (40, 40)
    g = model.grad100_spec().gt
    r0 = rows[0]
    assert r0.gt0 == g[0] and r0.gt3 == g[3]
    assert abs(r0.gt1 * 40 - g[1] * 100) < 1e-12  # same extent
    got = np.zeros((40, 40))
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        got[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    ix = np.floor(2.5 * np.arange(40) + 1.25).astype(np.int64)
    exp = model.value_grid(0, 0, 100, 100, 1)[np.ix_(ix, ix)]
    assert np.array_equal(got, exp)


def test_overview_refresh_incremental(spark):
    """overview refresh --bbox: the refreshed table equals a full
    overview recompute of the patched raster byte-for-byte, and blocks
    outside the dirty window pass through from the stale overview
    untouched."""
    import numpy as np

    from pyspark.sql import functions as F

    from gdal_spark.raster import model, ops
    from gdal_spark.raster import resample as RS

    blocks = model.synth_blocks(spark, model.grad100_spec())

    def complement(it):
        import pandas as pd

        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                a = model.decode(
                    (r["buf"], r["height"], r["width"], r["dtype"])
                )
                d = dict(r)
                d["buf"] = np.ascontiguousarray(
                    (255 - a).astype(np.uint8)
                ).tobytes()
                out.append(d)
            yield pd.DataFrame(out, columns=list(pdf.columns))

    src = blocks.where(
        (F.col("bx") == 2) & (F.col("by") == 2) & (F.col("band") == 1)
    ).mapInPandas(complement, model.BLOCK_SCHEMA)
    updated = ops.update(blocks, src, src_nodata=0.0)
    stale = RS.overview_blocks(blocks)
    got = {
        (r.band, r.bx, r.by): bytes(r.buf)
        for r in RS.overview_refresh(
            updated, stale, (64, 64, 32, 32)
        ).collect()
    }
    full = {
        (r.band, r.bx, r.by): bytes(r.buf)
        for r in RS.overview_blocks(updated).collect()
    }
    assert got == full
    stale_map = {
        (r.band, r.bx, r.by): bytes(r.buf) for r in stale.collect()
    }
    # dirty window (64,64,32,32) -> overview block (1,1) only
    for k, buf in got.items():
        if (k[1], k[2]) != (1, 1):
            assert buf == stale_map[k]
    assert got[(1, 1, 1)] != stale_map[(1, 1, 1)]
