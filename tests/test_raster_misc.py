

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
