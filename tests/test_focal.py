"""Focal/DEM stencil tests — analytic-plane goldens + halo correctness.

The plane60 fixture is z = 3x + 4y (x=col, y=row), pixel size 1 (north-up
gt5 = -1). Horn derivatives on a plane are exact everywhere INTERIOR to
the raster: dz/dx = 3, dz/dy(grid) = 4 → slope = atan(5). Pixels on
block seams (x or y = 31/32) are interior to the raster, so any halo
mistake shows up as a wrong value exactly there.
"""

import numpy as np
import pytest

from gdal_spark.raster import focal, model


@pytest.fixture(scope="module")
def plane_blocks(spark):
    return model.synth_blocks(spark, model.plane_spec())


def assemble(rows, size=60):
    full = np.full((size, size), np.nan)
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    assert not np.isnan(full).any()
    return full


def test_slope_plane(plane_blocks):
    out = assemble(focal.focal(plane_blocks, "slope").collect())
    want = np.degrees(np.arctan(5.0))
    interior = out[1:-1, 1:-1]
    assert np.allclose(interior, want, atol=1e-9)
    # seam pixels are interior → halo exchange must make them exact
    assert out[31, 31] == pytest.approx(want, abs=1e-9)
    assert out[32, 5] == pytest.approx(want, abs=1e-9)
    assert out[5, 32] == pytest.approx(want, abs=1e-9)


def test_aspect_constant(plane_blocks):
    out = assemble(focal.focal(plane_blocks, "aspect").collect())
    interior = out[1:-1, 1:-1]
    assert np.allclose(interior, interior[5, 5], atol=1e-9)
    assert 0 <= interior[5, 5] < 360


def test_hillshade_constant_and_range(plane_blocks):
    out = assemble(focal.focal(plane_blocks, "hillshade").collect())
    interior = out[1:-1, 1:-1]
    assert np.allclose(interior, interior[5, 5], atol=1e-9)
    assert 1.0 <= interior[5, 5] <= 255.0


def test_focal_mean_linear(plane_blocks):
    """3×3 mean of a linear field equals the field (interior)."""
    out = assemble(focal.focal(plane_blocks, "mean").collect())
    ys, xs = np.mgrid[0:60, 0:60]
    want = 3.0 * xs + 4.0 * ys
    assert np.allclose(out[1:-1, 1:-1], want[1:-1, 1:-1], atol=1e-9)


def test_tpi_zero_tri_constant(plane_blocks):
    tpi = assemble(focal.focal(plane_blocks, "tpi").collect())
    assert np.allclose(tpi[1:-1, 1:-1], 0.0, atol=1e-9)
    tri = assemble(focal.focal(plane_blocks, "tri").collect())
    # mean |Δz| over 8 neighbors of plane 3x+4y: (3+3+4+4+7+7+1+1)/8
    assert np.allclose(tri[1:-1, 1:-1], 30.0 / 8.0, atol=1e-9)


def test_roughness(plane_blocks):
    r = assemble(focal.focal(plane_blocks, "roughness").collect())
    # max-min over 3×3 window of the plane = 7 - (-7) = 14
    assert np.allclose(r[1:-1, 1:-1], 14.0, atol=1e-9)


def test_fillnodata(spark):
    """rasterfill analog: punched holes refill with the 3×3 valid-mean;
    on the linear plane the neighbor mean equals the plane value."""
    import pandas as pd
    from pyspark.sql import functions as F

    spec = model.plane_spec()
    blocks = model.synth_blocks(spark, spec)

    ND = -9999.0
    holes = [(10, 10), (31, 32), (45, 7)]  # incl. a block-seam hole

    def punch(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                    np.float64
                )
                for (hy, hx) in holes:
                    if r.y0 <= hy < r.y0 + r.height and r.x0 <= hx < r.x0 + r.width:
                        a[hy - r.y0, hx - r.x0] = ND
                d = r._asdict(); d.pop("Index", None)
                d["dtype"] = "float64"
                d["nodata"] = ND
                d["buf"] = np.ascontiguousarray(a).tobytes()
                out.append(d)
            yield pd.DataFrame(out)

    punched = blocks.mapInPandas(punch, model.BLOCK_SCHEMA)
    filled = assemble(focal.focal(punched, "fillnodata").collect())
    ys, xs = np.mgrid[0:60, 0:60]
    want = 3.0 * xs + 4.0 * ys
    for (hy, hx) in holes:
        assert filled[hy, hx] == pytest.approx(want[hy, hx], abs=1e-9)
    # untouched pixels pass through bit-exact
    mask = np.ones((60, 60), dtype=bool)
    for (hy, hx) in holes:
        mask[hy, hx] = False
    assert np.array_equal(filled[mask], want[mask])
