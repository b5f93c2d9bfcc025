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


def test_hillshade_variant_interior_closed_form(spark):
    """On the z = 3x + 4y plane (gt = (0,1,0,0,0,-1)) interior, the
    GDAL-convention gradients are gx = -3, gy = -4 (x is
    west-minus-east over SIGNED ewres, y is south-minus-north over
    SIGNED nsres = -1); each variant's interior value must equal the
    closed-form constant."""
    import numpy as np

    from gdal_spark.raster import focal as RF
    from gdal_spark.raster import model

    blocks = model.synth_blocks(spark, model.plane_spec())
    gx, gy = -3.0, -4.0
    sa, ca = np.sin(np.radians(45.0)), np.cos(np.radians(45.0))
    xx = gx * gx + gy * gy
    c225 = np.cos(np.radians(225.0))
    vals = [max(sa + (gx - gy) * c225 * ca, 0.0),
            max(sa - gx * ca, 0.0),
            max(sa + (gx + gy) * c225 * ca, 0.0),
            max(sa - gy * ca, 0.0)]
    wts = [0.5 * xx - gx * gy, gx * gx, 0.5 * xx + gx * gy, gy * gy]
    want_md = 1.0 + 127.0 * sum(w * v for w, v in zip(wts, vals)) / xx \
        / np.sqrt(1.0 + xx)
    azr = np.radians(315.0)
    cang = (sa - (gy * np.cos(azr) - gx * np.sin(azr)) * ca) \
        / np.sqrt(1.0 + xx)
    comb = 1.0 - np.arccos(cang) * np.arctan(np.sqrt(xx)) * (4 / np.pi**2)
    want_cb = 1.0 if comb <= 0 else 1.0 + 254.0 * comb
    ss = np.degrees(np.arctan(np.sqrt(xx))) / 90.0
    aspect = np.arctan2(32.0, -24.0)  # unscaled window sums
    target = 1.5 * np.pi - np.radians(315.0)
    diff = abs(aspect % (2 * np.pi) - target % (2 * np.pi))
    diff = 2 * np.pi - diff if diff > np.pi else diff
    want_ig = 255.0 * (1.0 - ss * (1.0 - diff / np.pi))
    for op, want in (("hillshade_multidirectional", want_md),
                     ("hillshade_combined", want_cb),
                     ("hillshade_igor", want_ig)):
        out = RF.focal(blocks, op)
        r = [x for x in out.collect() if x.bx == 0 and x.by == 0][0]
        arr = np.frombuffer(r.buf, dtype=np.float64).reshape(
            r.height, r.width)
        assert abs(arr[10, 10] - want) < 1e-9, op


def test_dem_variant_interior_closed_form(plane_blocks):
    """Riley TRI, percent slope, and ZT slope on the 3x+4y plane
    interior: sqrt(150), 500%, atan(5) degrees."""
    import numpy as np

    from gdal_spark.raster import focal as RF

    want = {
        "tri_riley": np.sqrt(150.0),
        "slope_percent": 500.0,
        "slope_zt": np.degrees(np.arctan(5.0)),
    }
    for op, w in want.items():
        out = RF.focal(plane_blocks, op)
        r = [x for x in out.collect() if x.bx == 0 and x.by == 0][0]
        arr = np.frombuffer(r.buf, dtype=np.float64).reshape(
            r.height, r.width)
        assert abs(arr[10, 10] - w) < 1e-9, op


def test_hillshade_zt_equals_horn_on_plane(plane_blocks):
    """ZT and Horn gradients agree exactly on a linear surface, so
    hillshade_zt's interior must equal the Horn hillshade's."""
    import numpy as np

    from gdal_spark.raster import focal as RF

    vals = {}
    for op in ("hillshade", "hillshade_zt"):
        out = RF.focal(plane_blocks, op)
        r = [x for x in out.collect() if x.bx == 0 and x.by == 0][0]
        arr = np.frombuffer(r.buf, dtype=np.float64).reshape(
            r.height, r.width)
        vals[op] = arr[10, 10]
    assert vals["hillshade"] == vals["hillshade_zt"]


def test_neighbors_generic_kernels(spark):
    """gdal raster neighbors: generic radius-r halo matches a
    whole-array edge-replicate mirror for every named kernel shape —
    including the 5x5 kernels whose halo crosses block seams 2 deep —
    and the non-convolution combine methods."""
    import numpy as np

    from gdal_spark.raster import focal, model

    blocks = model.synth_blocks(spark, model.grad100_spec()).where(
        "band = 1"
    )
    v = model.value_grid(0, 0, 100, 100, 1)

    def mirror(K, method):
        r = K.shape[0] // 2
        pad = np.pad(v.astype(np.float64), r, mode="edge")
        h, w = v.shape
        views = [
            (K[i, j], pad[i : i + h, j : j + w])
            for i in range(K.shape[0])
            for j in range(K.shape[0])
        ]
        if method in ("sum", "mean"):
            out = sum(kw * x for kw, x in views if kw != 0.0)
            if method == "mean" and K.sum() != 0:
                out = out / K.sum()
            return out
        st = np.stack([x for kw, x in views if kw != 0.0])
        return {
            "min": st.min(0),
            "max": st.max(0),
            "median": np.median(st, 0),
            "stddev": st.std(0),
        }[method]

    cases = [("gaussian-5x5", "mean"), ("edge2", "sum"),
             ("u", "sum"), ("equal", "median"), ("equal", "stddev"),
             ("unsharp-masking-5x5", "mean")]
    for kern, method in cases:
        out = focal.neighbors(blocks, kernel=kern, method=method)
        full = np.zeros((100, 100))
        for r_ in out.collect():
            a = model.decode((r_.buf, r_.height, r_.width, r_.dtype))
            full[r_.y0 : r_.y0 + r_.height, r_.x0 : r_.x0 + r_.width] = a
        K = (
            np.ones((3, 3))
            if kern == "equal"
            else np.array(focal.NEIGHBOR_KERNELS[kern], dtype=np.float64)
        )
        exp = mirror(K, method)
        assert np.allclose(full, exp, rtol=0, atol=1e-9), (kern, method)
