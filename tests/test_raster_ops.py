"""Raster core-operator tests vs direct numpy computation."""

import numpy as np
import pytest

from gdal_spark import tables
from gdal_spark.geometry.kernels import points_in_rings
from gdal_spark.raster import model, ops


@pytest.fixture(scope="module")
def blocks(spark):
    return model.synth_blocks(spark, model.grad100_spec())


def full_grid(band):
    return model.value_grid(0, 0, 100, 100, band)


def ref_checksum(arr):
    primes = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], np.int64)
    v = arr.astype(np.int64).ravel()
    idx = np.arange(v.size)
    return int((v % primes[idx % 11]).sum() & 0xFFFF)


def test_block_layout(blocks):
    rows = blocks.collect()
    assert len(rows) == 3 * 16  # 4x4 blocks x 3 bands
    # partial edge blocks
    sizes = {(r.bx, r.by): (r.width, r.height) for r in rows if r.band == 1}
    assert sizes[(0, 0)] == (32, 32)
    assert sizes[(3, 3)] == (4, 4)
    # reassemble and compare to the analytic grid
    full = np.zeros((100, 100), dtype=np.uint8)
    for r in rows:
        if r.band != 2:
            continue
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    assert np.array_equal(full, full_grid(2))


def test_checksum_matches_reference_formula(blocks):
    got = {r.band: r.checksum for r in ops.checksum(blocks, width=100).collect()}
    for b in (1, 2, 3):
        assert got[b] == ref_checksum(full_grid(b))


def test_band_stats(blocks):
    got = {r.band: r for r in ops.band_stats(blocks).collect()}
    for b in (1, 2, 3):
        g = full_grid(b).astype(np.float64)
        assert got[b].cnt == 10000
        assert got[b].vmin == g.min()
        assert got[b].vmax == g.max()
        assert got[b].vsum == pytest.approx(g.sum(), rel=1e-12)
        assert got[b].stddev_pop == pytest.approx(g.std(), rel=1e-9)


def test_translate_crop_cast_scale(blocks):
    t = ops.translate(blocks, (10, 20, 50, 40), ot="int32", scale=(2.0, 1.0))
    rows = t.where("band = 1").collect()
    full = np.full((40, 50), -1, dtype=np.int64)
    for r in rows:
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        assert r.dtype == "int32"
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    want = np.floor(
        full_grid(1)[20:60, 10:60].astype(np.float64) * 2.0 + 1.0 + 0.5
    ).astype(np.int64)
    assert np.array_equal(full, want)
    # geotransform re-origined to the window
    spec = model.grad100_spec()
    assert rows[0].gt0 == spec.gt[0] + 10 * spec.gt[1]
    assert rows[0].gt3 == spec.gt[3] + 20 * spec.gt[5]


def test_pixel_functions(blocks, spark):
    for func, ref in [
        ("sum", lambda s: s.sum(0)),
        ("diff", lambda s: s[0] - s[1]),
        ("norm_diff", lambda s: (s[0] - s[1]) / np.where(s[0] + s[1] == 0, 1, s[0] + s[1]) * (s[0] + s[1] != 0)),
        ("max", lambda s: s.max(0)),
    ]:
        out = ops.pixel_function(blocks.where("band in (1,2)"), func)
        rows = out.collect()
        full = np.zeros((100, 100))
        for r in rows:
            a = model.decode((r.buf, r.height, r.width, r.dtype))
            full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
        stack = np.stack([full_grid(1), full_grid(2)]).astype(np.float64)
        assert np.allclose(full, ref(stack)), func


def test_reclassify(blocks):
    out = ops.reclassify(
        blocks.where("band = 1"), {0: 100, 1: 101, 255: 7}, default=-1
    )
    full = np.zeros((100, 100), dtype=np.int64)
    for r in out.collect():
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    g = full_grid(1).astype(np.int64)
    want = np.select([g == 0, g == 1, g == 255], [100, 101, 7], default=-1)
    assert np.array_equal(full, want)


def test_zonal_stats_vs_numpy(blocks):
    ring = tables.polygon_rings_local(0)[:-1]
    got = {
        r.zone_id: r
        for r in ops.zonal_stats(blocks, [(0, ring)], band=1).collect()
    }
    spec = model.grad100_spec()
    g = full_grid(1).astype(np.float64)
    ys, xs = np.mgrid[0:100, 0:100]
    lon = spec.gt[0] + (xs.ravel() + 0.5) * spec.gt[1]
    lat = spec.gt[3] + (ys.ravel() + 0.5) * spec.gt[5]
    inside = points_in_rings(lon, lat, [ring])
    sel = g.ravel()[inside]
    assert got[0].cnt == sel.size
    assert got[0].vsum == pytest.approx(sel.sum(), rel=1e-12)
    assert got[0].vmin == sel.min()
    assert got[0].vmax == sel.max()


def test_as_features_coords(blocks):
    f = (
        ops.as_features(blocks)
        .where("band = 1 and x = 0 and y = 0")
        .collect()[0]
    )
    spec = model.grad100_spec()
    assert f.lon == spec.gt[0] + 0.5 * spec.gt[1]
    assert f.lat == spec.gt[3] + 0.5 * spec.gt[5]
    assert f.value == float(full_grid(1)[0, 0])


def test_pixel_function_registry_complete():
    """Round-2 registry completion (frmts/vrt/pixelfunctions.cpp names):
    numpy-golden checks for the functions not covered by the SQL-oracle
    driver query (complex-degenerate set, dB family, means)."""
    import numpy as np

    from gdal_spark.raster.ops import _PIXFUNCS

    s = np.stack(
        [
            np.array([[1.0, 4.0], [9.0, 16.0]]),
            np.array([[2.0, 2.0], [3.0, 5.0]]),
            np.array([[4.0, 8.0], [3.0, 1.0]]),
        ]
    )
    assert np.allclose(_PIXFUNCS["real"](s), s[0])
    assert np.allclose(_PIXFUNCS["imag"](s), 0.0)
    assert np.allclose(_PIXFUNCS["conj"](s), s[0])
    assert np.allclose(_PIXFUNCS["mod"](s), np.abs(s[0]))
    assert np.allclose(_PIXFUNCS["phase"](-s), np.pi)
    assert np.allclose(_PIXFUNCS["dB"](s), 20 * np.log10(s[0]))
    assert np.allclose(_PIXFUNCS["dB2amp"](s), 10 ** (s[0] / 20))
    assert np.allclose(_PIXFUNCS["dB2pow"](s), 10 ** (s[0] / 10))
    assert np.allclose(
        _PIXFUNCS["geometric_mean"](s), np.exp(np.mean(np.log(s), axis=0))
    )
    assert np.allclose(
        _PIXFUNCS["harmonic_mean"](s), 3.0 / np.sum(1.0 / s, axis=0)
    )
    assert np.allclose(_PIXFUNCS["inv"](s), 1.0 / s[0])
    n = _PIXFUNCS["nan"](np.stack([np.array([[0.0, 2.0]])]), to_nan=0.0)
    assert np.isnan(n[0, 0]) and n[0, 1] == 2.0
    r = _PIXFUNCS["replace_nodata"](np.stack([n]), to=7.0)
    assert r[0, 0] == 7.0
    assert np.allclose(
        _PIXFUNCS["interpolate_exp"](s, t=0.5, t0=0.0, t1=1.0),
        s[0] * np.power(s[1] / s[0], 0.5),
    )
    assert len(_PIXFUNCS) >= 36


def test_calc_expression_dialect():
    """muparser-analog parser: precedence, right-assoc ^, comparisons as
    1/0, ternary-via-where, safe failure on unknown names — no eval()."""
    import numpy as np
    import pytest

    from gdal_spark.raster.calc import eval_expr, parse_expr

    a = np.array([1.0, 4.0, 9.0])
    b = np.array([2.0, 2.0, 2.0])
    env = {"b1": a, "b2": b}

    def run(src):
        return eval_expr(parse_expr(src), env)

    assert np.allclose(run("b1 + b2 * 2"), a + b * 2)
    assert np.allclose(run("2 ^ 3 ^ 2"), 512.0)  # right-assoc
    assert np.allclose(run("-b1 ^ 2"), -(a**2))  # unary binds looser
    assert np.allclose(run("(b1 > 2) * 5"), (a > 2) * 5.0)
    assert np.allclose(run("where(b1 >= 4, b1, b2)"), np.where(a >= 4, a, b))
    assert np.allclose(run("min(b1, b2) + max(b1, 3)"), np.minimum(a, b) + np.maximum(a, 3))
    assert np.allclose(run("sqrt(b1) % 2"), np.sqrt(a) % 2)
    assert np.allclose(run("b1 / b2"), a / b)
    assert np.allclose(run("(b1 < 5) && (b2 == 2)"), ((a < 5) & (b == 2)).astype(float))
    assert np.allclose(run("!(b1 > 3)"), (~(a > 3)).astype(float))
    with pytest.raises(ValueError):
        run("__import__('os')")
    with pytest.raises(ValueError):
        run("b3 + 1")
    with pytest.raises(ValueError):
        parse_expr("1 +")


def test_zonal_ext_inclusion_modes(spark):
    """alg/zonal.cpp:2079-2110: DEFAULT vs ALL_TOUCHED vs FRACTIONAL on
    a fractional-edge rect zone; weighted count equals the exact covered
    area, argmin/argmax are deterministic."""
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.ops import zonal_stats_ext

    blocks = model.synth_blocks(spark, model.grad100_spec())
    g = model.grad100_spec().gt
    # zone: pixel rect x 10.25..13.75, y 20.5-? use 20.25..23.75
    x0, x1, y0, y1 = 10.25, 13.75, 20.25, 23.75
    ring = np.array(
        [
            [g[0] + x0 * g[1], g[3] + y0 * g[5]],
            [g[0] + x1 * g[1], g[3] + y0 * g[5]],
            [g[0] + x1 * g[1], g[3] + y1 * g[5]],
            [g[0] + x0 * g[1], g[3] + y1 * g[5]],
        ]
    )
    res = {}
    for mode in ("default", "all_touched", "fractional"):
        rows = zonal_stats_ext(blocks, [(1, ring)], band=1, inclusion=mode)
        res[mode] = rows.collect()[0]
    # centers inside (10.25,13.75): pixels 10..13 → 4x4 = 16... but
    # center 10.5>10.25 ok, 13.5<13.75 ok → x in {10..13}; y likewise
    assert res["default"].cnt == 16.0
    # all_touched: pixel [10,11) overlaps from x=10; [13,14) until 13.75
    # → x in {10..13}; plus boundary pixels whose rect overlaps:
    # x=10 covers 10..11 > 10.25 ✓; x=13 covers 13..14 ∩ ..13.75 ✓ —
    # same x-range BUT also the partially-covered ones are the same set
    # here; y likewise → 16
    assert res["all_touched"].cnt == 16.0
    # fractional: exact covered area = 3.5 * 3.5 = 12.25
    assert abs(res["fractional"].cnt - 12.25) < 1e-9
    # argmin/argmax fall inside the zone's pixel range
    for m in res.values():
        assert 10 <= m.argmin_x <= 13 and 20 <= m.argmin_y <= 23
        assert 10 <= m.argmax_x <= 13 and 20 <= m.argmax_y <= 23


def test_median_cut_palette_and_nearest(spark):
    """Heckbert median cut (alg/gdalmediancut.cpp role): 4 well-separated
    color clusters → 4-color palette at the cluster means; nearest-color
    application matches a numpy brute force per pixel."""
    import numpy as np

    from gdal_spark.raster import model, palette as P

    rng = np.random.default_rng(3)
    base = np.array([[20, 20, 20], [200, 30, 30], [30, 200, 30], [40, 40, 220]])
    h = w = 32
    pick = rng.integers(0, 4, (h, w))
    img = base[pick] + rng.integers(-4, 5, (h, w, 3))
    img = np.clip(img, 0, 255).astype(np.float64)
    rows = []
    for band in range(3):
        rows.append(
            ("rgb", band + 1, 0, 0, 0, 0, w, h, "float64",
             0.0, 1.0, 0.0, 0.0, 0.0, -1.0, None,
             bytearray(np.ascontiguousarray(img[..., band]).tobytes()))
        )
    blocks = spark.createDataFrame(rows, model.BLOCK_SCHEMA)
    pal = P.compute_median_cut_palette(blocks, n_colors=8)
    assert pal.shape == (8, 3)
    # Heckbert's guarantee is low overall quantization error, not exact
    # cluster recovery: mean per-pixel error small, every pixel bounded
    pf = pal.astype(np.float64)
    d = np.sqrt(
        ((img[..., None, :] - pf[None, None, :, :]) ** 2).sum(-1)
    ).min(axis=-1)
    assert d.mean() < 25.0, d.mean()
    assert d.max() < 90.0, d.max()
    # deterministic
    pal2 = P.compute_median_cut_palette(blocks, n_colors=8)
    assert np.array_equal(pal, pal2)

    out = P.rgb_to_palette(blocks, pal).collect()[0]
    idx = model.decode((out.buf, h, w, out.dtype))
    pf = pal.astype(np.float64)
    want = np.argmin(
        ((img[..., None, :] - pf[None, None, :, :]) ** 2).sum(-1), axis=-1
    )
    assert np.array_equal(idx, want)


def test_floyd_steinberg_preserves_mean():
    """Error diffusion conserves the local mean: a constant gray not in
    the palette dithers to a mix whose mean is within 1 unit."""
    import numpy as np

    from gdal_spark.raster.palette import floyd_steinberg

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    img = np.full((24, 24, 3), 100.0)
    idx = floyd_steinberg(img, pal)
    mean = pal[idx].astype(np.float64).mean()
    assert abs(mean - 100.0) < 1.5
    # exact palette color maps to itself, no dithering noise
    img2 = np.zeros((8, 8, 3))
    assert (floyd_steinberg(img2, pal) == 0).all()


def test_calc_multi_named_inputs(spark):
    """calc_multi (apps/gdalalg_raster_calc.cpp:609,717): A[b] indexed
    reads, bare-name per-band expansion, block-grid mismatch guard."""
    import numpy as np
    import pytest as _pytest

    from gdal_spark.raster import calc as C
    from gdal_spark.raster import model

    G = model.synth_blocks(spark, model.grad100_spec())
    A, B = G.where("band = 1"), G.where("band = 2")
    out = C.calc_multi(
        {"A": A, "B": B}, "A[1] + 2*B[2] + where(A[1] > B[2], 1, 0)"
    )
    got = {(r["bx"], r["by"]): r for r in out.collect()}
    ar = {(r["bx"], r["by"]): r for r in A.collect()}
    br = {(r["bx"], r["by"]): r for r in B.collect()}
    assert set(got) == set(ar)
    for k, r in got.items():
        a = model.decode(
            (ar[k]["buf"], ar[k]["height"], ar[k]["width"], ar[k]["dtype"])
        ).astype(np.float64)
        b = model.decode(
            (br[k]["buf"], br[k]["height"], br[k]["width"], br[k]["dtype"])
        ).astype(np.float64)
        exp = a + 2 * b + (a > b).astype(np.float64)
        assert np.array_equal(
            np.frombuffer(r["buf"]).reshape(r["height"], r["width"]), exp
        )
    # bare name expands per band: one output band per input band
    out2 = C.calc_multi({"X": G}, "X + 3")
    assert sorted({r["band"] for r in out2.collect()}) == [1, 2, 3]
    # un-indexed variables with unequal band counts are rejected
    with _pytest.raises(ValueError, match="equal band counts"):
        C.calc_multi({"X": G, "Y": A}, "X + Y")
    # indexed read of a missing band is rejected driver-side
    with _pytest.raises(ValueError, match="not in"):
        C.calc_multi({"A": A}, "A[7]")
    # different block grids raise inside the kernel
    P = model.synth_blocks(spark, model.plane_spec()).where("band = 1")
    with _pytest.raises(Exception, match="block grid"):
        C.calc_multi({"A": A, "B": P}, "A[1] + B[1]").collect()


def test_histogram_gethistogram_rule(spark):
    """GetHistogram parity (gcore/gdalrasterband.cpp:4263,4499-4514):
    bucket = floor((v-min)*n/(max-min)); out-of-range skipped unless
    include_out_of_range (then clamped to the edge buckets)."""
    import numpy as np

    from gdal_spark.raster import model, ops

    g = model.synth_blocks(spark, model.grad100_spec())
    got = {
        (r["band"], r["bucket"]): r["n"]
        for r in ops.histogram(g, 0.0, 256.0, 16).collect()
    }
    want = {}
    for b in (1, 2, 3):
        v = model.value_grid(0, 0, 100, 100, b).astype(np.float64).ravel()
        idx = np.floor(v * 16 / 256.0).astype(int)
        for i, c in zip(*np.unique(idx, return_counts=True)):
            want[(b, int(i))] = int(c)
    assert got == want
    # default uint8 range (-0.5, 255.5): identity buckets = value counts
    d = {
        (r["band"], r["bucket"]): r["n"]
        for r in ops.histogram(g.where("band = 1")).collect()
    }
    v = model.value_grid(0, 0, 100, 100, 1).ravel()
    u, c = np.unique(v, return_counts=True)
    assert d == {(1, int(x)): int(n) for x, n in zip(u, c)}
    # narrow range: out-of-range values skipped vs clamped to the edges
    skip = ops.histogram(g.where("band = 1"), 64.0, 192.0, 8).collect()
    incl = ops.histogram(
        g.where("band = 1"), 64.0, 192.0, 8, include_out_of_range=True
    ).collect()
    v64 = v.astype(np.float64)
    inside = ((v64 >= 64) & (v64 < 192)).sum()
    assert sum(r["n"] for r in skip) == inside
    assert sum(r["n"] for r in incl) == v.size
    edge = {r["bucket"]: r["n"] for r in incl}
    below, above = (v64 < 64).sum(), (v64 >= 192).sum()
    skip_edge = {r["bucket"]: r["n"] for r in skip}
    assert edge[0] == skip_edge[0] + below
    assert edge[7] == skip_edge[7] + above


def test_clip_cutline_invert_crop_and_holes(spark):
    """Inside/outside partition the raster exactly; crop drops
    never-inside blocks; a hole ring flips parity (donut cutline)."""
    import numpy as np

    from gdal_spark import tables
    from gdal_spark.geometry.kernels import points_in_rings
    from gdal_spark.raster import model, ops

    b = model.synth_blocks(spark, model.grad100_spec())
    ring = tables.polygon_rings_local(0)
    spec = model.grad100_spec()
    gt = spec.gt
    xs = np.arange(100) + 0.5
    ys = np.arange(100) + 0.5
    lon = np.broadcast_to(gt[0] + xs[None, :] * gt[1], (100, 100))
    lat = np.broadcast_to(gt[3] + ys[:, None] * gt[5], (100, 100))

    def kept_mask(rings):
        return points_in_rings(lon.ravel(), lat.ravel(), rings).reshape(
            100, 100
        )

    def spark_kept(df):
        f = ops.as_features(df)
        return {
            (r.band, r.x, r.y)
            for r in f.where("value <> 0").collect()
        }

    ins = kept_mask([ring])
    truth = {
        (band, x, y)
        for band in (1, 2, 3)
        for y, x in zip(*np.nonzero(ins & (model.value_grid(0, 0, 100, 100, band) != 0)))
    }
    got = spark_kept(ops.clip_cutline(b, [ring]))
    assert got == truth

    # invert: kept pixels are exactly the complement (of nonzero)
    inv = spark_kept(ops.clip_cutline(b, [ring], invert=True))
    all_nonzero = {
        (band, x, y)
        for band in (1, 2, 3)
        for y, x in zip(*np.nonzero(model.value_grid(0, 0, 100, 100, band) != 0))
    }
    assert got | inv == all_nonzero and not (got & inv)

    # crop drops blocks with no inside pixel, keeps all inside pixels
    cropped = ops.clip_cutline(b, [ring], crop=True)
    assert cropped.count() < b.count()
    assert spark_kept(cropped) == truth

    # hole: shrink the octagon around its center to make a donut
    c = ring[:-1].mean(axis=0)
    hole = (ring - c) * 0.5 + c
    donut_truth = kept_mask([ring, hole])
    got_d = spark_kept(ops.clip_cutline(b, [ring, hole]))
    want_d = {
        (band, x, y)
        for band in (1, 2, 3)
        for y, x in zip(
            *np.nonzero(donut_truth & (model.value_grid(0, 0, 100, 100, band) != 0))
        )
    }
    assert got_d == want_d and len(got_d) < len(got)
