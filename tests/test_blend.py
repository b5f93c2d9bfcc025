"""raster blend (apps/gdalalg_raster_blend.cpp) — engine kernels vs an
independent pure-Python transcription of the reference's scalar loops,
plus the algebraic identities the reference's modes guarantee."""

import numpy as np
import pytest

from gdal_spark.raster.blend import MODES, _blend_rgb, blend


def _mul(a, b):
    return (a * b + 255) // 256


def _div(a, b):
    if a == 0:
        return 0
    if b == 0:
        return 255
    return (a * 255) // b


def _gb(x):
    return x & 255


def _sep_scalar(mode, C, A, OC, OA, fa, am):
    """Scalar transcription of the Blend*_Generic kernels
    (apps/gdalalg_raster_blend.cpp:891-1540)."""
    edge = _mul(C, 255 - OA) + _mul(OC, 255 - A)
    if mode == "multiply":
        return _div(_gb(_mul(C, OC) + edge), fa)
    if mode == "screen":
        return _div(_gb(C + OC - _mul(C, OC)), fa)
    if mode == "overlay":
        if 2 * C < A:
            return _div(_gb(2 * _mul(C, OC) + edge), fa)
        return _div(_gb(am - 2 * _mul(A - C, OA - OC) + edge), fa)
    if mode == "darken":
        return _div(_gb(min(_mul(OC, A), _mul(C, OA)) + edge), fa)
    if mode == "lighten":
        return _div(_gb(max(_mul(OC, A), _mul(C, OA)) + edge), fa)
    if mode == "color-dodge":
        if _mul(OC, A) + _mul(C, OA) >= am:
            return _div(_gb(am + edge), fa)
        return _div(_gb(_div(_mul(C, OA), 255 - _div(OC, OA)) + edge), fa)
    if mode == "color-burn":
        if _mul(OC, A) + _mul(C, OA) <= am:
            return _div(_gb(edge), fa)
        return _div(
            _gb(_mul(am, _gb(_div(C, A) + _div(OC, OA) - 255)) + edge), fa
        )
    raise ValueError(mode)


@pytest.fixture(scope="module")
def channels():
    rng = np.random.RandomState(42)
    return [rng.randint(0, 256, (16, 16)).astype(np.int64) for _ in range(4)]


SEPARABLE = (
    "multiply",
    "screen",
    "overlay",
    "darken",
    "lighten",
    "color-burn",
    "color-dodge",
)


@pytest.mark.parametrize("mode", SEPARABLE)
@pytest.mark.parametrize("opacity", [0, 77, 179, 255])
def test_separable_matches_scalar_transcription(channels, mode, opacity):
    R, G, B, gray = channels
    ro, go, bo = _blend_rgb(mode, opacity, R, G, B, gray)
    a, oa, fa = 255, opacity, 255
    am = _mul(a, oa)
    for arr, c in ((ro, R), (go, G), (bo, B)):
        exp = np.array(
            [
                [
                    _sep_scalar(
                        mode,
                        int(c[i, j]),
                        a,
                        _mul(int(gray[i, j]), oa),
                        oa,
                        fa,
                        am,
                    )
                    for j in range(16)
                ]
                for i in range(16)
            ]
        )
        assert np.array_equal(arr, exp)


@pytest.mark.parametrize("opacity", [0, 179, 255])
def test_hard_light_is_overlay_swapped(channels, opacity):
    R, G, B, gray = channels
    ro, _, _ = _blend_rgb("hard-light", opacity, R, G, B, gray)
    a, oa, fa = opacity, 255, 255
    am = _mul(oa, a)
    exp = np.array(
        [
            [
                _sep_scalar(
                    "overlay",
                    _mul(int(gray[i, j]), a),
                    a,
                    int(R[i, j]),
                    oa,
                    fa,
                    am,
                )
                for j in range(16)
            ]
            for i in range(16)
        ]
    )
    assert np.array_equal(ro, exp)


def test_src_over_identities(channels):
    R, G, B, gray = channels
    # opacity 0 -> base unchanged; 255 -> overlay replaces all channels
    ro, go, bo = _blend_rgb("src-over", 0, R, G, B, gray)
    assert np.array_equal(ro, R) and np.array_equal(go, G)
    ro, go, bo = _blend_rgb("src-over", 255, R, G, B, gray)
    assert np.array_equal(ro, gray) and np.array_equal(bo, gray)


def test_multiply_opacity_zero_is_identity(channels):
    R, G, B, gray = channels
    ro, go, bo = _blend_rgb("multiply", 0, R, G, B, gray)
    assert np.array_equal(ro, R)
    assert np.array_equal(go, G)
    assert np.array_equal(bo, B)


def test_hsv_value_channel_replaced(channels):
    R, G, B, gray = channels
    ro, go, bo = _blend_rgb("hsv-value", 179, R, G, B, gray)
    # the HSV value channel (max of r,g,b) must equal the overlay gray
    assert np.array_equal(np.maximum(np.maximum(ro, go), bo), gray)
    # all bytes
    for arr in (ro, go, bo):
        assert arr.min() >= 0 and arr.max() <= 255


def test_hsv_pure_gray_base(channels):
    gray = channels[3]
    g0 = np.full_like(gray, 100)
    # gray base: s == 0 -> output is (v, v, v)
    ro, go, bo = _blend_rgb("hsv-value", 255, g0, g0, g0, gray)
    assert np.array_equal(ro, gray)
    assert np.array_equal(go, gray)
    assert np.array_equal(bo, gray)


def test_blend_dataframe_plumbing(spark):
    from gdal_spark.raster import model, ops

    blocks = model.synth_blocks(spark, model.grad100_spec())
    over = blocks.where("band = 3")
    out = blend(blocks, over, mode="darken", opacity=179)
    feats = (
        ops.as_features(out)
        .where("x < 4 and y < 4 and band = 1")
        .select("x", "y", "value")
        .collect()
    )
    assert len(feats) == 16
    got = {(r.x, r.y): int(r.value) for r in feats}
    a, oa, fa = 255, 179, 255
    am = _mul(a, oa)
    for (x, y), v in got.items():
        r = (x * 7 + y * 13 + 1 * 17) % 256
        g3 = (x * 7 + y * 13 + 3 * 17) % 256
        exp = _sep_scalar("darken", r, a, _mul(g3, oa), oa, fa, am)
        assert v == exp, (x, y, v, exp)


def test_unknown_mode_raises(spark):
    from gdal_spark.raster import model

    blocks = model.synth_blocks(spark, model.grad100_spec())
    with pytest.raises(ValueError):
        blend(blocks, blocks.where("band = 3"), mode="xor")


def test_modes_registry_matches_reference():
    # CompositionModes() registry (apps/gdalalg_raster_blend.cpp:44-56)
    assert set(MODES) == {
        "src-over",
        "hsv-value",
        "multiply",
        "screen",
        "overlay",
        "hard-light",
        "darken",
        "lighten",
        "color-burn",
        "color-dodge",
    }
