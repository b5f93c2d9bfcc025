"""`gdal raster blend` — Porter-Duff-style composition of an overlay
raster onto a base (color) raster (apps/gdalalg_raster_blend.cpp).

Composition modes mirror the reference's CompositionModes() registry
(apps/gdalalg_raster_blend.cpp:44-56): src-over, hsv-value, multiply,
screen, overlay, hard-light, darken, lighten, color-burn, color-dodge.

The per-pixel math is the reference's exact byte-ratio integer algebra
(apps/gdalalg_raster_blend.cpp:179-256):

  MulScale255(a, b) = (a*b + 255) // 256        (ceiling-biased product)
  DivScale255(a, b) = 0 if a == 0 else 255 if b == 0 else (a*255) // b

so every separable mode is integer-exact and SQL-expressible — the
DuckDB oracle replays the same expressions symbolically.

Scope notes vs the reference:
- inputs are opaque (no alpha BANDS in the block model); the scalar
  `opacity` argument is the only alpha source, exactly like blending
  two RGB GeoTIFFs with --opacity. The general premultiplied formulas
  are kept so alpha-band support is a plumbing (not math) change.
- hsv-value replaces the value channel with the 1-band overlay
  directly — the reference's single-band-overlay fast path
  (apps/gdalalg_raster_blend.cpp:2480-2527, patch_value_line), which
  does not consult opacity. rgb_to_hs / hsv_to_rgb mirror
  apps/gdalalg_raster_blend.cpp:400-495 (float64 here vs float32
  there; the analytic fixture keeps values off rounding boundaries).

Scale design: blocks are the unit of work — one groupBy on the block
key zips the base bands with the overlay band; the kernel is pure
numpy over Arrow batches, no per-row Python, no driver collect. At
100 TB the plan is a single hash exchange on (bx, by) — the same
shape as the reference's per-chunk BlendBand::IRasterIO loop, with
Spark partitions replacing the chunk iterator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import model

MODES = (
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
)


def _mul255(a, b) -> np.ndarray:
    """MulScale255 (apps/gdalalg_raster_blend.cpp:183-186), int64-safe;
    either side may be a scalar or an array."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    return (a * b + 255) >> 8


def _div255(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """DivScale255 (apps/gdalalg_raster_blend.cpp:228-247)."""
    a = a.astype(np.int64)
    b = np.broadcast_to(np.asarray(b, dtype=np.int64), a.shape)
    safe = np.where(b == 0, 1, b)
    out = (a * 255) // safe
    out = np.where(b == 0, 255, out)
    return np.where(a == 0, 0, out)


def _sep_blend(mode: str, C, A, OC, OA, fa, alpha_mul):
    """One separable component: premultiplied base C (alpha A) composed
    with premultiplied overlay OC (alpha OA); fa = final alpha.
    Formula comments are the Mapserver-derived ones the reference
    carries verbatim (apps/gdalalg_raster_blend.cpp:891-1540)."""
    inv_oa = 255 - OA
    inv_a = 255 - A
    edge = _mul255(C, inv_oa) + _mul255(OC, inv_a)
    # Every composed int expression is cast to GByte at the
    # DivScale255/MulScale255 call boundary in C++ — mirror that wrap
    # with & 255 so results are byte-exact even at rounding edges.
    if mode == "multiply":
        # Dca' = Sca.Dca + Sca.(1 - Da) + Dca.(1 - Sa)
        return _div255((_mul255(C, OC) + edge) & 255, fa)
    if mode == "screen":
        # Dca' = Sca + Dca - Sca.Dca
        return _div255((C + OC - _mul255(C, OC)) & 255, fa)
    if mode == "overlay":
        # 2.Dca < Da ? 2.Sca.Dca + edge : Sa.Da - 2.(Da-Dca).(Sa-Sca) + edge
        lo = _div255((2 * _mul255(C, OC) + edge) & 255, fa)
        hi = _div255(
            (alpha_mul - 2 * _mul255(A - C, OA - OC) + edge) & 255, fa
        )
        return np.where(2 * C < A, lo, hi)
    if mode == "darken":
        return _div255(
            (np.minimum(_mul255(OC, A), _mul255(C, OA)) + edge) & 255, fa
        )
    if mode == "lighten":
        return _div255(
            (np.maximum(_mul255(OC, A), _mul255(C, OA)) + edge) & 255, fa
        )
    if mode == "color-dodge":
        # Sca.Da + Dca.Sa >= Sa.Da ? Sa.Da + edge
        #                          : Dca.Sa/(1-Sca/Sa) + edge
        cond = _mul255(OC, A) + _mul255(C, OA) >= alpha_mul
        ge = _div255((alpha_mul + edge) & 255, fa)
        lt = _div255(
            (_div255(_mul255(C, OA), 255 - _div255(OC, OA)) + edge) & 255,
            fa,
        )
        return np.where(cond, ge, lt)
    if mode == "color-burn":
        # Sca.Da + Dca.Sa <= Sa.Da ? edge
        #   : Sa.Da.(Dca/Da + Sca/Sa - 1) + edge
        cond = _mul255(OC, A) + _mul255(C, OA) <= alpha_mul
        le = _div255(edge & 255, fa)
        # the (Dca/Da + Sca/Sa - 1) factor is a GByte parameter in C++,
        # so a negative rounding-edge value wraps modulo 256 before the
        # multiply — & 255 reproduces that exactly.
        inner = (_div255(C, A) + _div255(OC, OA) - 255) & 255
        gt = _div255((_mul255(alpha_mul, inner) + edge) & 255, fa)
        return np.where(cond, le, gt)
    raise ValueError(f"unknown separable mode {mode}")


def _rgb_to_hs(r, g, b):
    """rgb_to_hs (apps/gdalalg_raster_blend.cpp:400-446), vectorized.
    Hue/saturation in [0,1]; same branch structure as the reference."""
    r = r.astype(np.float64)
    g = g.astype(np.float64)
    b = b.astype(np.float64)
    minc = np.minimum(np.minimum(r, g), b)
    maxc = np.maximum(np.maximum(r, g), b)
    d = maxc - minc
    s = d / np.maximum(1.0, maxc)
    denom = np.where(d == 0, 1.0, 6.0 * d)
    h_b = 4.0 / 6.0 + (r - g) / denom
    h_g = 2.0 / 6.0 + (b - r) / denom
    tmp = (g - b) / denom
    h_r = np.where(tmp < 0.0, tmp + 1.0, tmp)
    # reference precedence: maxc==b first, then maxc==g, else r
    return np.where(maxc == b, h_b, np.where(maxc == g, h_g, h_r)), s


def _hsv_to_rgb(h, s, v):
    """hsv_to_rgb (apps/gdalalg_raster_blend.cpp:472-495), vectorized;
    v is the byte value channel."""
    i = (6.0 * h).astype(np.int64)
    f = 6.0 * h - i
    v = v.astype(np.float64)
    p = (v * (1.0 - s) + 0.5).astype(np.int64)
    q = (v * (1.0 - s * f) + 0.5).astype(np.int64)
    t = (v * (1.0 - s * (1.0 - f)) + 0.5).astype(np.int64)
    vv = v.astype(np.int64)
    i = np.clip(i, 0, 5)
    r = np.choose(i, [vv, q, p, p, t, vv])
    g = np.choose(i, [t, vv, vv, q, p, p])
    b = np.choose(i, [p, p, t, vv, vv, q])
    return r, g, b


def _blend_rgb(mode: str, opacity: int, R, G, B, gray):
    """Compose overlay `gray` onto base (R,G,B); all uint8-valued
    int arrays. Returns (r,g,b) int arrays. Opaque inputs: base alpha
    255, overlay alpha = opacity (ProcessAlphaChannels with no alpha
    bands, apps/gdalalg_raster_blend.cpp:192-221)."""
    if mode == "src-over":
        # the reference's no-alpha fast path SrcOverRGB
        # (apps/gdalalg_raster_blend.cpp:2128-2141)
        out = [
            (gray.astype(np.int32) * opacity + c.astype(np.int32) * (255 - opacity) + 255)
            >> 8
            for c in (R, G, B)
        ]
        return out[0], out[1], out[2]
    if mode == "hsv-value":
        h, s = _rgb_to_hs(R, G, B)
        return _hsv_to_rgb(h, s, gray)
    if mode == "hard-light":
        # Overlay with source/overlay roles swapped AND swapped opacity:
        # the opacity multiplies the (new) base side, i.e. the original
        # overlay (apps/gdalalg_raster_blend.cpp:1159-1175 + :205-215).
        a = int(opacity)  # original overlay, now "base" alpha
        oa = 255  # original base, now "overlay" alpha
        fa = 255
        alpha_mul = int(_mul255(oa, a))
        cc = _mul255(gray, a)  # premultiplied new-base component
        outs = [
            _sep_blend(
                "overlay", cc, a, c.astype(np.int64), oa, fa, alpha_mul
            )
            for c in (R, G, B)
        ]
        return outs[0], outs[1], outs[2]
    # remaining separable modes: overlay alpha = opacity, base alpha 255
    oa = int(opacity)
    a = 255
    # Da' = Sa + Da - Sa.Da; with Da=255: MulScale255(oa,255)=oa -> 255
    fa = 255
    alpha_mul = int(_mul255(a, oa))
    og = _mul255(gray, oa)  # premultiplied overlay component
    outs = [
        _sep_blend(mode, c.astype(np.int64), a, og, oa, fa, alpha_mul)
        for c in (R, G, B)
    ]
    return outs[0], outs[1], outs[2]


def blend(
    base: DataFrame,
    overlay: DataFrame,
    mode: str = "src-over",
    opacity: int = 255,
    rgb_bands: tuple[int, int, int] = (1, 2, 3),
) -> DataFrame:
    """Blend `overlay` (single gray band) onto `base` (3 RGB bands) on
    the same block grid. One hash exchange on the block key; numpy
    kernel per block; output 3 uint8 bands, dataset suffixed _blend."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    b = base.where(F.col("band").isin(list(rgb_bands))).withColumn(
        "role", F.lit("base")
    )
    o = overlay.withColumn("role", F.lit("over"))
    both = b.unionByName(o)
    r_i, g_i, b_i = rgb_bands
    cols = [c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")]

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        byrole: dict[tuple[str, int], np.ndarray] = {}
        for r in pdf.itertuples():
            byrole[(r.role, int(r.band))] = model.decode(
                (r.buf, r.height, r.width, r.dtype)
            ).astype(np.int32)
        need = [("base", r_i), ("base", g_i), ("base", b_i)]
        over_keys = [k for k in byrole if k[0] == "over"]
        if any(k not in byrole for k in need) or len(over_keys) != 1:
            return pd.DataFrame(columns=cols)
        R, G, B = (byrole[k] for k in need)
        gray = byrole[over_keys[0]]
        ro, go, bo = _blend_rgb(mode, int(opacity), R, G, B, gray)
        r0 = pdf[pdf.role == "base"].iloc[0]
        rows = []
        for band, arr in zip((1, 2, 3), (ro, go, bo)):
            rows.append(
                (
                    str(r0.dataset) + "_blend",
                    band,
                    int(r0.bx),
                    int(r0.by),
                    int(r0.x0),
                    int(r0.y0),
                    int(r0.width),
                    int(r0.height),
                    "uint8",
                    r0.gt0,
                    r0.gt1,
                    r0.gt2,
                    r0.gt3,
                    r0.gt4,
                    r0.gt5,
                    None,
                    np.ascontiguousarray(arr.astype(np.uint8)).tobytes(),
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return both.groupBy("bx", "by").applyInPandas(fn, model.BLOCK_SCHEMA)
