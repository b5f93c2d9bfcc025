"""RGB → paletted raster (rgb-to-palette pipeline step).

Reference surface: GDALComputeMedianCutPCT (alg/gdalmediancut.cpp —
Heckbert 1982 median-cut over a 5-bit/channel histogram) +
GDALDitherRGB2PCT (alg/gdaldither.cpp — Floyd-Steinberg error
diffusion against the nearest palette color), driven by
apps/gdalalg_raster_rgb_to_palette.cpp. Re-expressed Spark-first, from
the published algorithms (Heckbert '82, Floyd-Steinberg '76), not the
reference code:

- Palette training: the 3 band blocks map to (r5, g5, b5, count)
  partial histograms (map-side, ≤ 32³ rows per partition), one groupBy
  sum gives the global histogram — bounded metadata (≤ 32768 rows) —
  and the median cut runs driver-side on that histogram only. No pixel
  ever visits the driver; scale-independent.
- Application: ONE groupBy(block) applyInPandas zips the 3 bands and
  emits a single uint8 index band. Nearest-color is a vectorized
  argmin over the palette; Floyd-Steinberg runs per block (errors
  reset at block seams — the documented parallel trade-off; the
  reference's global scanline serpentine is inherently sequential).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import model

_HBITS = 5  # histogram quantization, alg/gdalmediancut.cpp default


def rgb_histogram(
    blocks: DataFrame, rgb_bands: tuple[int, int, int] = (1, 2, 3)
) -> DataFrame:
    """(r5, g5, b5, cnt) 5-bit/channel color histogram — map-side
    partial aggregation, one shuffle of ≤ 32³ rows per partition."""
    rb, gb, bb = rgb_bands
    schema = "r5 int, g5 int, b5 int, cnt long"

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        byband = {
            int(r.band): model.decode((r.buf, r.height, r.width, r.dtype))
            for r in pdf.itertuples()
        }
        if not all(b in byband for b in (rb, gb, bb)):
            return pd.DataFrame(columns=["r5", "g5", "b5", "cnt"])
        q = [
            (np.clip(byband[b], 0, 255).astype(np.int64) >> (8 - _HBITS))
            for b in (rb, gb, bb)
        ]
        code = (q[0] << (2 * _HBITS)) | (q[1] << _HBITS) | q[2]
        vals, cnts = np.unique(code.ravel(), return_counts=True)
        m = 2**_HBITS - 1
        return pd.DataFrame(
            {
                "r5": (vals >> (2 * _HBITS)) & m,
                "g5": (vals >> _HBITS) & m,
                "b5": vals & m,
                "cnt": cnts,
            }
        )

    # keyed by block so the 3 band rows are guaranteed co-grouped (an
    # Arrow batch boundary can split a block's bands in mapInPandas)
    part = (
        blocks.where(F.col("band").isin(list(rgb_bands)))
        .groupBy("bx", "by")
        .applyInPandas(fn, schema)
    )
    return part.groupBy("r5", "g5", "b5").agg(F.sum("cnt").alias("cnt"))


def median_cut(hist: list[tuple[int, int, int, int]], n_colors: int) -> np.ndarray:
    """Heckbert median cut over the quantized histogram → (n, 3) uint8
    palette. Deterministic: boxes split largest-count-first, along the
    longest axis, at the count median; palette entry = count-weighted
    mean color. Runs on the ≤ 32768-row histogram only."""
    cells = np.array(
        [(r, g, b, c) for r, g, b, c in hist], dtype=np.int64
    ).reshape(-1, 4)
    boxes = [cells]

    def rank(box):  # split priority: population
        return int(box[:, 3].sum())

    while len(boxes) < n_colors:
        boxes.sort(key=rank, reverse=True)
        box = None
        for i, b in enumerate(boxes):
            spans = b[:, :3].max(axis=0) - b[:, :3].min(axis=0)
            if len(b) > 1 and spans.max() > 0:
                box = boxes.pop(i)
                break
        if box is None:
            break  # fewer distinct colors than requested
        spans = box[:, :3].max(axis=0) - box[:, :3].min(axis=0)
        ax = int(np.argmax(spans))
        order = np.lexsort((box[:, 2], box[:, 1], box[:, 0], box[:, ax]))
        box = box[order]
        cum = np.cumsum(box[:, 3])
        half = cum[-1] / 2.0
        cut = int(np.searchsorted(cum, half)) + 1
        cut = min(max(cut, 1), len(box) - 1)
        boxes.append(box[:cut])
        boxes.append(box[cut:])
    pal = []
    scale = 255.0 / (2**_HBITS - 1)
    for b in boxes:
        w = b[:, 3].astype(np.float64)
        mean = (b[:, :3].astype(np.float64) * w[:, None]).sum(0) / w.sum()
        pal.append(np.round(mean * scale))
    pal = np.clip(np.array(pal, dtype=np.float64), 0, 255).astype(np.uint8)
    # deterministic order: by luminance then channels
    key = pal[:, 0] * 299 + pal[:, 1] * 587 + pal[:, 2] * 114
    order = np.lexsort((pal[:, 2], pal[:, 1], pal[:, 0], key))
    return pal[order]


def compute_median_cut_palette(
    blocks: DataFrame,
    n_colors: int = 256,
    rgb_bands: tuple[int, int, int] = (1, 2, 3),
) -> np.ndarray:
    """GDALComputeMedianCutPCT role: distributed histogram + driver-side
    median cut (bounded metadata)."""
    rows = rgb_histogram(blocks, rgb_bands).collect()  # bounded-metadata: <=32768-cell color histogram
    hist = [(r.r5, r.g5, r.b5, r.cnt) for r in rows]
    return median_cut(hist, n_colors)


def _nearest_idx(r, g, b, pal_f):
    d = (
        (r[..., None] - pal_f[:, 0]) ** 2
        + (g[..., None] - pal_f[:, 1]) ** 2
        + (b[..., None] - pal_f[:, 2]) ** 2
    )
    return np.argmin(d, axis=-1)  # ties → lowest palette index


def floyd_steinberg(
    rgb: np.ndarray, palette: np.ndarray
) -> np.ndarray:
    """Classic Floyd-Steinberg error diffusion (7/16 right, 3/16
    down-left, 5/16 down, 1/16 down-right), numpy rows with a python
    loop over scanlines only."""
    h, w, _ = rgb.shape
    work = rgb.astype(np.float64).copy()
    out = np.zeros((h, w), dtype=np.uint8)
    pal_f = palette.astype(np.float64)
    for y in range(h):
        for x in range(w):
            px = np.clip(work[y, x], 0, 255)
            idx = int(
                np.argmin(((pal_f - px) ** 2).sum(axis=1))
            )
            out[y, x] = idx
            err = px - pal_f[idx]
            if x + 1 < w:
                work[y, x + 1] += err * (7 / 16)
            if y + 1 < h:
                if x > 0:
                    work[y + 1, x - 1] += err * (3 / 16)
                work[y + 1, x] += err * (5 / 16)
                if x + 1 < w:
                    work[y + 1, x + 1] += err * (1 / 16)
    return out


def rgb_to_palette(
    blocks: DataFrame,
    palette: np.ndarray,
    rgb_bands: tuple[int, int, int] = (1, 2, 3),
    dither: bool = False,
) -> DataFrame:
    """Apply a palette to a 3-band raster → single uint8 index band
    (GDALDitherRGB2PCT role). dither=False → vectorized nearest color;
    dither=True → per-block Floyd-Steinberg (seam-reset trade-off
    documented in the module docstring)."""
    rb, gb, bb = rgb_bands
    spark = blocks.sparkSession
    bc = spark.sparkContext.broadcast(palette.tolist())
    schema = model.BLOCK_SCHEMA

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pal = np.asarray(bc.value, dtype=np.uint8)
        byband = {
            int(r.band): model.decode((r.buf, r.height, r.width, r.dtype))
            for r in pdf.itertuples()
        }
        cols = [c.split()[0] for c in schema.split(", ")]
        if not all(b in byband for b in (rb, gb, bb)):
            return pd.DataFrame(columns=cols)
        r = np.clip(byband[rb], 0, 255).astype(np.float64)
        g = np.clip(byband[gb], 0, 255).astype(np.float64)
        b = np.clip(byband[bb], 0, 255).astype(np.float64)
        if dither:
            out = floyd_steinberg(np.stack([r, g, b], axis=-1), pal)
        else:
            out = _nearest_idx(r, g, b, pal.astype(np.float64)).astype(
                np.uint8
            )
        r0 = pdf.iloc[0]
        row = (
            str(r0.dataset) + "_pct",
            1,
            int(r0.bx),
            int(r0.by),
            int(r0.x0),
            int(r0.y0),
            int(out.shape[1]),
            int(out.shape[0]),
            "uint8",
            r0.gt0,
            r0.gt1,
            r0.gt2,
            r0.gt3,
            r0.gt4,
            r0.gt5,
            None,
            np.ascontiguousarray(out).tobytes(),
        )
        return pd.DataFrame([row], columns=cols)

    return (
        blocks.where(F.col("band").isin(list(rgb_bands)))
        .groupBy("bx", "by")
        .applyInPandas(fn, schema)
    )
