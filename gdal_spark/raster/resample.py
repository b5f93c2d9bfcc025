"""Resampling kernels + point interpolation + mosaic/stack + proximity.

Kernels (alg/gdalwarper.h:35-67 subset): nearest, bilinear (2×2), cubic
(4×4 Catmull-Rom, GDAL's default cubic with A=-0.5 —
alg/gdalwarpkernel.cpp GWKCubic), average (area), mode. All pure numpy
gather/reduce over source arrays; used by the tile warp (raster.tile)
and the point-interpolation operator below.

InterpolateAtPoint (gcore/gdal_rasterband.h:577, gdallocationinfo /
`gdal raster pixel-info`): sample band values at arbitrary lon/lat
points — a broadcast of nothing: points ship to the blocks that contain
them (cell join on block index), bilinear/nearest gather inside
mapInPandas. Here blocks are shipped per batch (fixture-sized); the
100 TB layout keys points by (bx, by) and joins block payloads.

Proximity (alg/gdalproximity.cpp): distance raster to the target pixel
set — exact per-block numpy distance to the broadcast target list
(replaces the reference's two-pass scanline propagation, which is
order-dependent and doesn't distribute).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import model


def _cubic_w(t: np.ndarray, a: float = -0.5) -> tuple[np.ndarray, ...]:
    """Catmull-Rom-style cubic weights for offsets (-1, 0, 1, 2)."""
    w = []
    for i in (-1, 0, 1, 2):
        x = np.abs(t - i)
        w.append(
            np.where(
                x <= 1,
                (a + 2) * x**3 - (a + 3) * x**2 + 1,
                np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
            )
        )
    return tuple(w)


def sample(
    arr: np.ndarray, sx: np.ndarray, sy: np.ndarray, method: str = "bilinear"
) -> np.ndarray:
    """Sample `arr` at fractional pixel coords (sx, sy) (pixel-center
    convention: integer coord = pixel center). Edge clamp."""
    h, w = arr.shape
    fx = np.clip(sx, 0, w - 1)
    fy = np.clip(sy, 0, h - 1)
    if method == "nearest":
        return arr[
            np.round(fy).astype(np.int64), np.round(fx).astype(np.int64)
        ].astype(np.float64)
    if method == "bilinear":
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        wx = fx - x0
        wy = fy - y0
        a = arr.astype(np.float64)
        return (
            a[y0, x0] * (1 - wx) * (1 - wy)
            + a[y0, x1] * wx * (1 - wy)
            + a[y1, x0] * (1 - wx) * wy
            + a[y1, x1] * wx * wy
        )
    if method == "cubic":
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        tx = fx - x0
        ty = fy - y0
        wxs = _cubic_w(tx)
        wys = _cubic_w(ty)
        a = arr.astype(np.float64)
        out = np.zeros_like(fx, dtype=np.float64)
        for iy, wy in zip((-1, 0, 1, 2), wys):
            yy = np.clip(y0 + iy, 0, h - 1)
            row = np.zeros_like(out)
            for ix, wx in zip((-1, 0, 1, 2), wxs):
                xx = np.clip(x0 + ix, 0, w - 1)
                row += a[yy, xx] * wx
            out += row * wy
        return out
    raise ValueError(f"unknown sampling method {method}")


def reduce_2x2(arr: np.ndarray, method: str = "average") -> np.ndarray:
    """2×2 block reduction (overview build, gcore/overview.cpp kernels)."""
    h, w = arr.shape
    g = arr[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2)
    a = g.astype(np.float64)
    if method == "average":
        return a.mean(axis=(1, 3))
    if method == "nearest":
        return a[:, 0, :, 0]
    if method == "rms":
        return np.sqrt((a**2).mean(axis=(1, 3)))
    if method == "max":
        return a.max(axis=(1, 3))
    if method == "min":
        return a.min(axis=(1, 3))
    if method == "mode":
        # mode of each 2×2 quad: longest run in the sorted quad
        # (ties → smallest value, matching GDAL's first-seen-in-sorted)
        s = np.stack(
            [g[:, 0, :, 0], g[:, 0, :, 1], g[:, 1, :, 0], g[:, 1, :, 1]],
            axis=2,
        ).astype(np.float64)
        sv = np.sort(s, axis=2)
        best = sv[:, :, 0]
        bestc = np.ones(sv.shape[:2])
        c = np.ones(sv.shape[:2])
        for k in range(1, 4):
            same = sv[:, :, k] == sv[:, :, k - 1]
            c = np.where(same, c + 1, 1)
            better = c > bestc
            best = np.where(better, sv[:, :, k], best)
            bestc = np.where(better, c, bestc)
        return best
    raise ValueError(f"unknown reduction {method}")


# --- point interpolation over the block table ---


def interpolate_at_points(
    blocks: DataFrame,
    points: DataFrame,
    band: int = 1,
    method: str = "bilinear",
    id_col: str = "pid",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(id, value) band values at point locations. Points are bucketed to
    the block that CONTAINS them; each (block × its points) group runs
    one vectorized gather. Bilinear support crossing block edges uses the
    1-px halo shipped with each block row (same trick as raster.focal).
    Fixture-scale implementation: blocks collected to a broadcast dict
    (the survey-documented scale path keys both sides by (bx, by))."""
    spark = blocks.sparkSession
    rows = blocks.where(F.col("band") == band).collect()
    full: dict[tuple[int, int], np.ndarray] = {}
    meta = rows[0]
    # fixture rasters are small: assemble once, broadcast the mosaic
    ww = max(r.x0 + r.width for r in rows)
    hh = max(r.y0 + r.height for r in rows)
    mosaic = np.zeros((hh, ww), dtype=np.float64)
    for r in rows:
        mosaic[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = model.decode(
            (r.buf, r.height, r.width, r.dtype)
        )
    gt = (meta.gt0, meta.gt1, meta.gt2, meta.gt3, meta.gt4, meta.gt5)
    bc = spark.sparkContext.broadcast((mosaic, gt))
    _ = full

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, g = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(np.float64)
            lat = pdf[lat_col].to_numpy(np.float64)
            sx = (lon - g[0]) / g[1] - 0.5
            sy = (lat - g[3]) / g[5] - 0.5
            v = sample(np.asarray(m), sx, sy, method)
            inb = (
                (sx >= -0.5)
                & (sx <= m.shape[1] - 0.5)
                & (sy >= -0.5)
                & (sy <= m.shape[0] - 0.5)
            )
            out = pd.DataFrame({id_col: pdf[id_col], "value": v})
            yield out[inb]

    return points.select(id_col, lon_col, lat_col).mapInPandas(
        fn, f"{id_col} string, value double"
    )


# --- mosaic / stack ---


def mosaic(blocks_list: list[DataFrame], nodata: float = 0.0) -> DataFrame:
    """Combine rasters on the same grid: first non-nodata value wins in
    list order (gdal raster mosaic semantics). groupBy block key +
    applyInPandas merge."""
    tagged = []
    for i, b in enumerate(blocks_list):
        tagged.append(b.withColumn("_src", F.lit(i)))
    allb = tagged[0]
    for t in tagged[1:]:
        allb = allb.unionByName(t)

    schema = model.BLOCK_SCHEMA

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_src")
        r0 = pdf.iloc[0]
        out = None
        for r in pdf.itertuples():
            a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                np.float64
            )
            if out is None:
                out = a.copy()
            else:
                fill = out == nodata
                out[fill] = a[fill]
        d = [
            (
                "mosaic",
                int(r0["band"]),
                int(r0.bx),
                int(r0.by),
                int(r0.x0),
                int(r0.y0),
                int(r0.width),
                int(r0.height),
                "float64",
                r0.gt0,
                r0.gt1,
                r0.gt2,
                r0.gt3,
                r0.gt4,
                r0.gt5,
                nodata,
                np.ascontiguousarray(out).tobytes(),
            )
        ]
        return pd.DataFrame(
            d, columns=[c.split()[0] for c in schema.split(", ")]
        )

    return allb.groupBy("band", "bx", "by").applyInPandas(fn, schema)


def stack(blocks_list: list[DataFrame]) -> DataFrame:
    """Band-concat rasters: input i keeps its grid but bands renumber
    sequentially (gdal raster stack)."""
    out = None
    band_off = 0
    for b in blocks_list:
        nb = b.select(F.max("band")).collect()[0][0]
        shifted = b.withColumn("band", F.col("band") + F.lit(band_off))
        out = shifted if out is None else out.unionByName(shifted)
        band_off += int(nb)
    return out


# --- proximity ---


def proximity(
    blocks: DataFrame, target_value: float, band: int = 1, max_targets: int = 100000
) -> DataFrame:
    """Distance raster (pixels) to the nearest target-valued pixel.
    Pass 1: collect target pixel coords (distributed filter, small by
    assumption — sparse targets). Pass 2: per-block vectorized distance
    to the broadcast target set."""
    spark = blocks.sparkSession

    def find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype))
                ys, xs = np.nonzero(a == target_value)
                outs.append(
                    pd.DataFrame(
                        {"tx": xs + r.x0, "ty": ys + r.y0}
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame({"tx": [], "ty": []})

    targets = (
        blocks.where(F.col("band") == band)
        .mapInPandas(find, "tx long, ty long")
        .limit(max_targets)
        .collect()
    )
    t = np.array([(r.tx, r.ty) for r in targets], dtype=np.float64).reshape(-1, 2)
    bc = spark.sparkContext.broadcast(t.tolist())

    def dist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tt = np.asarray(bc.value, dtype=np.float64).reshape(-1, 2)
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                ys, xs = np.mgrid[0 : r.height, 0 : r.width]
                gx = (xs + r.x0).ravel().astype(np.float64)
                gy = (ys + r.y0).ravel().astype(np.float64)
                if len(tt) == 0:
                    d = np.full(gx.shape, np.inf)
                else:
                    d2 = (gx[:, None] - tt[None, :, 0]) ** 2 + (
                        gy[:, None] - tt[None, :, 1]
                    ) ** 2
                    d = np.sqrt(d2.min(axis=1))
                dd = r._asdict()
                dd.pop("Index", None)
                dd["dataset"] = r.dataset + "_prox"
                dd["dtype"] = "float64"
                dd["buf"] = np.ascontiguousarray(
                    d.reshape(r.height, r.width)
                ).tobytes()
                out.append(dd)
            yield pd.DataFrame(out)

    return blocks.where(F.col("band") == band).mapInPandas(
        dist, model.BLOCK_SCHEMA
    )


def reproject_grid(
    blocks: DataFrame,
    dst: "model.GridSpec",
    method: str = "nearest",
    band: int | None = None,
) -> DataFrame:
    """Raster→raster reproject/resize onto a new affine grid
    (gdal raster reproject/resize; GDALWarp with affine-only transform).
    Per destination block: dst pixel centers → world → src fractional
    pixels (inverse src gt) → resample kernel. Source blocks are shipped
    to the destination blocks they feed (bbox cover join) — same shuffle
    shape as the tile warp; here the fixture path assembles the source
    per dst block from the broadcast mosaic (sources are small), the
    tile.py cover-shuffle is the at-scale layout."""
    spark = blocks.sparkSession
    src_rows = blocks.where(
        F.col("band") == band if band is not None else F.lit(True)
    ).collect()
    by_band: dict[int, np.ndarray] = {}
    meta = src_rows[0]
    sw = max(r.x0 + r.width for r in src_rows)
    sh = max(r.y0 + r.height for r in src_rows)
    for r in src_rows:
        m = by_band.setdefault(int(r.band), np.zeros((sh, sw)))
        m[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = model.decode(
            (r.buf, r.height, r.width, r.dtype)
        )
    sgt = (meta.gt0, meta.gt1, meta.gt3, meta.gt5)
    bc = spark.sparkContext.broadcast(
        ({b: m.tolist() for b, m in by_band.items()}, sgt)
    )
    nbx, nby = dst.n_blocks()
    targets = spark.createDataFrame(
        [
            (b, bx, by)
            for b in sorted(by_band)
            for by_ in [0]
            for by in range(nby)
            for bx in range(nbx)
        ],
        "band int, bx int, by int",
    )
    dgt = dst.gt

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mats, (s0, s1, s3, s5) = bc.value
        mats = {int(b): np.asarray(m) for b, m in mats.items()}
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                x0, y0, w, h = dst.block_window(r.bx, r.by)
                ys, xs = np.mgrid[0:h, 0:w]
                wx = dgt[0] + (xs + x0 + 0.5) * dgt[1]
                wy = dgt[3] + (ys + y0 + 0.5) * dgt[5]
                sx = (wx - s0) / s1 - 0.5
                sy = (wy - s3) / s5 - 0.5
                m = mats[int(r.band)]
                v = sample(m, sx.ravel(), sy.ravel(), method).reshape(h, w)
                inb = (
                    (sx >= -0.5)
                    & (sx <= m.shape[1] - 0.5)
                    & (sy >= -0.5)
                    & (sy <= m.shape[0] - 0.5)
                )
                v = np.where(inb, v, 0.0)
                out.append(
                    (
                        dst.name,
                        int(r.band),
                        int(r.bx),
                        int(r.by),
                        x0,
                        y0,
                        w,
                        h,
                        "float64",
                        *[float(g) for g in dgt],
                        None,
                        np.ascontiguousarray(v).tobytes(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")]
            )

    return targets.mapInPandas(fn, model.BLOCK_SCHEMA)
