"""Focal (neighborhood) raster operators via block halo exchange.

The reference computes N×N focal stats and 3×3 DEM derivatives with
scanline buffers (apps/gdalalg_raster_neighbors.cpp:206-224,
apps/gdaldem_lib.cpp Horn kernels). Distributed re-expression:

1. HALO EXCHANGE — every block emits its payload to itself and a
   1-pixel-wide strip to each of its 8 neighbors, keyed by the receiving
   block id. One shuffle, strip rows are ~2/blocksize of the data.
2. ASSEMBLE + STENCIL — applyInPandas per receiving block pads the
   array with neighbor strips (edge replicate at raster borders, like
   GDAL's edge handling) and runs the numpy stencil.

This is the general halo pattern for any kernel radius r (strips of
width r); radius 1 here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import model

_HALO_SCHEMA = (
    "dataset string, band int, tbx int, tby int, dx int, dy int, "
    "x0 int, y0 int, width int, height int, dtype string, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, gt5 double, "
    "nodata double, buf binary"
)


def _halo_emit(blocks: DataFrame) -> DataFrame:
    """Emit (target block, offset dx/dy, strip) rows."""

    def fn(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype))
                strips = {
                    (0, 0): a,
                    (-1, 0): a[:, :1],
                    (1, 0): a[:, -1:],
                    (0, -1): a[:1, :],
                    (0, 1): a[-1:, :],
                    (-1, -1): a[:1, :1],
                    (1, -1): a[:1, -1:],
                    (-1, 1): a[-1:, :1],
                    (1, 1): a[-1:, -1:],
                }
                for (dx, dy), s in strips.items():
                    out.append(
                        (
                            r.dataset,
                            r.band,
                            r.bx + dx,
                            r.by + dy,
                            dx,
                            dy,
                            r.x0,
                            r.y0,
                            s.shape[1],
                            s.shape[0],
                            r.dtype,
                            r.gt0,
                            r.gt1,
                            r.gt2,
                            r.gt3,
                            r.gt4,
                            r.gt5,
                            r.nodata,
                            np.ascontiguousarray(s).tobytes(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in _HALO_SCHEMA.split(", ")]
            )

    return blocks.mapInPandas(fn, _HALO_SCHEMA)


def _assemble(pdf: pd.DataFrame) -> tuple[np.ndarray, pd.Series] | None:
    """Padded (h+2, w+2) array from self + neighbor strips; edge
    replicate where a neighbor is absent (raster border)."""
    self_rows = pdf[(pdf.dx == 0) & (pdf.dy == 0)]
    if len(self_rows) == 0:
        return None  # strip sent past the raster edge
    c = self_rows.iloc[0]
    # NB: c["dtype"] — attribute access would hit pandas Series.dtype
    a = model.decode((c.buf, c.height, c.width, c["dtype"])).astype(np.float64)
    h, w = a.shape
    pad = np.empty((h + 2, w + 2), dtype=np.float64)
    pad[1:-1, 1:-1] = a
    # replicate defaults
    pad[0, 1:-1] = a[0]
    pad[-1, 1:-1] = a[-1]
    pad[1:-1, 0] = a[:, 0]
    pad[1:-1, -1] = a[:, -1]
    pad[0, 0], pad[0, -1], pad[-1, 0], pad[-1, -1] = (
        a[0, 0],
        a[0, -1],
        a[-1, 0],
        a[-1, -1],
    )
    received: set[tuple[int, int]] = set()
    for r in pdf.itertuples():
        if r.dx == 0 and r.dy == 0:
            continue
        received.add((int(r.dx), int(r.dy)))
        s = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
            np.float64
        )  # itertuples namedtuple: .dtype is the column here
        # a strip from neighbor (dx,dy) lands on the OPPOSITE padded edge
        if (r.dx, r.dy) == (1, 0):
            pad[1:-1, 0] = s[:, 0] if s.shape[0] == h else pad[1:-1, 0]
        elif (r.dx, r.dy) == (-1, 0):
            pad[1:-1, -1] = s[:, 0] if s.shape[0] == h else pad[1:-1, -1]
        elif (r.dx, r.dy) == (0, 1):
            pad[0, 1:-1] = s[0] if s.shape[1] == w else pad[0, 1:-1]
        elif (r.dx, r.dy) == (0, -1):
            pad[-1, 1:-1] = s[0] if s.shape[1] == w else pad[-1, 1:-1]
        elif (r.dx, r.dy) == (1, 1):
            pad[0, 0] = s[0, 0]
        elif (r.dx, r.dy) == (-1, 1):
            pad[0, -1] = s[0, 0]
        elif (r.dx, r.dy) == (1, -1):
            pad[-1, 0] = s[0, 0]
        elif (r.dx, r.dy) == (-1, -1):
            pad[-1, -1] = s[0, 0]
    # corner fix-up at raster borders: when the DIAGONAL neighbor is
    # absent but a side neighbor exists, edge-replicate semantics clamp
    # toward the side neighbor's strip, not toward this block's corner
    # (e.g. pixel (0, 32) at the raster top needs the left neighbor's
    # top pixel at (-1, 31), which clamps to (0, 31) = pad[1, 0])
    if (1, 1) not in received:
        if (0, 1) in received:
            pad[0, 0] = pad[0, 1]
        elif (1, 0) in received:
            pad[0, 0] = pad[1, 0]
    if (-1, 1) not in received:
        if (0, 1) in received:
            pad[0, -1] = pad[0, -2]
        elif (-1, 0) in received:
            pad[0, -1] = pad[1, -1]
    if (1, -1) not in received:
        if (0, -1) in received:
            pad[-1, 0] = pad[-1, 1]
        elif (1, 0) in received:
            pad[-1, 0] = pad[-2, 0]
    if (-1, -1) not in received:
        if (0, -1) in received:
            pad[-1, -1] = pad[-1, -2]
        elif (-1, 0) in received:
            pad[-1, -1] = pad[-2, -1]
    return pad, c


def _w(pad: np.ndarray):
    """The 9 shifted views a..i (GDAL window naming, gdaldem_lib.cpp):
    a b c / d e f / g h i."""
    return {
        "a": pad[:-2, :-2],
        "b": pad[:-2, 1:-1],
        "c": pad[:-2, 2:],
        "d": pad[1:-1, :-2],
        "e": pad[1:-1, 1:-1],
        "f": pad[1:-1, 2:],
        "g": pad[2:, :-2],
        "h": pad[2:, 1:-1],
        "i": pad[2:, 2:],
    }


def _horn_derivs(pad, ew, ns):
    w = _w(pad)
    dzdx = ((w["c"] + 2 * w["f"] + w["i"]) - (w["a"] + 2 * w["d"] + w["g"])) / (
        8.0 * ew
    )
    dzdy = ((w["g"] + 2 * w["h"] + w["i"]) - (w["a"] + 2 * w["b"] + w["c"])) / (
        8.0 * ns
    )
    return dzdx, dzdy


def _kernel_out(op: str, pad: np.ndarray, c) -> np.ndarray:
    ew = abs(c.gt1)
    ns = abs(c.gt5)
    if op == "fillnodata":
        # rasterfill analog (alg/rasterfill.cpp): nodata pixels take the
        # mean of their valid 3x3 neighbors (one ring; iterate the
        # operator for larger gaps)
        nd = c.nodata
        if nd is None or pd.isna(nd):
            return pad[1:-1, 1:-1].copy()
        stack = np.stack(list(_w(pad).values()))
        valid = stack != nd
        cnt = valid.sum(0)
        ssum = np.where(valid, stack, 0.0).sum(0)
        center = pad[1:-1, 1:-1]
        fill = np.where(cnt > 0, ssum / np.maximum(cnt, 1), nd)
        return np.where(center == nd, fill, center)
    if op in ("mean", "sum", "min", "max", "stddev", "median"):
        stack = np.stack(list(_w(pad).values()))
        return {
            "mean": stack.mean(0),
            "sum": stack.sum(0),
            "min": stack.min(0),
            "max": stack.max(0),
            "stddev": stack.std(0),
            "median": np.median(stack, 0),
        }[op]
    if op == "tri_riley":
        # gdaldem TRI default (apps/gdaldem_lib.cpp:2332, Riley et al.
        # 1999): sqrt of the summed squared center-neighbor differences
        # (our plain "tri" is the Wilson -alg variant, :2317)
        w = _w(pad)
        return np.sqrt(
            sum((w[k] - w["e"]) ** 2 for k in "abcdfghi")
        )
    if op in ("slope_zt", "aspect_zt", "hillshade_zt"):
        # Zevenbergen-Thorne gradient (-alg ZevenbergenThorne,
        # apps/gdaldem_lib.cpp:1390,1482): central differences over 2
        # pixels instead of the Horn 3x3 weighting; same output
        # conventions as the Horn slope/aspect ops
        w = _w(pad)
        ztx = (w["f"] - w["d"]) / (2.0 * ew)
        zty = (w["h"] - w["b"]) / (2.0 * ns)
        if op == "slope_zt":
            return np.degrees(np.arctan(np.hypot(ztx, zty)))
        if op == "hillshade_zt":
            azr = np.radians(360.0 - 315.0 + 90.0)
            altr = np.radians(45.0)
            slope = np.arctan(np.hypot(ztx, zty))
            aspect = np.arctan2(zty, -ztx)
            shade = np.sin(altr) * np.cos(slope) + np.cos(altr) * np.sin(
                slope
            ) * np.cos(azr - aspect)
            return np.clip(1.0 + 254.0 * shade, 1.0, 255.0)
        az = np.degrees(np.arctan2(zty, -ztx))
        az = 90.0 - az
        az = np.where(az < 0, az + 360.0, az)
        az = np.where(az >= 360.0, az - 360.0, az)
        return az
    if op in ("aspect_trig", "aspect_az_zero_flat"):
        # gdaldem aspect flag matrix (apps/gdaldem_lib.cpp:1428-1517):
        # computed from the UNNORMALIZED window sums (dx east-minus-west,
        # dy south-minus-north), flat pixels (dx == dy == 0) emit 0
        # (-zero_for_flat; the block model carries no nodata), exact
        # 360 wraps to 0
        w = _w(pad)
        dx = (w["c"] + 2 * w["f"] + w["i"]) - (w["a"] + 2 * w["d"] + w["g"])
        dy = (w["g"] + 2 * w["h"] + w["i"]) - (w["a"] + 2 * w["b"] + w["c"])
        asp = np.degrees(np.arctan2(dy, -dx))
        flat = (dx == 0) & (dy == 0)
        if op == "aspect_trig":  # -trigonometric: 0 = east, CCW
            asp = np.where(asp < 0, asp + 360.0, asp)
        else:  # default azimuth mode: 0 = north, clockwise
            asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
        asp = np.where(asp == 360.0, 0.0, asp)
        return np.where(flat, 0.0, asp)
    dzdx, dzdy = _horn_derivs(pad, ew, ns)
    if op == "slope":  # degrees (gdaldem slope, Horn; gdaldem_lib.cpp:860)
        return np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
    if op == "slope_percent":
        # gdaldem slope -p (percent instead of degrees): 100*tan(slope)
        return 100.0 * np.hypot(dzdx, dzdy)
    if op == "aspect":  # azimuth degrees from north, clockwise
        az = np.degrees(np.arctan2(dzdy, -dzdx))
        az = 90.0 - az
        az = np.where(az < 0, az + 360.0, az)
        az = np.where(az >= 360.0, az - 360.0, az)
        return az
    if op == "hillshade":  # default az=315 alt=45
        azr = np.radians(360.0 - 315.0 + 90.0)
        altr = np.radians(45.0)
        slope = np.arctan(np.hypot(dzdx, dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        shade = np.sin(altr) * np.cos(slope) + np.cos(altr) * np.sin(
            slope
        ) * np.cos(azr - aspect)
        return np.clip(1.0 + 254.0 * shade, 1.0, 255.0)
    if op in (
        "hillshade_multidirectional", "hillshade_combined", "hillshade_igor"
    ):
        # gdaldem hillshade variant modes (apps/gdaldem_lib.cpp:947
        # Igor, :1151 combined, :1255 multidirectional) — GDAL's SIGNED
        # resolution convention (x/gt1, y/gt5), float64 math, z=1,
        # alt=45, az=315 defaults.
        w = _w(pad)
        sum_x = (w["a"] + 2 * w["d"] + w["g"]) - (w["c"] + 2 * w["f"] + w["i"])
        sum_y = (w["g"] + 2 * w["h"] + w["i"]) - (w["a"] + 2 * w["b"] + w["c"])
        gx = sum_x / (8.0 * c.gt1)
        gy = sum_y / (8.0 * c.gt5)
        sin_alt = np.sin(np.radians(45.0))
        cos_alt = np.cos(np.radians(45.0))
        xx_yy = gx * gx + gy * gy
        if op == "hillshade_multidirectional":
            # USGS OF 92-422: per-azimuth shades weighted by
            # sin^2(aspect - az); zero-gradient pixels shade flat
            c225 = np.cos(np.radians(225.0))
            v225 = np.maximum(sin_alt + (gx - gy) * c225 * cos_alt, 0.0)
            v270 = np.maximum(sin_alt - gx * cos_alt, 0.0)
            v315 = np.maximum(sin_alt + (gx + gy) * c225 * cos_alt, 0.0)
            v360 = np.maximum(sin_alt - gy * cos_alt, 0.0)
            w225 = 0.5 * xx_yy - gx * gy
            w270 = gx * gx
            w315 = xx_yy - w225
            w360 = gy * gy
            num = w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360
            flat = 1.0 + 254.0 * sin_alt
            with np.errstate(invalid="ignore", divide="ignore"):
                out = 1.0 + 127.0 * num / np.where(xx_yy == 0, 1.0, xx_yy) \
                    / np.sqrt(1.0 + xx_yy)
            return np.where(xx_yy == 0.0, flat, out)
        if op == "hillshade_combined":
            azr = np.radians(315.0)
            cang = (
                sin_alt - (gy * np.cos(azr) - gx * np.sin(azr)) * cos_alt
            ) / np.sqrt(1.0 + xx_yy)
            comb = 1.0 - np.arccos(np.clip(cang, -1.0, 1.0)) * np.arctan(
                np.sqrt(xx_yy)
            ) * (4.0 / np.pi**2)
            return np.where(comb <= 0.0, 1.0, 1.0 + 254.0 * comb)
        # igor: shadowness from slope strength x aspect alignment with
        # the anti-light direction; altitude is ignored by design
        slope_strength = np.degrees(np.arctan(np.sqrt(xx_yy))) / 90.0
        # GDAL igor aspect: atan2(dy2, -dx2) with dx2 = (c+2f+i)-(a+2d+g)
        # = -sum_x, so -dx2 = +sum_x; pixel-space, unscaled sums
        aspect = np.arctan2(sum_y, sum_x)
        target = 1.5 * np.pi - np.radians(315.0)
        diff = np.abs(
            np.mod(aspect, 2 * np.pi) - np.mod(target, 2 * np.pi)
        )
        diff = np.where(diff > np.pi, 2 * np.pi - diff, diff)
        aspect_strength = 1.0 - diff / np.pi
        return 255.0 * (1.0 - slope_strength * aspect_strength)
    if op == "tri":  # terrain ruggedness: mean |e - neighbor|
        w = _w(pad)
        return (
            sum(abs(w[k] - w["e"]) for k in "abcdfghi") / 8.0
        )
    if op == "tpi":  # e - mean(neighbors)
        w = _w(pad)
        return w["e"] - sum(w[k] for k in "abcdfghi") / 8.0
    if op == "roughness":  # max - min of window
        stack = np.stack(list(_w(pad).values()))
        return stack.max(0) - stack.min(0)
    raise ValueError(f"unknown focal op {op}")


def focal(blocks: DataFrame, op: str) -> DataFrame:
    """Focal/DEM operator → new block table (float64 payload)."""
    halo = _halo_emit(blocks)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf)
        if asm is None:
            return pd.DataFrame(
                columns=[c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")]
            )
        pad, c = asm
        out = _kernel_out(op, pad, c)
        return pd.DataFrame(
            [
                (
                    str(c.dataset) + "_" + op,
                    int(c.band),
                    int(key[2]),
                    int(key[3]),
                    int(c.x0),
                    int(c.y0),
                    out.shape[1],
                    out.shape[0],
                    "float64",
                    c.gt0,
                    c.gt1,
                    c.gt2,
                    c.gt3,
                    c.gt4,
                    c.gt5,
                    None,
                    np.ascontiguousarray(out).tobytes(),
                )
            ],
            columns=[cc.split()[0] for cc in model.BLOCK_SCHEMA.split(", ")],
        )

    return halo.groupBy("dataset", "band", "tbx", "tby").applyInPandas(
        fn, model.BLOCK_SCHEMA
    )


# --- generic radius-r neighborhood convolution (gdal raster neighbors) ------

#: named kernels, apps/gdalalg_raster_neighbors.cpp:49-77 (Wikipedia
#: image-processing kernels; integer matrices exactly as the reference)
NEIGHBOR_KERNELS: dict[str, list[list[int]]] = {
    "u": [[0, 0, 0], [-1, 0, 1], [0, 0, 0]],
    "v": [[0, -1, 0], [0, 0, 0], [0, 1, 0]],
    "edge1": [[0, -1, 0], [-1, 4, -1], [0, -1, 0]],
    "edge2": [[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
    "sharpen": [[0, -1, 0], [-1, 5, -1], [0, -1, 0]],
    "gaussian-3x3": [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
    "gaussian-5x5": [
        [1, 4, 6, 4, 1],
        [4, 16, 24, 16, 4],
        [6, 24, 36, 24, 6],
        [4, 16, 24, 16, 4],
        [1, 4, 6, 4, 1],
    ],
    "unsharp-masking-5x5": [
        [1, 4, 6, 4, 1],
        [4, 16, 24, 16, 4],
        [6, 24, -476, 24, 6],
        [4, 16, 24, 16, 4],
        [1, 4, 6, 4, 1],
    ],
}


def neighbors(
    blocks: DataFrame,
    kernel: "str | list[list[float]]" = "equal",
    size: int = 3,
    method: str = "mean",
) -> DataFrame:
    """`gdal raster neighbors` (apps/gdalalg_raster_neighbors.cpp:34,
    206-224): arbitrary odd-size neighborhood combine. `kernel` is a
    name from NEIGHBOR_KERNELS, "equal" (all-ones of `size`), or an
    explicit matrix. method "sum" = Σ k·v; "mean" = Σ k·v / Σ k when
    Σ k ≠ 0 (the reference's normalization rule), else the raw sum;
    min/max/median/stddev/mode combine the values whose kernel weight
    is non-zero.

    Generic radius-r halo: every block ships r-wide edge strips to its
    8 neighbors with ABSOLUTE pixel coordinates; the receiver places
    them on a (h+2r, w+2r) canvas and edge-replicates whatever remains
    outside the raster (row-fill then column-fill — exactly clamped
    indexing). ONE shuffle whose payload is ~2r/blocksize of the data;
    the stencil is shifted-view numpy accumulation, never per-pixel
    Python. Requires r ≤ the smallest block dimension (one-ring
    exchange; r ≤ 8 covers every kernel the reference ships)."""
    if isinstance(kernel, str):
        if kernel == "equal":
            K = np.ones((size, size), dtype=np.float64)
        else:
            K = np.array(NEIGHBOR_KERNELS[kernel], dtype=np.float64)
    else:
        K = np.array(kernel, dtype=np.float64)
    if K.shape[0] != K.shape[1] or K.shape[0] % 2 != 1:
        raise ValueError("kernel must be odd square")
    r = K.shape[0] // 2
    if r > 8:
        raise ValueError("kernel radius > 8 exceeds the one-ring halo")

    def emit(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = model.decode((row.buf, row.height, row.width, row.dtype))
                pieces = {
                    (0, 0): (a, row.x0, row.y0),
                    (-1, 0): (a[:, :r], row.x0, row.y0),
                    (1, 0): (a[:, -r:], row.x0 + row.width - r, row.y0),
                    (0, -1): (a[:r, :], row.x0, row.y0),
                    (0, 1): (a[-r:, :], row.x0, row.y0 + row.height - r),
                    (-1, -1): (a[:r, :r], row.x0, row.y0),
                    (1, -1): (a[:r, -r:], row.x0 + row.width - r, row.y0),
                    (-1, 1): (a[-r:, :r], row.x0, row.y0 + row.height - r),
                    (1, 1): (
                        a[-r:, -r:],
                        row.x0 + row.width - r,
                        row.y0 + row.height - r,
                    ),
                }
                for (dx, dy), (s, sx, sy) in pieces.items():
                    out.append(
                        (
                            row.dataset, row.band,
                            row.bx + dx, row.by + dy, dx, dy,
                            sx, sy, s.shape[1], s.shape[0], row.dtype,
                            row.gt0, row.gt1, row.gt2,
                            row.gt3, row.gt4, row.gt5, row.nodata,
                            np.ascontiguousarray(s).tobytes(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in _HALO_SCHEMA.split(", ")]
            )

    halo = blocks.mapInPandas(emit, _HALO_SCHEMA)
    cols = [c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")]
    ksum = float(K.sum())

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        self_rows = pdf[(pdf.dx == 0) & (pdf.dy == 0)]
        if len(self_rows) == 0:
            return pd.DataFrame(columns=cols)
        c = self_rows.iloc[0]
        h, w = int(c.height), int(c.width)
        ox, oy = int(c.x0) - r, int(c.y0) - r
        canvas = np.full((h + 2 * r, w + 2 * r), np.nan)
        for row in pdf.itertuples():
            s = model.decode((row.buf, row.height, row.width, row.dtype))
            px, py = int(row.x0) - ox, int(row.y0) - oy
            sl = s[
                max(0, -py) : s.shape[0], max(0, -px) : s.shape[1]
            ]
            py, px = max(py, 0), max(px, 0)
            canvas[py : py + sl.shape[0], px : px + sl.shape[1]] = sl[
                : canvas.shape[0] - py, : canvas.shape[1] - px
            ]
        # edge replicate = clamped indexing: fill rows, then columns
        for ax in (1, 0):
            idx = np.where(~np.isnan(canvas), 1, 0)
            if idx.all():
                break
            valid = ~np.isnan(canvas)
            if ax == 1:
                for i in range(canvas.shape[0]):
                    v = np.flatnonzero(valid[i])
                    if v.size and v.size < canvas.shape[1]:
                        canvas[i, : v[0]] = canvas[i, v[0]]
                        canvas[i, v[-1] + 1 :] = canvas[i, v[-1]]
            else:
                for j in range(canvas.shape[1]):
                    v = np.flatnonzero(~np.isnan(canvas[:, j]))
                    if v.size and v.size < canvas.shape[0]:
                        canvas[: v[0], j] = canvas[v[0], j]
                        canvas[v[-1] + 1 :, j] = canvas[v[-1], j]
        n = K.shape[0]
        views = [
            (K[i, j], canvas[i : i + h, j : j + w])
            for i in range(n)
            for j in range(n)
        ]
        if method in ("sum", "mean"):
            out = np.zeros((h, w))
            for kw, v in views:
                if kw != 0.0:
                    out = out + kw * v
            if method == "mean" and ksum != 0.0:
                out = out / ksum
        else:
            stackv = np.stack([v for kw, v in views if kw != 0.0], axis=0)
            if method == "min":
                out = stackv.min(axis=0)
            elif method == "max":
                out = stackv.max(axis=0)
            elif method == "median":
                out = np.median(stackv, axis=0)
            elif method == "stddev":
                out = stackv.std(axis=0)
            elif method == "mode":
                sv = np.sort(stackv, axis=0)
                best = sv[0]
                bestc = np.ones(best.shape)
                cnt = np.ones(best.shape)
                for k in range(1, sv.shape[0]):
                    same = sv[k] == sv[k - 1]
                    cnt = np.where(same, cnt + 1, 1)
                    better = cnt > bestc
                    best = np.where(better, sv[k], best)
                    bestc = np.where(better, cnt, bestc)
                out = best
            else:
                raise ValueError(f"unknown method {method}")
        return pd.DataFrame(
            [
                (
                    str(c.dataset) + "_nb", int(c.band),
                    int(key[2]), int(key[3]),
                    int(c.x0), int(c.y0), w, h, "float64",
                    c.gt0, c.gt1, c.gt2, c.gt3, c.gt4, c.gt5, None,
                    np.ascontiguousarray(out).tobytes(),
                )
            ],
            columns=cols,
        )

    return halo.groupBy("dataset", "band", "tbx", "tby").applyInPandas(
        fn, model.BLOCK_SCHEMA
    )
