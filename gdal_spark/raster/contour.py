"""Contour — marching squares, distributed (alg/contour.cpp,
alg/marching_squares/ parity at the segment level).

Each 2×2 pixel cell is independent, so contour extraction distributes
perfectly: blocks receive their 1-px halo (reusing the focal halo
exchange), every interior cell classifies its 4 corners against the
level and emits 0-2 line segments with linearly interpolated endpoints
(grid coordinates = pixel indices). The reference merges segments into
polylines (segment merger, alg/contour.cpp:332) — that stitch is an
order-dependent reduce recorded as the v2 finalize; the segment soup is
already the exact contour geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark.raster.focal import _assemble, _halo_emit

SEG_SCHEMA = (
    "dataset string, band int, level double, "
    "x1 double, y1 double, x2 double, y2 double"
)

# marching-squares case table: for each of the 16 corner patterns the
# crossed edge pairs. Corners: 0=TL(0,0) 1=TR(1,0) 2=BR(1,1) 3=BL(0,1);
# edges: t=top l=left r=right b=bottom.
_CASES: dict[int, list[tuple[str, str]]] = {
    1: [("t", "l")], 2: [("t", "r")], 3: [("l", "r")],
    4: [("r", "b")], 5: [("t", "l"), ("r", "b")],  # saddle: default pairing
    6: [("t", "b")], 7: [("l", "b")],
    8: [("l", "b")], 9: [("t", "b")],
    10: [("t", "r"), ("l", "b")], 11: [("r", "b")],
    12: [("l", "r")], 13: [("t", "r")], 14: [("t", "l")],
}


def _interp(va, vb, level):
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (level - va) / (vb - va)
    return np.clip(t, 0.0, 1.0)


def contour_segments(
    blocks: DataFrame, levels: list[float], width: int, height: int
) -> DataFrame:
    """(dataset, band, level, x1, y1, x2, y2) segment rows in grid
    coordinates (pixel index space)."""
    halo = _halo_emit(blocks)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf)
        cols = [c.split()[0] for c in SEG_SCHEMA.split(", ")]
        if asm is None:
            return pd.DataFrame(columns=cols)
        pad, c = asm
        h, w = int(c.height), int(c.width)
        x_off, y_off = int(c.x0), int(c.y0)
        # cell corner arrays over the block + its right/bottom halo; a
        # cell (i,j) uses pixels (j..j+1, i..i+1) in global index space.
        tl = pad[1:-1, 1:-1][:h, :w]
        tr = pad[1:-1, 2:][:h, :w]
        bl = pad[2:, 1:-1][:h, :w]
        br = pad[2:, 2:][:h, :w]
        # valid cells: bottom/right corner pixel must exist in the raster
        ys, xs = np.mgrid[0:h, 0:w]
        gx = xs + x_off
        gy = ys + y_off
        valid = (gx + 1 < width) & (gy + 1 < height)
        rows = []
        for level in levels:
            code = (
                (tl >= level).astype(np.int64)
                + 2 * (tr >= level).astype(np.int64)
                + 4 * (br >= level).astype(np.int64)
                + 8 * (bl >= level).astype(np.int64)
            )
            for case, pairs in _CASES.items():
                m = (code == case) & valid
                if not m.any():
                    continue
                cgx = gx[m].astype(np.float64)
                cgy = gy[m].astype(np.float64)
                ctl, ctr, cbl, cbr = tl[m], tr[m], bl[m], br[m]
                pts = {
                    "t": (cgx + _interp(ctl, ctr, level), cgy),
                    "b": (cgx + _interp(cbl, cbr, level), cgy + 1.0),
                    "l": (cgx, cgy + _interp(ctl, cbl, level)),
                    "r": (cgx + 1.0, cgy + _interp(ctr, cbr, level)),
                }
                for ea, eb in pairs:
                    (x1, y1), (x2, y2) = pts[ea], pts[eb]
                    rows.append(
                        pd.DataFrame(
                            {
                                "dataset": str(c.dataset),
                                "band": int(c.band),
                                "level": float(level),
                                "x1": x1,
                                "y1": y1,
                                "x2": x2,
                                "y2": y2,
                            }
                        )
                    )
        return pd.concat(rows) if rows else pd.DataFrame(columns=cols)

    return halo.groupBy("dataset", "band", "tbx", "tby").applyInPandas(
        fn, SEG_SCHEMA
    )


def contour_polylines(segs: DataFrame) -> DataFrame:
    """Stitch the segment soup into polylines — the reference's segment
    merger (alg/contour.cpp:332 / marching_squares polygon ring
    appender), distributed per (dataset, band, level): one applyInPandas
    task per level stitches that level's segments (a contour's segment
    count is O(perimeter), not O(area), so a level fits a task by the
    same argument the reference's per-level merger fits memory).

    Returns (dataset, band, level, line_id, n_points, length, closed,
    wkb LINESTRING); line_id = stable index by (start_y, start_x)."""
    import numpy as np

    from gdal_spark.geometry.wkb import linestring_to_wkb

    out_schema = (
        "dataset string, band int, level double, line_id long, "
        "n_points long, length double, closed boolean, wkb binary"
    )

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        def q(x, y):
            return (round(float(x), 9), round(float(y), 9))

        adj: dict[tuple, list[tuple[int, int]]] = {}
        a = pdf[["x1", "y1", "x2", "y2"]].to_numpy(np.float64)
        for i in range(len(a)):
            adj.setdefault(q(a[i, 0], a[i, 1]), []).append((i, 0))
            adj.setdefault(q(a[i, 2], a[i, 3]), []).append((i, 1))
        used = np.zeros(len(a), dtype=bool)

        def walk(start_key):
            pts = [start_key]
            cur = start_key
            while True:
                nxt = None
                for si, end in adj.get(cur, []):
                    if not used[si]:
                        used[si] = True
                        other = q(a[si, 2], a[si, 3]) if end == 0 else q(
                            a[si, 0], a[si, 1]
                        )
                        nxt = other
                        break
                if nxt is None:
                    return pts
                pts.append(nxt)
                cur = nxt

        lines = []
        # open chains first (degree-1 endpoints), then leftover loops
        for passno in (0, 1):
            for k in sorted(adj):
                deg = sum(1 for si, _ in adj[k] if not used[si])
                if deg == 0:
                    continue
                if passno == 0 and deg != 1:
                    continue
                pts = walk(k)
                if len(pts) >= 2:
                    lines.append(pts)
        lines.sort(key=lambda p: (p[0][1], p[0][0]))
        rows = []
        for li, pts in enumerate(lines):
            arr = np.array(pts, dtype=np.float64)
            d = np.diff(arr, axis=0)
            rows.append(
                (
                    str(key[0]),
                    int(key[1]),
                    float(key[2]),
                    li,
                    len(pts),
                    float(np.hypot(d[:, 0], d[:, 1]).sum()),
                    bool(pts[0] == pts[-1]),
                    linestring_to_wkb(arr),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[c.split()[0] for c in out_schema.split(", ")],
        )

    return segs.groupBy("dataset", "band", "level").applyInPandas(
        stitch, out_schema
    )


# --- contour polygons (gdal raster contour --polygonize) --------------------


def classify_bands(blocks: DataFrame, levels: list[float]) -> DataFrame:
    """Int32 band-code raster: code = number of levels <= pixel value
    (band k covers [level_{k-1}, level_k), code 0 below the first
    level, code len(levels) at/above the last) — the level-banding the
    reference's polygon contour generator applies per cell
    (alg/contour.cpp GDALContourGenerateEx POLYGONIZE=YES). Pure map
    stage over the block table."""
    from typing import Iterator

    from gdal_spark.raster import model

    lv = np.asarray(sorted(levels), dtype=np.float64)
    cols = [c.split()[0] for c in model.BLOCK_SCHEMA.split(", ")]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            bufs = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                    np.float64
                )
                code = np.searchsorted(lv, a.ravel(), side="right").astype(
                    np.int32
                )
                bufs.append(code.tobytes())
            out["buf"] = bufs
            out["dtype"] = "int32"
            yield out[cols]

    return blocks.mapInPandas(fn, model.BLOCK_SCHEMA)


def contour_polygons(
    blocks: DataFrame,
    levels: list[float],
    width: int,
    height: int,
    band: int = 1,
) -> DataFrame:
    """`gdal raster contour --polygonize` (apps/
    gdalalg_raster_contour.cpp:75, -amin/-amax fields :59-60): polygon
    per connected region of each level band, with the band's bounds as
    amin/amax (NULL on the open ends). Classification is one map
    stage; the region extraction is the SAME distributed CCL +
    ring-trace pipeline as polygonize (one shuffle keyed by region) —
    composition, not new machinery."""
    from pyspark.sql import functions as F

    from gdal_spark.raster.polygonize import polygonize_wkb

    lv = sorted(float(v) for v in levels)
    arr = "array(" + ", ".join(f"cast({v} as double)" for v in lv) + ")"
    cls = classify_bands(blocks.where(F.col("band") == band), lv)
    out = polygonize_wkb(cls, width, height, band=band)
    return out.select(
        "region_id",
        F.col("value").cast("int").alias("band_code"),
        "n_pixels",
        F.expr(
            f"case when value >= 1 then element_at({arr}, cast(value as int))"
            " else null end"
        ).alias("amin"),
        F.expr(
            f"case when value < {len(lv)} then"
            f" element_at({arr}, cast(value as int) + 1) else null end"
        ).alias("amax"),
        "wkb",
    )
