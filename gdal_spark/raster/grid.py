"""Gridding / interpolation (points → raster) and rasterize (vector →
raster) — SURVEY §2.4 gridding row and §2.10.

Gridding (alg/gdalgrid.h:50-87 algorithms): each input point emits a
contribution to every output cell whose center lies within the search
radius — a bounded fan-out (radius/cellsize)² per point — then ONE
groupBy(cell) merges contributions. This inverts the reference's
per-cell neighbor search (quadtree, alg/gdalgrid.cpp:256-384) into a
scatter+combine that distributes with no index and map-side partial
aggregation. Supported: invdist (power 2, smoothing), average, nearest,
and the data metrics count/minimum/maximum/range.

Rasterize (alg/gdalrasterize.cpp burn-attribute mode): polygon id burned
into every block pixel whose CENTER falls inside — the even-odd scanline
contract of GDALdllImageFilledPolygon (alg/llrasterize.cpp:31-58) via the
vectorized ray-cast kernel; MERGE_ALG=replace with max(id) tie-break.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.geometry.kernels import points_in_rings
from gdal_spark.raster import model

# IDW smoothing term added to d² (GDALGridInverseDistanceToAPowerOptions
# dfSmoothing analog) — keeps the weight finite at exact hits and the
# formula branch-free/portable to the SQL oracle.
IDW_SMOOTH = 1e-6


class CellGrid:
    """Output raster definition for gridding: ncols×nrows over a bbox."""

    def __init__(self, minx, miny, maxx, maxy, ncols, nrows):
        self.minx, self.miny, self.maxx, self.maxy = minx, miny, maxx, maxy
        self.ncols, self.nrows = ncols, nrows
        self.dx = (maxx - minx) / ncols
        self.dy = (maxy - miny) / nrows

    def centers(self, cols, rows):
        cx = self.minx + (np.asarray(cols) + 0.5) * self.dx
        cy = self.miny + (np.asarray(rows) + 0.5) * self.dy
        return cx, cy


def scatter_contributions(
    points: DataFrame,
    grid: CellGrid,
    radius: float,
    x_col: str = "lon",
    y_col: str = "lat",
    v_col: str = "value",
) -> DataFrame:
    """(col, row, v, d2, px, py) — every (point × cell-in-radius)
    contribution; the shared scatter stage of all gridding algorithms
    (alg/gdalgrid.h:50-87), bounded fan-out (radius/cell)² per point."""
    g = grid

    def scatter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x_col].to_numpy(np.float64)
            py = pdf[y_col].to_numpy(np.float64)
            pv = pdf[v_col].to_numpy(np.float64)
            # candidate cell window per point
            c0 = np.floor((px - radius - g.minx) / g.dx).astype(np.int64)
            c1 = np.floor((px + radius - g.minx) / g.dx).astype(np.int64)
            r0 = np.floor((py - radius - g.miny) / g.dy).astype(np.int64)
            r1 = np.floor((py + radius - g.miny) / g.dy).astype(np.int64)
            np.clip(c0, 0, g.ncols - 1, out=c0)
            np.clip(c1, 0, g.ncols - 1, out=c1)
            np.clip(r0, 0, g.nrows - 1, out=r0)
            np.clip(r1, 0, g.nrows - 1, out=r1)
            outs = []
            for i in range(len(px)):
                cols = np.arange(c0[i], c1[i] + 1)
                rows = np.arange(r0[i], r1[i] + 1)
                cc, rr = np.meshgrid(cols, rows)
                cc = cc.ravel()
                rr = rr.ravel()
                cx, cy = g.centers(cc, rr)
                d2 = (cx - px[i]) ** 2 + (cy - py[i]) ** 2
                m = d2 <= radius * radius
                if not m.any():
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "col": cc[m],
                            "row": rr[m],
                            "v": pv[i],
                            "d2": d2[m],
                            "px": px[i],
                            "py": py[i],
                        }
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"col": [], "row": [], "v": [], "d2": [], "px": [], "py": []}
            )

    return points.select(x_col, y_col, v_col).mapInPandas(
        scatter, "col long, row long, v double, d2 double, px double, py double"
    )


def grid_points(
    points: DataFrame,
    grid: CellGrid,
    radius: float,
    x_col: str = "lon",
    y_col: str = "lat",
    v_col: str = "value",
) -> DataFrame:
    """(col, row, n, vmin, vmax, mean, idw, nearest) gridding aggregates
    per output cell (cells with ≥1 neighbor point only)."""
    contrib = scatter_contributions(points, grid, radius, x_col, y_col, v_col)
    w = 1.0 / (F.col("d2") + F.lit(IDW_SMOOTH))
    return (
        contrib.groupBy("col", "row")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.avg("v").alias("mean"),
            (F.sum(F.col("v") * w) / F.sum(w)).alias("idw"),
            F.min("d2").alias("_mind2"),
            F.min_by("v", "d2").alias("nearest"),
        )
        .drop("_mind2")
    )


def rasterize(
    blocks: DataFrame,
    polygons: list[tuple[int, np.ndarray]],
    nodata: int = -1,
) -> DataFrame:
    """Burn polygon ids into the grid of `blocks` (band 1 geometry reused;
    payload replaced by int32 ids; overlapping polygons → max id wins)."""
    spark = blocks.sparkSession
    bc = spark.sparkContext.broadcast(
        [(int(p), np.asarray(r, dtype=np.float64).tolist()) for p, r in polygons]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = [(p, np.asarray(r)) for p, r in bc.value]
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                ys, xs = np.mgrid[0 : r.height, 0 : r.width]
                lon = r.gt0 + (xs.ravel() + r.x0 + 0.5) * r.gt1
                lat = r.gt3 + (ys.ravel() + r.y0 + 0.5) * r.gt5
                burn = np.full(lon.shape, nodata, dtype=np.int32)
                for pid, ring in polys:
                    if (
                        lon.min() > ring[:, 0].max()
                        or lon.max() < ring[:, 0].min()
                        or lat.min() > ring[:, 1].max()
                        or lat.max() < ring[:, 1].min()
                    ):
                        continue
                    inside = points_in_rings(lon, lat, [ring])
                    burn[inside] = np.maximum(burn[inside], pid)
                d = {
                    "dataset": r.dataset + "_burn",
                    "band": 1,
                    "bx": r.bx,
                    "by": r.by,
                    "x0": r.x0,
                    "y0": r.y0,
                    "width": r.width,
                    "height": r.height,
                    "dtype": "int32",
                    "gt0": r.gt0,
                    "gt1": r.gt1,
                    "gt2": r.gt2,
                    "gt3": r.gt3,
                    "gt4": r.gt4,
                    "gt5": r.gt5,
                    "nodata": float(nodata),
                    "buf": np.ascontiguousarray(
                        burn.reshape(r.height, r.width)
                    ).tobytes(),
                }
                out.append(d)
            yield pd.DataFrame(out)

    return blocks.where(F.col("band") == 1).mapInPandas(fn, model.BLOCK_SCHEMA)


def grid_points_nn(
    points: DataFrame,
    grid: CellGrid,
    radius: float,
    n_neighbors: int = 8,
    x_col: str = "lon",
    y_col: str = "lat",
    v_col: str = "value",
) -> DataFrame:
    """invdistnn (GDALGridInverseDistanceToAPowerNearestNeighbor,
    alg/gdalgrid.h:60): IDW restricted to the N nearest neighbors inside
    the search radius. Same scatter stage; the per-cell nearest-N select
    is a Catalyst window (row_number over d2), deterministic tie-break
    (d2, v). Returns (col, row, n_used, idwnn)."""
    from pyspark.sql.window import Window

    contrib = scatter_contributions(points, grid, radius, x_col, y_col, v_col)
    wnd = Window.partitionBy("col", "row").orderBy(
        F.col("d2").asc(), F.col("v").asc()
    )
    top = contrib.withColumn("rn", F.row_number().over(wnd)).where(
        F.col("rn") <= n_neighbors
    )
    w = 1.0 / (F.col("d2") + F.lit(IDW_SMOOTH))
    return top.groupBy("col", "row").agg(
        F.count("*").alias("n_used"),
        (F.sum(F.col("v") * w) / F.sum(w)).alias("idwnn"),
    )


def grid_data_metrics(
    points: DataFrame,
    grid: CellGrid,
    radius: float,
    x_col: str = "lon",
    y_col: str = "lat",
    v_col: str = "value",
) -> DataFrame:
    """Full data-metrics set (alg/gdalgrid.h:67-87, apps/
    gdalalg_vector_grid_data_metrics.h:53-244): count / minimum /
    maximum / range / average_distance (cell center → points) /
    average_distance_pts (all point pairs in the search radius, mean
    over unordered pairs; 0 for a single point). The pairwise metric
    runs per cell in applyInPandas — group sizes are bounded by the
    radius fan-in, everything else is plain Catalyst aggregation."""
    contrib = scatter_contributions(points, grid, radius, x_col, y_col, v_col)
    base = contrib.groupBy("col", "row").agg(
        F.count("*").alias("cnt"),
        F.min("v").alias("minimum"),
        F.max("v").alias("maximum"),
        (F.max("v") - F.min("v")).alias("vrange"),
        F.avg(F.sqrt("d2")).alias("average_distance"),
    )

    def pair_dist(key, pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[["px", "py"]].to_numpy(np.float64)
        n = len(p)
        if n < 2:
            ad = 0.0
        else:
            d = np.sqrt(
                ((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
            )
            iu = np.triu_indices(n, k=1)
            ad = float(d[iu].mean())
        return pd.DataFrame(
            {"col": [int(key[0])], "row": [int(key[1])], "adp": [ad]}
        )

    pairs = contrib.groupBy("col", "row").applyInPandas(
        pair_dist, "col long, row long, adp double"
    )
    return base.join(pairs, ["col", "row"]).select(
        "col",
        "row",
        "cnt",
        "minimum",
        "maximum",
        "vrange",
        "average_distance",
        F.col("adp").alias("average_distance_pts"),
    )


def grid_linear(
    points: DataFrame,
    grid: CellGrid,
    radius: float = float("inf"),
    nodata: float = 0.0,
    x_col: str = "lon",
    y_col: str = "lat",
    v_col: str = "value",
) -> DataFrame:
    """`gdal vector grid linear` (GDALGridLinear, alg/gdalgrid.cpp:
    2458-2532): Delaunay-triangulate the points; a cell inside a facet
    gets the barycentric interpolation of its three vertices; a cell
    outside the hull falls back to nearest-neighbor when radius != 0
    (the reference's default radius is infinity) else nodata.

    Scale design: the POINT layer is the small side — the reference
    materializes padfX/Y/Z fully in RAM and triangulates once on the
    driver the same way (alg/gdalgrid.cpp:3000-3100) — so the
    triangulation is built once and broadcast; the CELL side (the
    raster, the side that actually scales) is generated distributed
    with spark.range and evaluated per Arrow batch with numpy."""
    from gdal_spark.geometry.clip import delaunay

    # the gdal_grid contract — the reference itself holds the point
    # layer in RAM; rows here are O(|point layer|)
    rows = points.select(x_col, y_col, v_col).collect()  # bounded-metadata: point layer, not the raster
    xy = np.array([[r[0], r[1]] for r in rows], dtype=np.float64)
    z = np.array([r[2] for r in rows], dtype=np.float64)
    uniq, idx = np.unique(xy, axis=0, return_index=True)
    zu = z[idx]
    tris = delaunay(uniq)  # uniq is np.unique-sorted: indices align
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(
        (uniq.tolist(), zu.tolist(), [list(t) for t in tris])
    )
    g = grid
    rad = radius

    cells = spark.range(g.ncols * g.nrows).select(
        (F.col("id") % g.ncols).cast("long").alias("col"),
        F.expr(f"id div {g.ncols}").cast("long").alias("row"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pts = np.asarray(bc.value[0])
        zv = np.asarray(bc.value[1])
        tr = bc.value[2]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = pdf["col"].to_numpy(np.int64)
            rws = pdf["row"].to_numpy(np.int64)
            cx, cy = g.centers(cols, rws)
            val = np.full(len(cols), np.nan)
            for i1, i2, i3 in tr:
                p1, p2, p3 = pts[i1], pts[i2], pts[i3]
                todo = np.isnan(val)
                if not todo.any():
                    break
                det = (p2[1] - p3[1]) * (p1[0] - p3[0]) + (
                    p3[0] - p2[0]
                ) * (p1[1] - p3[1])
                l1 = (
                    (p2[1] - p3[1]) * (cx - p3[0])
                    + (p3[0] - p2[0]) * (cy - p3[1])
                ) / det
                l2 = (
                    (p3[1] - p1[1]) * (cx - p3[0])
                    + (p1[0] - p3[0]) * (cy - p3[1])
                ) / det
                l3 = 1.0 - l1 - l2
                eps = -1e-12
                inside = todo & (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
                val[inside] = (
                    l1[inside] * zv[i1]
                    + l2[inside] * zv[i2]
                    + l3[inside] * zv[i3]
                )
            out = np.isnan(val)
            if out.any():
                if rad == 0.0:
                    val[out] = nodata
                else:
                    # nearest neighbor, tie-break (d2, v) like grid_points
                    d2 = (
                        (cx[out, None] - pts[None, :, 0]) ** 2
                        + (cy[out, None] - pts[None, :, 1]) ** 2
                    )
                    if np.isfinite(rad):
                        d2 = np.where(d2 <= rad * rad, d2, np.inf)
                    order = np.lexsort((zv[None, :].repeat(out.sum(), 0), d2))
                    nn = order[:, 0]
                    vv = zv[nn]
                    vv = np.where(np.isinf(d2[np.arange(len(nn)), nn]), nodata, vv)
                    val[out] = vv
            yield pd.DataFrame({"col": cols, "row": rws, "value": val})

    return cells.mapInPandas(fn, "col long, row long, value double")
