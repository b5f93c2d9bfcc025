"""Spatial join: envelope filter + point-in-polygon refine.

Reproduces the reference's 3-stage spatial-filter contract
(OGRLayer::FilterGeometry, ogr/ogrsf_frmts/generic/ogrlayer.cpp:3981-4048:
envelope reject → envelope-contained accept → prepared-geometry refine)
as two Spark stages:

1. FILTER — either
   a) broadcast packed-R-tree probe of polygon envelopes (small/medium
      polygon layers; FlatGeobuf packedrtree.h analog), or
   b) cell-key equi-join: polygons exploded to covering WebMercator tiles
      at a chosen zoom, points keyed by the same tile → Spark shuffle
      join with AQE skew splitting (huge polygon layers).
2. REFINE — vectorized even-odd ray-cast kernel inside mapInPandas
   (geometry.kernels.points_in_rings). Zero per-row Python.

Scale: (a) is one narrow mapInPandas — no shuffle at all; (b) shuffles
once on the cell key, with the deliberate city skew handled by AQE.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from gdal_spark.cellindex.tile import lonlat_to_tile, quadkey
from gdal_spark.geometry.kernels import points_in_rings
from gdal_spark.geometry.strtree import GridIndex, PackedRTree

_TREE_CACHE: dict[int, tuple] = {}

# Below this many polygons a dense (points × boxes) bbox compare beats a
# tree walk (fewer allocations, pure vectorized compare). The tree path
# takes over for large layers where O(N·P) would blow up.
BRUTE_FORCE_MAX_POLYGONS = 64


def _payload(polygons: list) -> list:
    """Broadcast-friendly payload: (polygon_id, bbox, [rings as lists])."""
    return [
        (int(p["polygon_id"]), tuple(p["bbox"]), [np.asarray(r).tolist() for r in p["rings"]])
        for p in polygons
    ]


def broadcast_pip_join(
    df: DataFrame,
    polygons: list,
    lat_col: str = "lat",
    lon_col: str = "lon",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to polygons they fall in. `polygons` is
    tables.polygons_local() output. how: 'inner' (matched rows only,
    multi-match duplicates the row — OGRLayer::Intersection semantics,
    ogrlayer.cpp:5361) or 'left' (unmatched rows keep polygon_id NULL).
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(_payload(polygons))
    out_schema = StructType(df.schema.fields + [StructField("polygon_id", LongType(), True)])
    left = how == "left"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key = id(bc.value)
        cached = _TREE_CACHE.get(key)
        if cached is None:
            payload = bc.value
            boxes = np.array([p[1] for p in payload], dtype=np.float64).reshape(-1, 4)
            # GridIndex probe is ~20x faster than the R-tree walk for
            # batched points (see strtree.GridIndex); PackedRTree remains
            # for box-query workloads and as the FlatGeobuf-parity index
            tree = GridIndex(boxes) if len(boxes) > BRUTE_FORCE_MAX_POLYGONS else None
            rings = [[np.asarray(r, dtype=np.float64) for r in p[2]] for p in payload]
            ids = np.array([p[0] for p in payload], dtype=np.int64)
            _TREE_CACHE.clear()
            _TREE_CACHE[key] = (tree, boxes, rings, ids)
            cached = _TREE_CACHE[key]
        tree, boxes, rings, ids = cached
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[lon_col].to_numpy(dtype=np.float64)
            py = pdf[lat_col].to_numpy(dtype=np.float64)
            if tree is not None:
                q, item = tree.query_points(px, py)
            else:
                m = (
                    (px[:, None] >= boxes[None, :, 0])
                    & (px[:, None] <= boxes[None, :, 2])
                    & (py[:, None] >= boxes[None, :, 1])
                    & (py[:, None] <= boxes[None, :, 3])
                )
                q, item = np.nonzero(m)
            hit_rows: list[np.ndarray] = []
            hit_ids: list[np.ndarray] = []
            # group candidate pairs by polygon via ONE sort (a per-polygon
            # boolean rescan would be O(pairs × polygons))
            order = np.argsort(item, kind="stable")
            so_item = item[order]
            uniq, start = np.unique(so_item, return_index=True)
            end = np.append(start[1:], len(so_item))
            for gi, s, e in zip(uniq, start, end):
                sel = q[order[s:e]]
                inside = points_in_rings(px[sel], py[sel], rings[gi])
                rows = sel[inside]
                if rows.size:
                    hit_rows.append(rows)
                    hit_ids.append(np.full(rows.shape, ids[gi], dtype=np.int64))
            if hit_rows:
                rows = np.concatenate(hit_rows)
                pids = np.concatenate(hit_ids)
            else:
                rows = np.empty(0, dtype=np.int64)
                pids = np.empty(0, dtype=np.int64)
            if left:
                matched = np.zeros(len(pdf), dtype=bool)
                matched[rows] = True
                miss = np.nonzero(~matched)[0]
                out = pdf.iloc[np.concatenate([rows, miss])].reset_index(drop=True)
                out["polygon_id"] = np.concatenate(
                    [pids.astype("float64"), np.full(miss.shape, np.nan)]
                )
                out["polygon_id"] = out["polygon_id"].astype("Int64")
            else:
                out = pdf.iloc[rows].reset_index(drop=True)
                out["polygon_id"] = pids
            yield out

    return df.mapInPandas(fn, out_schema)


def sql_pip_join(
    df: DataFrame,
    polygons: list,
    lat_col: str = "lat",
    lon_col: str = "lon",
    key_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Pure-Catalyst strategy: broadcast (bbox, edges) tables, even-odd
    crossing count as a SQL aggregate. Whole plan stays in whole-stage
    codegen (zero Python). Same 3-stage contract: bbox prefilter join →
    per-edge crossing sum → odd-parity filter. Output: key_cols +
    polygon_id. Identical rows to broadcast_pip_join (tests assert)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    box_rows, edge_rows = [], []
    for p in polygons:
        pid = int(p["polygon_id"])
        minx, miny, maxx, maxy = (float(v) for v in p["bbox"])
        box_rows.append((pid, minx, miny, maxx, maxy))
        for ring in p["rings"]:
            r = np.asarray(ring, dtype=np.float64)
            for k in range(len(r) - 1):
                edge_rows.append(
                    (pid, float(r[k, 0]), float(r[k, 1]), float(r[k + 1, 0]), float(r[k + 1, 1]))
                )
    boxes = spark.createDataFrame(
        box_rows, "polygon_id long, minx double, miny double, maxx double, maxy double"
    )
    edges = spark.createDataFrame(
        edge_rows, "polygon_id long, x1 double, y1 double, x2 double, y2 double"
    )
    lon, lat = F.col(lon_col), F.col(lat_col)
    cand = df.join(
        F.broadcast(boxes),
        (lon >= F.col("minx")) & (lon <= F.col("maxx"))
        & (lat >= F.col("miny")) & (lat <= F.col("maxy")),
    ).select(*key_cols, lat_col, lon_col, "polygon_id")
    e = cand.join(F.broadcast(edges), "polygon_id")
    crossing = F.when(
        ((F.col("y1") > lat) != (F.col("y2") > lat))
        & (
            lon
            < (F.col("x2") - F.col("x1")) * (lat - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1")
        ),
        1,
    ).otherwise(0)
    return (
        e.groupBy(*key_cols, "polygon_id")
        .agg(F.sum(crossing).alias("crossings"))
        .where(F.col("crossings") % 2 == 1)
        .select(*key_cols, "polygon_id")
    )


def polygon_cell_cover(polygons: list, zoom: int) -> list[tuple[int, int]]:
    """(cell_quadkey, polygon_id) covering rows at a WebMercator zoom —
    the build side of the cell-key equi-join (strategy b)."""
    out: list[tuple[int, int]] = []
    for p in polygons:
        minx, miny, maxx, maxy = p["bbox"]
        tx0, ty0 = lonlat_to_tile(np.array([minx]), np.array([maxy]), zoom)
        tx1, ty1 = lonlat_to_tile(np.array([maxx]), np.array([miny]), zoom)
        xs = np.arange(tx0[0], tx1[0] + 1, dtype=np.int64)
        ys = np.arange(ty0[0], ty1[0] + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        keys = quadkey(gx.ravel(), gy.ravel(), zoom)
        out.extend((int(k), int(p["polygon_id"])) for k in keys)
    return out


def cell_pip_join(
    df: DataFrame,
    polygons: list,
    zoom: int = 7,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Cell-key equi-join + refine — the shuffle-based strategy for
    polygon layers too large to broadcast geometry for. The covering
    table (cell, polygon_id) is still broadcast (it is tiny relative to
    geometry); the refine consults broadcast rings only for candidate
    pairs. Results are identical to broadcast_pip_join (tests assert)."""
    spark = df.sparkSession
    from pyspark.sql import functions as F

    cover = spark.createDataFrame(
        polygon_cell_cover(polygons, zoom), "cell long, polygon_id long"
    )
    bc = spark.sparkContext.broadcast(_payload(polygons))

    @F.pandas_udf("long")
    def cell_of(lon: pd.Series, lat: pd.Series) -> pd.Series:
        tx, ty = lonlat_to_tile(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64), zoom
        )
        return pd.Series(quadkey(tx, ty, zoom))

    @F.pandas_udf("boolean")
    def refine(lon: pd.Series, lat: pd.Series, pid: pd.Series) -> pd.Series:
        payload = {p[0]: p[2] for p in bc.value}
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        ids = pid.to_numpy(dtype=np.int64)
        ok = np.zeros(len(px), dtype=bool)
        for gi in np.unique(ids):
            m = ids == gi
            rings = [np.asarray(r, dtype=np.float64) for r in payload[int(gi)]]
            ok[m] = points_in_rings(px[m], py[m], rings)
        return pd.Series(ok)

    keyed = df.withColumn("cell", cell_of(F.col(lon_col), F.col(lat_col)))
    cand = keyed.join(F.broadcast(cover), "cell")
    return (
        cand.where(refine(F.col(lon_col), F.col(lat_col), F.col("polygon_id")))
        .drop("cell")
    )


def cell_pip_join_shuffled(
    df: DataFrame,
    polygons_df: DataFrame,
    zoom: int = 7,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Fully-shuffled cell-key strategy — NOTHING is broadcast: for
    polygon layers too large even for a covering-table broadcast. The
    polygon side explodes to (cell, polygon_id, geometry WKB) rows and
    shuffles on the cell key next to the cell-keyed points; the refine
    ray-cast runs per joined pair with the geometry carried IN the join
    row. AQE skew-join splits hot cells. Results identical to
    broadcast_pip_join (tests assert).

    polygons_df: (polygon_id long, geometry binary WKB,
    minx/miny/maxx/maxy double) — tables.polygons_df shape.
    """
    from pyspark.sql import functions as F

    from gdal_spark.geometry.wkb import polygon_rings

    spark = df.sparkSession
    _ = spark

    # polygon → covering cells (tile range of the bbox at `zoom`)
    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                tx0, ty0 = lonlat_to_tile(
                    np.array([r.minx]), np.array([r.maxy]), zoom
                )
                tx1, ty1 = lonlat_to_tile(
                    np.array([r.maxx]), np.array([r.miny]), zoom
                )
                xs = np.arange(tx0[0], tx1[0] + 1, dtype=np.int64)
                ys = np.arange(ty0[0], ty1[0] + 1, dtype=np.int64)
                gx, gy = np.meshgrid(xs, ys)
                keys = quadkey(gx.ravel(), gy.ravel(), zoom)
                for k in keys:
                    outs.append((int(k), int(r.polygon_id), bytes(r.geometry)))
            yield pd.DataFrame(
                outs, columns=["cell", "polygon_id", "geometry"]
            )

    poly_cells = polygons_df.mapInPandas(
        cover, "cell long, polygon_id long, geometry binary"
    )

    @F.pandas_udf("long")
    def cell_of(lon: pd.Series, lat: pd.Series) -> pd.Series:
        tx, ty = lonlat_to_tile(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64), zoom
        )
        return pd.Series(quadkey(tx, ty, zoom))

    keyed = df.withColumn("cell", cell_of(F.col(lon_col), F.col(lat_col)))
    cand = keyed.join(poly_cells, "cell")  # shuffle join on the cell key

    @F.pandas_udf("boolean")
    def refine(lon: pd.Series, lat: pd.Series, geom: pd.Series) -> pd.Series:
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        ok = np.zeros(len(px), dtype=bool)
        # group identical geometries within the batch (hot polygons
        # repeat many times per cell) so the ray-cast vectorizes
        idx_by_geom: dict[bytes, list[int]] = {}
        for i, g in enumerate(geom):
            idx_by_geom.setdefault(bytes(g), []).append(i)
        for g, idxs in idx_by_geom.items():
            rings = polygon_rings(g)
            sel = np.array(idxs, dtype=np.int64)
            ok[sel] = points_in_rings(px[sel], py[sel], rings)
        return pd.Series(ok)

    return (
        cand.where(refine(F.col(lon_col), F.col(lat_col), F.col("geometry")))
        .drop("cell", "geometry")
    )


def polygon_hex_cover(
    polygons: list, size: float = 100000.0
) -> list[tuple[int, int, int]]:
    """(hex_q, hex_r, polygon_id, minx, miny, maxx, maxy) covering rows
    — the build side of the hex-cell equi-join (bbox carried so the
    probe can envelope-reject the margin's false candidates before the
    edge join — the reference's 3-stage filter contract).
    Covers each polygon's bbox in axial hex space:
    qf/rf are linear in (mercator x, y), each monotone in lon/lat, so
    their bbox extremes sit at the 4 corners; cube rounding moves a
    coordinate at most 1 from its float value (the re-derived axis is
    the sum of two ≤0.5 residuals), so a ±2 integer margin provably
    covers every point in the bbox. Over-cover only costs candidate
    rows — the parity refine is exact."""
    import math

    from gdal_spark.portable import ORIGIN_SHIFT, SQRT3_3

    rows: list[tuple[int, int, int]] = []
    for p in polygons:
        minx, miny, maxx, maxy = (float(v) for v in p["bbox"])
        qs, rs = [], []
        for lon, lat in (
            (minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy)
        ):
            mx = lon * ORIGIN_SHIFT / 180.0
            my = (
                math.log(math.tan((90.0 + lat) * math.pi / 360.0))
                / (math.pi / 180.0) * ORIGIN_SHIFT / 180.0
            )
            qs.append((SQRT3_3 * mx - my / 3.0) / size)
            rs.append((2.0 * my / 3.0) / size)
        q0, q1 = math.floor(min(qs)) - 2, math.ceil(max(qs)) + 2
        r0, r1 = math.floor(min(rs)) - 2, math.ceil(max(rs)) + 2
        pid = int(p["polygon_id"])
        rows.extend(
            (q, r, pid, minx, miny, maxx, maxy)
            for q in range(q0, q1 + 1)
            for r in range(r0, r1 + 1)
        )
    return rows


def hex_pip_join(
    df: DataFrame,
    polygons: list,
    size: float = 100000.0,
    key_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Hex-cell equi-join + codegen parity refine — the north rule's
    "H3-indexed … polygon join" strategy, zero Python end to end:
    points take their axial hex cell via the shared cube-round SQL
    (portable.hex_cells_sql — a codegen'd map), polygons broadcast a
    tiny (hex_q, hex_r, polygon_id) cover (polygon_hex_cover), and the
    even-odd crossing refine is the same whole-stage-codegen aggregate
    as sql_pip_join. Identical rows to broadcast_pip_join (tests
    assert; the oracle gate compares against the exact PIP SQL, so a
    missed cover cell would fail the hash).

    Scale: ONE shuffle at most (the candidate equi-join, and with the
    cover broadcast not even that); at huge polygon counts the cover
    stays O(polygons · cells-per-bbox) — rows, not geometry."""
    from pyspark.sql import functions as F

    from gdal_spark import portable

    spark = df.sparkSession
    # Generate barrier: evaluate the input columns ONCE per row before
    # the hex tower. Fixture inputs derive lat/lon from a 20-branch
    # geocode CASE; CollapseProject would inline that tower into every
    # qf/rf reference of the cube-round expression and the generated
    # filter method blows janino's 64 KB limit (whole-stage codegen
    # then silently falls back to interpreted — 5x slower). explode of
    # a 1-element struct array is a Generate node, not a Project, so
    # downstream references are plain attribute reads. Zero Python,
    # zero shuffle; on a real table with stored lat/lon it is a no-op
    # passthrough.
    df = df.select(
        F.explode(F.array(F.struct(*key_cols, "lat", "lon"))).alias("_p")
    ).select("_p.*")
    df.createOrReplaceTempView("_hexjoin_pts")
    keyed = spark.sql(
        portable.hex_cells_sql(
            "select * from _hexjoin_pts",
            size,
            cols=(*key_cols, "lat", "lon"),
        )
    )
    cover = spark.createDataFrame(
        polygon_hex_cover(polygons, size),
        "hex_q long, hex_r long, polygon_id long, "
        "minx double, miny double, maxx double, maxy double",
    )
    edge_rows = []
    for p in polygons:
        pid = int(p["polygon_id"])
        for ring in p["rings"]:
            r = np.asarray(ring, dtype=np.float64)
            for k in range(len(r) - 1):
                edge_rows.append(
                    (
                        pid,
                        float(r[k, 0]), float(r[k, 1]),
                        float(r[k + 1, 0]), float(r[k + 1, 1]),
                    )
                )
    edges = spark.createDataFrame(
        edge_rows, "polygon_id long, x1 double, y1 double, x2 double, y2 double"
    )
    lon, lat = F.col("lon"), F.col("lat")
    # stage 2 (reference contract): envelope reject — kills the cover
    # margin's false candidates in codegen before any edge row is paid
    cand = (
        keyed.join(F.broadcast(cover), ["hex_q", "hex_r"])
        .where(
            (lon >= F.col("minx")) & (lon <= F.col("maxx"))
            & (lat >= F.col("miny")) & (lat <= F.col("maxy"))
        )
        .select(*key_cols, "lat", "lon", "polygon_id")
    )
    e = cand.join(F.broadcast(edges), "polygon_id")
    crossing = F.when(
        ((F.col("y1") > lat) != (F.col("y2") > lat))
        & (
            lon
            < (F.col("x2") - F.col("x1")) * (lat - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1")
        ),
        1,
    ).otherwise(0)
    return (
        e.groupBy(*key_cols, "polygon_id")
        .agg(F.sum(crossing).alias("crossings"))
        .where(F.col("crossings") % 2 == 1)
        .select(*key_cols, "polygon_id")
    )
