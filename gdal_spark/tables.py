"""Table registry: driver testdata views, the derived `pages` layer, and
the deterministic polygon layer (both as Spark DataFrames and as local
numpy structures for broadcast).

The polygon vertices here are computed with the *same* double-precision
expression tree as gdal_spark.portable.poly_verts_cte renders into SQL
(center + (r*1.3)*ux literals — no trig), so Spark kernels, Spark SQL,
and the DuckDB oracle all see bit-identical coordinates.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark import portable
from gdal_spark.geometry.kernels import bbox_of_rings
from gdal_spark.geometry.wkb import polygon_to_wkb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp view per parquet table + the derived `pages` / `geo_pages`."""
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    spark.sql(
        f"create or replace temporary view pages as {portable.pages_cte('spark')}"
    )
    spark.sql(
        "create or replace temporary view geo_pages as "
        + portable.geo_pages_cte("spark")
    )


def pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("pages")


def geo_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages + deterministic geocode columns (url, warc_ts, text, lang,
    city_id, lat, lon)."""
    register_views(spark, sf_dir)
    return spark.table("geo_pages")


# --- polygon layer (25 convex octagons over 20 city centers) ---


def polygon_rings_local(n_nationkey: int) -> np.ndarray:
    """(9,2) closed CCW ring; bit-exact with poly_verts_cte SQL."""
    city = n_nationkey % 20
    clat, clon = portable.CITIES[city]
    r = 0.35 + float(n_nationkey % 5) * 0.25
    pts = np.array(
        [
            (clon + (r * portable.POLY_XSCALE) * ux, clat + r * uy)
            for (ux, uy) in portable.OCTAGON
        ],
        dtype=np.float64,
    )
    return np.vstack([pts, pts[:1]])


def polygons_local(nation_rows: list[tuple[int, str]] | None = None):
    """[{polygon_id, name, rings, bbox}] for broadcast. If nation_rows is
    None, uses ids 0..24 with synthetic names (matches the testdata
    nation table, which always has n_nationkey 0..24)."""
    if nation_rows is None:
        nation_rows = [(i, f"NATION_{i}") for i in range(25)]
    out = []
    for nk, name in nation_rows:
        ring = polygon_rings_local(nk)
        rings = [ring]
        out.append(
            {
                "polygon_id": int(nk),
                "name": name,
                "rings": rings,
                "bbox": bbox_of_rings(rings),
            }
        )
    return out


def polygons_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon layer as a DataFrame with a WKB geometry column — the
    OGRLayer analog (fid, fields, geometry:binary)."""
    register_views(spark, sf_dir)
    names = {
        int(r["n_nationkey"]): r["n_name"]
        for r in spark.table("nation").collect()  # bounded-metadata: 25-row dim
    }
    rows = []
    for nk in sorted(names):
        ring = polygon_rings_local(nk)
        bbox = bbox_of_rings([ring])
        rows.append(
            (
                nk,
                names[nk],
                bytearray(polygon_to_wkb([ring])),
                bbox[0],
                bbox[1],
                bbox[2],
                bbox[3],
            )
        )
    return spark.createDataFrame(
        rows,
        "polygon_id long, polygon_name string, geometry binary, "
        "minx double, miny double, maxx double, maxy double",
    )


def polygon_b_ring_local(n_nationkey: int) -> np.ndarray:
    """(8,2) open CCW ring of layer-B octagon; bit-exact with
    portable.poly_b_verts_cte SQL."""
    city = n_nationkey % 20
    clat, clon = portable.CITIES[city]
    r = 0.3 + float(n_nationkey % 4) * 0.2
    return np.array(
        [
            (
                clon + portable.POLY_B_SHIFT_LON
                + (r * portable.POLY_B_XSCALE) * ux,
                clat + portable.POLY_B_SHIFT_LAT + r * uy,
            )
            for (ux, uy) in portable.OCTAGON
        ],
        dtype=np.float64,
    )


def polygons_b_payload(n: int = 25) -> list[tuple[int, np.ndarray]]:
    """[(b_id, ring)] — the layer-algebra method payload."""
    return [(i, polygon_b_ring_local(i)) for i in range(n)]


def polygons_a_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer A as (polygon_id, geometry WKB) DataFrame."""
    register_views(spark, sf_dir)
    n = spark.table("nation").count()
    rows = [
        (i, bytearray(polygon_to_wkb([polygon_rings_local(i)])))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "polygon_id long, geometry binary")


def polygons_b_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    n = spark.table("nation").count()
    rows = [
        (i, bytearray(polygon_to_wkb([polygon_b_ring_local(i)])))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "b_id long, geometry binary")


def bench_polygons_local(side: int = 8, radius: float = 0.12) -> list:
    """Dense benchmark polygon layer: side×side small octagons tiled over
    each city's ±1° square (20·side² polygons). Models the north star's
    fine-grained polygon layer (H3-res-9-like cell density) so the
    filter/refine join does realistic per-page work, unlike the 25-row
    correctness layer."""
    out = []
    pid = 0
    for clat, clon in portable.CITIES:
        for gy in range(side):
            for gx in range(side):
                cx = clon - 1.0 + (gx + 0.5) * 2.0 / side
                cy = clat - 1.0 + (gy + 0.5) * 2.0 / side
                ring = np.array(
                    [
                        (cx + radius * portable.POLY_XSCALE * ux, cy + radius * uy)
                        for (ux, uy) in portable.OCTAGON
                    ],
                    dtype=np.float64,
                )
                out.append(
                    {
                        "polygon_id": pid,
                        "name": f"bench_{pid}",
                        "rings": [ring],
                        "bbox": bbox_of_rings([ring]),
                    }
                )
                pid += 1
    return out
