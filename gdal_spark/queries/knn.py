"""kNN queries — k nearest polygon centers per page.

The reference has no generic kNN operator; its nearest-neighbor search
lives inside gridding (quadtree radius search, alg/gdalgrid.cpp:256-384).
Our engine's kNN contract: candidates via cell/tile-ring expansion (or a
broadcast of the target layer when it is small, as here — 25 targets),
exact haversine re-rank with
row_number() over (partition by query order by dist) <= k  (SURVEY §2.3).

Both sides evaluate the identical haversine expression; distances are
rounded after ranking, so the compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import portable, tables

K = 3


def _targets_cte(dialect: str) -> str:
    """(polygon_id, t_lat, t_lon) — octagon centers = city centers."""
    city = "cast((n_nationkey) % 20 as int)"
    return (
        f"select cast(n_nationkey as bigint) as polygon_id, "
        f"{portable.case_city(city, 0)} as t_lat, "
        f"{portable.case_city(city, 1)} as t_lon "
        f"from nation"
    )


def _knn_sql(dialect: str) -> str:
    dist = portable.haversine_sql("g.lat", "g.lon", "t.t_lat", "t.t_lon")
    return f"""
    with g as ({portable.geo_pages_cte(dialect)}),
    t as ({_targets_cte(dialect)}),
    ranked as (
        select g.url, t.polygon_id, {dist} as dist,
               row_number() over (partition by g.url
                                  order by {dist} asc, t.polygon_id asc) as rnk
        from g cross join t
    )
    select url, rnk, polygon_id, round(dist, 4) as dist_m
    from ranked where rnk <= {K}
    """


def _knn_centers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-kNN: the 25-row target layer is broadcast by Catalyst
    (cross join under autoBroadcastJoinThreshold); the window re-rank
    shuffles only (url, k) candidate rows."""
    tables.register_views(spark, sf_dir)
    return spark.sql(_knn_sql("spark"))


QUERIES = {"knn_centers": _knn_centers}
ORACLES = {"knn_centers": _knn_sql("duckdb")}


def _knn_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path kNN (cell-ring expansion with provable stop,
    operators/knn.py knn_ring_join) on the same task as knn_centers —
    output is (url, rnk, polygon_id) WITHOUT the distance column: the
    engine computes haversine in numpy while the oracle uses SQL trig,
    and the two can differ in the last ulp; ranks are stable (targets
    are km apart) so the compare stays exact."""
    from gdal_spark import portable as P
    from gdal_spark.operators.knn import knn_ring_join

    tables.register_views(spark, sf_dir)
    pages = spark.sql(
        f"select url, lat, lon from ({P.geo_pages_cte('spark')})"
    )
    targets = [
        (int(r.polygon_id), float(r.t_lat), float(r.t_lon))
        for r in spark.sql(_targets_cte("spark")).collect()
    ]  # bounded-metadata: 25 targets
    out = knn_ring_join(pages, targets, k=K, cell_deg=4.0)
    return out.select(
        "url", "rnk", F.col("target_id").alias("polygon_id")
    )


def _knn_ring_oracle() -> str:
    dist = portable.haversine_sql("g.lat", "g.lon", "t.t_lat", "t.t_lon")
    return f"""
    with g as ({portable.geo_pages_cte('duckdb')}),
    t as ({_targets_cte('duckdb')}),
    ranked as (
        select g.url, t.polygon_id,
               row_number() over (partition by g.url
                                  order by {dist} asc, t.polygon_id asc) as rnk
        from g cross join t
    )
    select url, rnk, polygon_id
    from ranked where rnk <= {K}
    """


QUERIES["knn_ring"] = _knn_ring
ORACLES["knn_ring"] = _knn_ring_oracle()


def _knn_hex_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule verbatim kNN ("H3 k-ring expansion with distance
    re-rank", operators/knn.py knn_hex_ring_join) on the same task as
    knn_centers/knn_ring — axial hex buckets instead of degree cells,
    provable mercator-bound stop. Rank-only output for the same
    numpy-vs-SQL-trig ulp reason as knn_ring."""
    from gdal_spark import portable as P
    from gdal_spark.operators.knn import knn_hex_ring_join

    tables.register_views(spark, sf_dir)
    pages = spark.sql(
        f"select url, lat, lon from ({P.geo_pages_cte('spark')})"
    )
    targets = [
        (int(r.polygon_id), float(r.t_lat), float(r.t_lon))
        for r in spark.sql(_targets_cte("spark")).collect()
    ]  # bounded-metadata: 25 targets
    out = knn_hex_ring_join(pages, targets, k=K, size=200000.0)
    return out.select(
        "url", "rnk", F.col("target_id").alias("polygon_id")
    )


QUERIES["knn_hex_ring"] = _knn_hex_ring
ORACLES["knn_hex_ring"] = _knn_ring_oracle()
