"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: spatial join (broadcast packed-R-tree +
                  ray-cast PIP refine) + XYZ tile assignment over pages
                  derived from sf0.001 documents.
queries()       — one callable per implemented operator (SURVEY.md §2).
oracle_sql()    — DuckDB-runnable ANSI SQL equivalents (same column
                  names/aliases so the driver's value-hash compare works).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from gdal_spark import portable, tables
from gdal_spark.operators.spatial_join import broadcast_pip_join

TILE_ZOOM = 12


def _spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    gp = tables.geo_pages(spark, sf_dir)
    polys = tables.polygons_local()
    j = broadcast_pip_join(gp.selectExpr("url", "lat", "lon"), polys)
    return j.select("url", "polygon_id")


def _spatial_join_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: PIP join + per-page XYZ tile assignment (pure Catalyst
    tile math, Arrow-UDF PIP refine)."""
    gp = tables.geo_pages(spark, sf_dir).selectExpr(
        "url", "lat", "lon", *portable.tile_cols_list("lat", "lon", TILE_ZOOM)
    )
    j = broadcast_pip_join(gp, tables.polygons_local())
    return j.select("url", "polygon_id", "tile_x", "tile_y")


def _tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    return spark.sql(
        f"select url, {portable.tile_cols('lat', 'lon', TILE_ZOOM)} from geo_pages"
    )


def _summary_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR SQL summary mode (whole-table aggregates, SWQM_SUMMARY_RECORD —
    ogr/ogr_swq.h:320, accumulation ogr/swq.cpp:324-560)."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        select count(*) as cnt,
               count(distinct l_returnflag) as cnt_distinct_rf,
               round(sum(l_quantity), 4) as sum_qty,
               round(avg(l_extendedprice), 4) as avg_price,
               min(l_shipdate) as min_ship,
               max(l_shipdate) as max_ship,
               round(stddev_pop(l_discount), 8) as stddev_pop_disc,
               round(stddev_samp(l_discount), 8) as stddev_samp_disc
        from lineitem
        """
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _spatial_join_tiles(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "spatial_join_pip": _spatial_join,
        "spatial_join_tiles": _spatial_join_tiles,
        "tile_assign": _tile_assign,
        "summary_aggregates": _summary_aggregates,
    }


def oracle_sql() -> dict[str, str]:
    d = "duckdb"
    tile = portable.tile_cols("lat", "lon", TILE_ZOOM)
    return {
        "spatial_join_pip": portable.pip_join_sql(d),
        "spatial_join_tiles": f"""
            with j as ({portable.pip_join_sql(d)}),
            g as ({portable.geo_pages_cte(d)})
            select j.url, j.polygon_id, {tile}
            from j join g on j.url = g.url
        """,
        "tile_assign": (
            f"with g as ({portable.geo_pages_cte(d)}) "
            f"select url, {tile} from g"
        ),
        "summary_aggregates": """
            select count(*) as cnt,
                   count(distinct l_returnflag) as cnt_distinct_rf,
                   round(sum(l_quantity), 4) as sum_qty,
                   round(avg(l_extendedprice), 4) as avg_price,
                   min(l_shipdate) as min_ship,
                   max(l_shipdate) as max_ship,
                   round(stddev_pop(l_discount), 8) as stddev_pop_disc,
                   round(stddev_samp(l_discount), 8) as stddev_samp_disc
            from lineitem
        """,
    }
