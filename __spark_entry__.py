"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: spatial join (broadcast packed-R-tree +
                  ray-cast PIP refine) + XYZ tile assignment over pages
                  derived from sf0.001 documents.
queries()       — one callable per implemented operator (SURVEY.md §2),
                  aggregated from gdal_spark.queries.* modules.
oracle_sql()    — DuckDB-runnable ANSI SQL equivalents (same column
                  names/aliases so the driver's value-hash compare works).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from gdal_spark import queries as qreg
from gdal_spark.queries import spatial

_QUERIES, _ORACLES = qreg.collect()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return spatial.QUERIES["spatial_join_tiles"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
