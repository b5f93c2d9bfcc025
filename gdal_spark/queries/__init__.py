"""Query registry — one module per operator family from SURVEY.md §2.

Each module exposes
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[str, str]    # DuckDB-runnable ANSI SQL, same column names

__spark_entry__ aggregates them for the driver's correctness gate.
Queries without an ORACLES entry get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops such as geometry
clipping and raster kernels, which are pinned by pytest goldens instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    from gdal_spark.queries import (
        events,
        knn,
        raster,
        relational,
        similarity,
        spatial,
        textops,
        vector,
    )

    modules = [
        spatial,
        relational,
        events,
        textops,
        knn,
        similarity,
        vector,
        raster,
    ]
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        for k in m.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query name {k}")
        queries.update(m.QUERIES)
        oracles.update(getattr(m, "ORACLES", {}))
    return queries, oracles
