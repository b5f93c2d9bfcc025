"""ExecuteSQL compatibility shim — run OGR-SQL-dialect statements on
registered layers (GDALDataset::ExecuteSQL parity at the statement
level, gcore/gdaldataset.cpp:7383-7560).

Spark SQL is a strict superset of the OGR dialect (SURVEY §3.1: stages
3-5 of ExecuteSQL ≅ Catalyst parse/analyze/optimize), so the shim only
has to bridge the OGR-specific surface:

- special fields FID, OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA
  (ogr/ogr_p.h:167-174) → fid column / geometry-type literal / ST_ calls
  on the WKB geometry column;
- the OGR first-match JOIN rule is NOT rewritten here (a SQL-level
  rewrite of arbitrary joins is out of scope) — use
  queries.relational._join_first_match's dedup pattern for that
  semantics;
- everything else (WHERE op set, summary aggregates, DISTINCT,
  ORDER BY/LIMIT/OFFSET, UNION ALL) parses as-is.

Usage:
    execute_sql(spark, "select FID, OGR_GEOM_AREA from poly where ...",
                layers={"poly": polygons_df})
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions import register_st_functions

_SPECIAL = [
    # order matters: longest names first
    (re.compile(r"\bOGR_GEOM_WKT\b", re.IGNORECASE), "st_astext(geometry)"),
    (re.compile(r"\bOGR_GEOM_AREA\b", re.IGNORECASE), "st_area(geometry)"),
    (re.compile(r"\bOGR_GEOMETRY\b", re.IGNORECASE), "'POLYGON'"),
    (re.compile(r"\bFID\b", re.IGNORECASE), "fid"),
]


def rewrite(sql: str) -> str:
    """OGR special fields → engine expressions."""
    for pat, repl in _SPECIAL:
        sql = pat.sub(repl, sql)
    return sql


def execute_sql(
    spark: SparkSession,
    sql: str,
    layers: dict[str, DataFrame] | None = None,
    fid_col: str | None = None,
) -> DataFrame:
    """Register layers as views (adding a `fid` column from fid_col or a
    monotonically-increasing id if absent), rewrite special fields, run.
    """
    from pyspark.sql import functions as F

    register_st_functions(spark)
    for name, df in (layers or {}).items():
        if "fid" not in df.columns:
            if fid_col and fid_col in df.columns:
                df = df.withColumn("fid", F.col(fid_col))
            else:
                first = df.columns[0]
                df = df.withColumn("fid", F.col(first).cast("long"))
        df.createOrReplaceTempView(name)
    return spark.sql(rewrite(sql))
