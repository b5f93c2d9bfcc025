"""Coverage-hygiene oracle queries (reference
apps/gdalalg_vector_check_geometry.cpp, …_simplify_coverage.cpp).

Fixtures derive deterministically from the nation table so DuckDB can
state the expected output in closed form:

- coverage_check_geometry: every third nation gets a bowtie ring, the
  rest unit squares — the per-region invalid count and error label are
  pure modulo arithmetic.
- coverage_simplify_arcs: per region, a strip coverage of unit
  rectangles (one per nation, x = rank) with a redundant midpoint on
  every vertical edge.  After simplify_coverage(tol=0.1,
  preserve_boundary=True) interior shared edges lose the midpoint and
  exterior edges keep it, so per-feature vertex counts and areas are
  closed-form: n_points = 4 + first_flag + last_flag, area = 1.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.geometry import wkb as W

QUERIES = {}
ORACLES = {}


def _nation_geoms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nationkey, n_regionkey, rank) with rank = position of the
    nation inside its region ordered by key."""
    from pyspark.sql.window import Window

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    return nat.select(
        "n_nationkey",
        "n_regionkey",
        (F.row_number().over(w) - 1).alias("rank"),
        F.count("*").over(Window.partitionBy("n_regionkey")).alias("n_in_region"),
    )


def _check_geometry_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.coverage import check_geometry

    base = _nation_geoms(spark, sf_dir)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, r in zip(pdf["n_nationkey"], pdf["n_regionkey"]):
                x0 = float(k) * 3.0
                if int(k) % 3 == 0:  # bowtie → Ring Self-intersection
                    ring = np.array(
                        [
                            [x0, 0], [x0 + 2, 2], [x0 + 2, 0],
                            [x0, 2], [x0, 0],
                        ],
                        dtype=np.float64,
                    )
                else:
                    ring = np.array(
                        [
                            [x0, 0], [x0 + 1, 0], [x0 + 1, 1],
                            [x0, 1], [x0, 0],
                        ],
                        dtype=np.float64,
                    )
                rows.append((int(k), int(r), W.polygon_to_wkb([ring])))
            yield pd.DataFrame(rows, columns=["id", "region", "wkb"])

    geoms = base.select("n_nationkey", "n_regionkey").mapInPandas(
        gen, "id long, region int, wkb binary"
    )
    report = check_geometry(geoms, id_col="id", geom_col="wkb")
    return (
        geoms.join(report, "id", "left")
        .groupBy(F.col("region").alias("n_regionkey"))
        .agg(
            F.count("error").alias("n_invalid"),
            F.count("*").alias("n_features"),
            F.max("error").alias("worst_error"),
            F.round(F.sum("x"), 6).alias("sum_err_x"),
        )
        .orderBy("n_regionkey")
    )


# bowtie crossing point is at (3k+1, 1): sum over invalid nations
ORACLES["coverage_check_geometry"] = """
select n_regionkey,
       count(case when n_nationkey % 3 = 0 then 1 end) as n_invalid,
       count(*) as n_features,
       max(case when n_nationkey % 3 = 0
                then 'Ring Self-intersection' end) as worst_error,
       round(cast(sum(case when n_nationkey % 3 = 0
                           then 3 * n_nationkey + 1 end) as double), 6)
         as sum_err_x
from nation group by n_regionkey order by n_regionkey
"""
QUERIES["coverage_check_geometry"] = _check_geometry_query


def _simplify_arcs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.coverage import simplify_coverage

    base = _nation_geoms(spark, sf_dir)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, r, rk in zip(
                pdf["n_nationkey"], pdf["n_regionkey"], pdf["rank"]
            ):
                x0 = float(rk)
                y0 = float(r) * 10.0  # separate regions vertically
                ring = np.array(
                    [
                        [x0, y0], [x0 + 1, y0],
                        [x0 + 1, y0 + 0.5],  # midpoint, right edge
                        [x0 + 1, y0 + 1], [x0, y0 + 1],
                        [x0, y0 + 0.5],  # midpoint, left edge
                        [x0, y0],
                    ],
                    dtype=np.float64,
                )
                rows.append((int(k), int(r), W.polygon_to_wkb([ring])))
            yield pd.DataFrame(rows, columns=["id", "region", "wkb"])

    geoms = base.select("n_nationkey", "n_regionkey", "rank").mapInPandas(
        gen, "id long, region int, wkb binary"
    )
    simp = simplify_coverage(
        geoms, id_col="id", geom_col="wkb",
        tolerance=0.1, preserve_boundary=True,
    )
    return (
        simp.join(base, simp["id"] == base["n_nationkey"])
        .select(
            F.col("id").alias("n_nationkey"),
            "n_regionkey",
            "n_points",
            F.round("area", 6).alias("area"),
        )
        .orderBy("n_nationkey")
    )


# exterior vertical edges (rank 0 left, rank n-1 right) keep their
# midpoint under preserve_boundary; interior shared edges drop it
ORACLES["coverage_simplify_arcs"] = """
with ranked as (
  select n_nationkey, n_regionkey,
         row_number() over (partition by n_regionkey
                            order by n_nationkey) - 1 as rank,
         count(*) over (partition by n_regionkey) as n_in_region
  from nation
)
select n_nationkey, n_regionkey,
       4 + (case when rank = 0 then 1 else 0 end)
         + (case when rank = n_in_region - 1 then 1 else 0 end)
         as n_points,
       round(cast(1.0 as double), 6) as area
from ranked order by n_nationkey
"""
QUERIES["coverage_simplify_arcs"] = _simplify_arcs_query
