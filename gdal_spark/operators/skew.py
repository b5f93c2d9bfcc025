"""Explicit skew handling — salted cell keys + cell-count-balanced
repartitioning (north rule; SURVEY §7.3 "hot cells: big cities").

The deterministic geocode is deliberately skewed (hottest city ≈ 10% of
pages), standing in for real-world hot H3 cells. Three tools:

- salted_agg: two-level aggregation — groupBy(key, salt) partial then
  groupBy(key) final. Caps any single reducer's share of a hot key at
  1/salt_n. Salt is hash-derived from a row id column → deterministic.
- salted_repartition: spread a hot key over salt_n partitions for
  downstream per-partition work (e.g. a hot cell's PIP refine).
- balanced_repartition: first-pass key histogram → greedy driver-side
  bin packing of keys into equal-row buckets → repartition by the
  broadcast-mapped bucket id. This is the "cell-count-balanced
  repartitioning from a first-pass cell histogram" of SURVEY §7.3.

AQE's skewJoin splitting (spark.sql.adaptive.skewJoin.enabled, on in
gdal_spark.session) covers the sort-merge-join case automatically; these
operators cover aggregation and explicit-partitioning cases AQE cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, salt_n: int) -> DataFrame:
    """Deterministic salt column in [0, salt_n) from a row-id column."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n))
    )


def salted_repartition(
    df: DataFrame, key_col: str, id_col: str, salt_n: int = 16
) -> DataFrame:
    """Repartition by (key, salt): a key holding p% of rows occupies
    ~salt_n partitions instead of melting one reducer."""
    return with_salt(df, id_col, salt_n).repartition(key_col, "_salt")


def salted_agg(
    df: DataFrame,
    key_col: str,
    id_col: str,
    salt_n: int = 16,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Skew-safe aggregation: count/sum aggregates computed per
    (key, salt) then merged per key. aggs maps output name → input
    column for sum; count(*) is always included as `cnt`."""
    aggs = aggs or {}
    salted = with_salt(df, id_col, salt_n)
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("cnt"),
        *[F.sum(src).alias(name) for name, src in aggs.items()],
    )
    return partial.groupBy(key_col).agg(
        F.sum("cnt").alias("cnt"),
        *[F.sum(name).alias(name) for name in aggs],
    )


def key_histogram(df: DataFrame, key_col: str) -> list[tuple[int, int]]:
    """First-pass (key, count) histogram, collected to the driver
    (|keys| is small relative to rows — cells, cities, tiles)."""
    rows = df.groupBy(key_col).count().collect()  # bounded-metadata: key histogram
    return [(r[key_col], r["count"]) for r in rows]


def balanced_repartition(
    df: DataFrame, key_col: str, n_buckets: int
) -> DataFrame:
    """Greedy bin-pack keys into n_buckets by row count, then
    repartition by the bucket id (broadcast map join). Rows of one key
    stay together (unlike salting) but buckets carry ~equal rows."""
    hist = sorted(key_histogram(df, key_col), key=lambda kv: -kv[1])
    loads = [0] * n_buckets
    assign = []
    for k, c in hist:
        b = loads.index(min(loads))
        loads[b] += c
        assign.append((k, b))
    spark = df.sparkSession
    amap = spark.createDataFrame(assign, f"{key_col} int, _bucket int")
    # range (not hash) partitioning: bucket ids are dense 0..n-1, so the
    # range partitioner maps them 1:1 onto partitions — hash would
    # collide buckets and undo the balancing
    return (
        df.join(F.broadcast(amap), key_col)
        .repartitionByRange(n_buckets, "_bucket")
    )
