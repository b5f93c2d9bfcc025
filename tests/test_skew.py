"""Skew-handling operator tests over the deliberately skewed geocode."""

import pytest
from pyspark.sql import functions as F

from gdal_spark import tables
from gdal_spark.operators import skew

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def gp(spark):
    return tables.geo_pages(spark, SF).select("url", "city_id").persist()


def test_geocode_is_skewed(gp):
    counts = {r.city_id: r["count"] for r in gp.groupBy("city_id").count().collect()}
    total = sum(counts.values())
    assert max(counts.values()) / total > 0.07  # hottest city ~10%
    # high cities carry ~10x the weight of low ones ((2c+1)/400 law)
    assert counts[19] > 3 * counts.get(0, 1)


def test_salted_agg_matches_direct(gp):
    direct = {
        r.city_id: r["count"]
        for r in gp.groupBy("city_id").count().collect()
    }
    salted = {
        r.city_id: r.cnt
        for r in skew.salted_agg(gp, "city_id", "url", salt_n=8).collect()
    }
    assert salted == direct


def test_salted_repartition_spreads_hot_key(gp):
    spark = gp.sparkSession
    # AQE would coalesce these KB-sized partitions and hide the layout
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # naive repartition by key: the hot key lands in ONE partition
        naive = gp.repartition(32, "city_id")
        hot_per_part_naive = (
            naive.where("city_id = 19")
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert hot_per_part_naive == 1
        salted = skew.salted_repartition(gp, "city_id", "url", salt_n=8)
        hot_parts = (
            salted.where("city_id = 19")
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert hot_parts >= 4  # hot city spread over ~salt_n partitions
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def test_balanced_repartition(gp):
    gp.sparkSession.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "false"
    )
    out = skew.balanced_repartition(gp, "city_id", n_buckets=4)
    assert out.count() == gp.count()  # no row loss
    # bin-packing contract: bucket row counts within 1.5x of each other
    # (physical partition mapping is best-effort range partitioning;
    # a writer uses partitionBy(_bucket) for exact placement)
    sizes = [r["count"] for r in out.groupBy("_bucket").count().collect()]
    assert len(sizes) == 4
    assert max(sizes) <= 1.5 * min(sizes)
    gp.sparkSession.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
