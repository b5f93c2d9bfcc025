"""SparkSession factory tuned for the engine.

Scale notes (100 TB / 1000-executor design intent, tested on local[N]):
- AQE on: runtime coalescing + skew-join splitting replace the reference's
  fixed 64 MiB warp chunking (alg/gdalwarpoperation.cpp:611) and its
  spawn-by-tile-range sharding (apps/gdalalg_raster_tile.cpp:96-120).
- Arrow batch size 65536 matches OGR's MAX_FEATURES_IN_BATCH
  (ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:2687) — the unit of work for
  every vectorized kernel.
- shuffle.partitions defaults to 2×cores locally; on a real cluster set it
  to ~2-3× total executor cores (or rely on AQE coalescing from a high
  initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 65536  # parity: OGR MAX_FEATURES_IN_BATCH


def get_spark(
    app_name: str = "gdal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("GDAL_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(2 * n, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("GDAL_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
