"""Checkpoint / resume manifests with per-partition lineage + metrics.

North-rule contract: every long run is resumable from a checkpoint, with
per-partition lineage and row/byte metrics — the distributed analog of
the reference's `--resume` (skip tiles whose files exist,
apps/gdalalg_raster_tile.cpp:280) and of OGR transactions
(ogrlayer.cpp:2757-2891).

Implementation: a `_manifest` parquet table next to the partitioned
output (an Iceberg snapshot/manifest stand-in — the container has no
Iceberg runtime; the schema and anti-join contract are identical):

  run_id, <partition key cols>, n_rows, n_bytes, written_at

`write_partitioned` appends data partition-by-partition via Spark's
partitionBy writer, then appends one manifest row per partition value.
`resume_antijoin` drops input rows whose partition key already has a
manifest row — re-running a half-finished job redoes only missing
partitions.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest"


def manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def read_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    mp = manifest_path(path)
    if not os.path.exists(mp):
        return None
    return spark.read.parquet(mp)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    run_id: str | None = None,
) -> str:
    """Write `df` partitioned by `partition_cols` (+ manifest). Returns
    the run_id recorded in lineage."""
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    df.write.mode("append").partitionBy(*partition_cols).parquet(path)
    # per-partition metrics: row count + approximate byte size
    metrics = df.groupBy(*partition_cols).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.length(F.to_json(F.struct("*")))).alias("n_bytes"),
    )
    manifest = metrics.select(
        F.lit(run_id).alias("run_id"),
        *partition_cols,
        "n_rows",
        "n_bytes",
        F.lit(int(time.time())).alias("written_at"),
    )
    manifest.write.mode("append").parquet(manifest_path(path))
    return run_id


def resume_antijoin(
    df: DataFrame, path: str, partition_cols: list[str]
) -> DataFrame:
    """Rows of `df` whose partition is NOT yet in the manifest."""
    m = read_manifest(df.sparkSession, path)
    if m is None:
        return df
    return df.join(
        m.select(*partition_cols).distinct(), partition_cols, "left_anti"
    )


def resumable_write(
    df: DataFrame, path: str, partition_cols: list[str]
) -> tuple[str | None, int]:
    """One resumable step: write only missing partitions. Returns
    (run_id or None if nothing to do, rows written)."""
    todo = resume_antijoin(df, path, partition_cols)
    n = todo.count()
    if n == 0:
        return None, 0
    rid = write_partitioned(todo, path, partition_cols)
    return rid, n
