"""Structured-streaming ingest of crawl pages → cell/tile assignment.

The reference has NO streaming subsystem (SURVEY §2.12); parity needs
batch only. This module is the forward-looking incremental-crawl path:
the same deterministic geocode + tile-math expressions run unchanged
under readStream, with a `warc_ts` watermark for late data and windowed
per-tile counts as the stateful example.

All transformations are the identical pure-SQL fragments used in batch
(gdal_spark.portable) — one logical plan, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import portable


def stage_page_files(spark: SparkSession, path: str, n: int = 1000) -> None:
    """Write a deterministic batch of page rows as the file-stream inbox
    (stands in for a crawl drop directory / Kafka topic)."""
    spark.range(n).selectExpr(
        "concat('https://src', cast(id % 20 as string), "
        "'.example/', cast(id as string)) as url",
        "timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,"
        "cast(id as int)) as warc_ts",
        "concat('doc text ', cast(id as string)) as text",
        "case cast(id % 5 as int) when 0 then 'de' when 1 then 'en' "
        "when 2 then 'es' when 3 then 'fr' else 'zh' end as lang",
    ).write.mode("overwrite").parquet(path)


def synthetic_page_stream(spark: SparkSession, path: str) -> DataFrame:
    """File source → pages(url, warc_ts, text, lang): incremental crawl
    ingest (new files in `path` become new micro-batches)."""
    schema = "url string, warc_ts timestamp, text string, lang string"
    return spark.readStream.schema(schema).parquet(path)


def geocode_and_tile(pages: DataFrame, zoom: int = 12) -> DataFrame:
    """Attach deterministic geocode + XYZ tile columns (works on batch
    AND streaming DataFrames — pure Catalyst expressions)."""
    return pages.selectExpr(
        "url",
        "warc_ts",
        *portable.geocode_cols_list("spark"),
    ).selectExpr(
        "url",
        "warc_ts",
        "city_id",
        "lat",
        "lon",
        *portable.tile_cols_list("lat", "lon", zoom),
    )


def windowed_tile_counts(
    tiled: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Late-data-tolerant per-tile page counts (event-time window on
    warc_ts + watermark) — the streaming rollup a live crawl monitor
    would run."""
    return (
        tiled.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            "tile_x",
            "tile_y",
        )
        .agg(F.count("*").alias("n_pages"))
        .select("w.start", "w.end", "tile_x", "tile_y", "n_pages")
    )


def run_ingest_once(spark: SparkSession, path: str, n: int = 1000) -> int:
    """availableNow micro-batch run into a memory sink; returns rows
    observed. Used by tests and as the smoke for the streaming path."""
    stage_page_files(spark, path, n)
    pages = synthetic_page_stream(spark, path)
    tiled = geocode_and_tile(pages)
    q = (
        tiled.writeStream.format("memory")
        .queryName("stream_tiles")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("stream_tiles").count()


def sessionize_stream(
    pages: DataFrame, gap_seconds: int = 30
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-host
    gap-based crawl sessions (a session = consecutive fetches from one
    source host with < gap_seconds between them). The shape Structured
    Streaming's built-in windows can't express — session boundaries
    depend on data, not the clock grid. State per host = (start, last,
    n) of the open session; closed sessions emit as rows, the open one
    emits on processing-time timeout.

    Columns in: url, warc_ts. Out: (host, session_start, session_end,
    n_pages)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    import pandas as pd

    out_schema = (
        "host string, session_start timestamp, session_end timestamp, "
        "n_pages long"
    )
    state_schema = "start long, last long, n long"
    gap = gap_seconds

    def fn(key, pdfs, state):
        host = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n = state.get
                closed.append((host, s0, s1, n))
                state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(
                    int(v.value // 10**9)
                    for v in pd.to_datetime(pdf["warc_ts"])
                )
            ts.sort()
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for t in ts:
                if cur is None:
                    cur = [t, t, 0]
                elif t - cur[1] > gap:
                    closed.append((host, cur[0], cur[1], cur[2]))
                    cur = [t, t, 0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(gap * 1000)
        out = pd.DataFrame(
            closed, columns=["host", "s0", "s1", "n_pages"]
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out.pop("s0"), unit="s")
            out["session_end"] = pd.to_datetime(out.pop("s1"), unit="s")
        else:
            out = pd.DataFrame(
                columns=["host", "n_pages", "session_start", "session_end"]
            )
        yield out[["host", "session_start", "session_end", "n_pages"]]

    hosts = pages.select(
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("host"),
        "warc_ts",
    )
    return hosts.groupBy("host").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_stream(
    pages: DataFrame,
    key: str = "text",
    watermark: str = "30 seconds",
    hasher: str = "fast",
) -> DataFrame:
    """Streaming exact dedup: drop re-crawled pages whose content
    fingerprint was already emitted within the watermark horizon — the
    incremental analog of operators/dedup.dedup_exact for a live crawl.

    dropDuplicatesWithinWatermark is the scale-correct construct: the
    dedup state holds O(distinct fingerprints per watermark window) and
    is evicted by event time, so an unbounded stream never accumulates
    unbounded state (a plain dropDuplicates on a stream would).  The
    fingerprint defaults to xxhash64 (JVM intrinsic, same "fast" hasher
    contract as the batch dedup family; pass hasher="portable" for the
    md5-derived oracle-parity hash)."""
    from gdal_spark.operators.dedup import H64

    fp = pages.withColumn("fp", H64(key, hasher))
    return fp.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def windowed_hex_counts(
    pages: DataFrame,
    size: float = 100000.0,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Late-data-tolerant per-HEX-CELL page counts — the north rule's
    H3-style binning under structured streaming. The cube-round cell
    math is the IDENTICAL SQL text the batch hex_density query and the
    hex spatial join run (portable.hex_cells_sql over a temp view —
    Spark temp views compose with streaming DataFrames), so batch and
    stream share one logical definition."""
    spark = pages.sparkSession
    g = pages.selectExpr(
        "url", "warc_ts", *portable.geocode_cols_list("spark")
    )
    g.createOrReplaceTempView("_stream_geo_pages")
    hexed = spark.sql(
        portable.hex_cells_sql(
            "select * from _stream_geo_pages",
            size,
            cols=("url", "warc_ts"),
        )
    )
    return (
        hexed.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            "hex_q",
            "hex_r",
        )
        .agg(F.count("*").alias("n_pages"))
        .select("w.start", "w.end", "hex_q", "hex_r", "n_pages")
    )


def spatial_join_stream(pages: DataFrame, zoom: int = 12) -> DataFrame:
    """The FLAGSHIP north-rule pipeline — deterministic geocode → XYZ
    tile assignment → broadcast packed-R-tree point-in-polygon join —
    as a stream-static join under structured streaming.

    `broadcast_pip_join` is a stateless mapInPandas over a
    driver-broadcast polygon payload, so it runs unchanged per
    micro-batch (append mode, no state store): the identical physical
    strategy as the batch flagship in `__spark_entry__.entry`, which is
    the point — one operator definition, two execution modes. At scale
    the static side is the broadcast polygon layer (rebuilt only on
    stream restart) and the stream side never shuffles.
    """
    from gdal_spark import tables
    from gdal_spark.operators.spatial_join import broadcast_pip_join

    return broadcast_pip_join(geocode_and_tile(pages, zoom), tables.polygons_local())


def stream_to_table(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    stream_id: str = "stream",
):
    """Exactly-once streaming sink into the transactional manifest
    table (operators.checkpoint): each micro-batch publishes through a
    Transaction whose txn_id is DETERMINISTIC in (stream_id, batch_id),
    so a replayed micro-batch (failure after commit but before the
    stream checkpoint advanced — Spark's foreachBatch is only
    at-least-once) finds its own run_id already in the manifest and
    short-circuits. Readers only ever see whole committed batches
    (read_committed); a mid-write failure rolls the staging dir back
    and the manifest is untouched.

    Returns the configured DataStreamWriter — caller picks the trigger
    and calls .start().
    """
    from gdal_spark.operators import checkpoint as CP

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rid = f"{stream_id}-{int(batch_id):08d}"
        m = CP.read_manifest(spark, path)
        if (
            m is not None
            and m.where(F.col("run_id") == rid).limit(1).count() > 0
        ):  # bounded-metadata: manifest probe, one partition row at most
            return  # replayed batch already published — exactly-once
        txn = CP.Transaction(spark, path, txn_id=rid)
        try:
            txn.write(batch_df, partition_cols)
        except BaseException:
            txn.rollback()
            raise
        txn.commit()

    return stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )


def near_dup_stream(
    pages: DataFrame,
    bits: int = 16,
    watermark: str = "30 seconds",
    hasher: str = "portable",
) -> DataFrame:
    """Streaming near-duplicate suppression: doc-local SimHash (the
    map-side zero-shuffle formulation, bit-identical to the batch
    dedup_simhash signature) + ONE watermark-bounded stateful op that
    keeps the first-arriving page per signature. State size = distinct
    signatures inside the lateness horizon, never the stream's history
    — the streaming analog of dedup_simhash's exact-signature match."""
    from gdal_spark.operators.dedup import simhash_cols

    sig = simhash_cols(pages, bits=bits, text_col="text", hasher=hasher)
    return sig.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["simhash"]
    )


def decontaminate_stream(
    pages: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    num_perm: int = 16,
    rows_per_band: int = 2,
    hasher: str = "portable",
) -> DataFrame:
    """Streaming fuzzy decontamination: drop incoming pages whose
    MinHash signature band-collides with a STATIC benchmark set, at
    ingest time — before contaminated pages ever reach the corpus.
    Stateless end-to-end: map-side band keys (minhash_band_keys) + one
    broadcast stream-static join against the single-row benchmark key
    set, so it costs no streaming state and composes with any
    downstream stateful op. Returns only clean pages, schema
    unchanged; batch-identical to filtering webtext.lsh_decontaminate
    (same operator, pinned by pytest parity)."""
    from gdal_spark.operators.webtext import lsh_decontaminate

    out = lsh_decontaminate(
        pages,
        benchmark,
        k=k,
        num_perm=num_perm,
        rows_per_band=rows_per_band,
        text_col="text",
        hasher=hasher,
    )
    return out.where(~F.col("contaminated")).select(*pages.columns)
