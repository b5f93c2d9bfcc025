"""Benchmark harness — prints ONE JSON line per run.

Headline metric (BASELINE.json): spatial-join + tile-assignment
throughput in pages/sec at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The timed region is
exactly the metric: Catalyst tile math + broadcast-R-tree ray-cast PIP
join over a cached (url, lat, lon) input (pages amplified
$GDAL_SPARK_BENCH_AMPLIFY× with salted urls so geocodes differ).

Also reports wall time for one representative query per operator family
(SURVEY §2) at the same scale factor.

Scaling-efficiency evidence (north rule, sandbox proxy — no real
cluster): tools/bench_scaling.py runs this headline at N and 4N cores
in one process and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gdal_spark.session import get_spark  # noqa: E402

# one representative per family (name -> sf-appropriate at sf0.1)
BENCH_QUERIES = [
    "spatial_join_tiles",      # flagship family (also headline below)
    "spatial_join_hex",        # r5 hex-cell (H3-style) zero-Python strategy
    "spatial_join_sql",        # pure-Catalyst strategy
    "tile_assign",             # tile math only
    "tile_assign_geodetic",    # r5 WorldCRS84Quad scheme (linear math)
    "spatial_sort_strtree",    # r5 STR leaf-order sort
    "dbscan_pages",            # r5g density clustering (cell join + CC;
    #   wall is CC round-latency at fixture scale, like dedup_cluster)
    "groupby_agg",             # relational / aggregation
    "join_first_match",        # OGR join semantics
    "text_stats",              # text analysis
    "dedup_minhash_lsh",       # MinHash + LSH near-dup
    "dedup_simhash",           # SimHash
    "simhash_hamming_pairs",   # r5g Manku Hamming<=k block-probe near-dup
    "vocab_kmv",               # r5g KMV distinct sketch (map-only partials)
    "embedding_gram",          # r5g fixed-point Gram (Arrow int matmul)
    "dedup_cluster_canonical", # r4b end-to-end near-dup resolution
    "dedup_incremental",       # r5c batch-vs-corpus-index probe (no self-join)
    "semdedup",                # r5c semantic dedup (includes Lloyd training)
    "boilerplate_removal",     # r4 web-curation (line-level pipeline)
    "lm_perplexity",           # r5b CCNet bigram-LM quality filter
    "bpe_encode",              # r5b BPE tokenizer apply (pure map)
    "remove_dup_spans",        # r5 exact-substring dup removal (Lee et al.)
    "dsir_select",             # r5d DSIR importance-resampling selection
    "c4_filter",               # r5d C4 cleaning rule set (pure map)
    "bm25_topk",               # r5d lexical retrieval (Okapi BM25)
    "hybrid_rrf",              # r5g BM25+cosine reciprocal-rank fusion
    "curation_pipeline",       # r5g composed gates->dedup stage sequence
    "link_pagerank",           # r5d link-graph PageRank (iterative joins)
    "ngram_novelty",           # r5e k-gram first-occurrence novelty
    "kn_perplexity",           # r5e Kneser-Ney LM scoring
    "winnow_overlap",          # r5e MOSS pairs over winnowed fingerprints
    "chunk_overlap",           # r5 sliding-window chunking (pure map)
    "knn_centers",             # kNN re-rank
    "ann_cosine_topk",         # similarity search
    "ann_pq_topk",             # r5 PQ/ADC compressed-scan ANN
    "layer_intersection_area", # layer algebra / clipping
    "raster_zonal_stats",      # raster↔vector aggregation
    "raster_clip_cutline",     # r5g cutline mask (envelope fast path)
    "raster_tile_pyramid",     # tile pyramid (z8→z6)
    "raster_overview_refresh", # r5f incremental overview maintenance
    "vector_reproject_merc",   # r5f zero-shuffle CRS transform
    "spatial_sort_morton",     # clustering key + range partition
]


def headline(spark, sf_dir: str, cpus: int, amplify: int | None = None) -> dict:
    """Flagship throughput: tile math + broadcast-R-tree PIP join of
    amplified pages against the DENSE bench polygon layer (1280 small
    octagons — realistic per-page filter/refine work; the 25-row
    correctness layer is too cheap to measure)."""
    from gdal_spark import portable, tables
    from gdal_spark.operators.spatial_join import broadcast_pip_join

    if amplify is None:
        # steady-state sizing: at 256× (1.28M pages) the ~1s of fixed job
        # overhead is ~half the wall and the metric measures startup, not
        # throughput; 2048× (10.24M pages) amortizes it — the same
        # methodology tools/bench_scaling.py already uses (4096×)
        amplify = int(os.environ.get("GDAL_SPARK_BENCH_AMPLIFY", "2048"))
    tables.register_views(spark, sf_dir)
    base = (
        spark.sql(
            f"""
            select concat(url, '#', rep.r) as url,
                   {portable.geocode_cols('spark', "concat(url, '#', rep.r)")}
            from pages
            cross join (select explode(sequence(1, {amplify})) as r) rep
            """
        )
        .select("url", "lat", "lon")
        .repartition(cpus * 2)
        .persist()
    )
    n_pages = base.count()
    polys = tables.bench_polygons_local()
    tiled = base.selectExpr(
        "url", "lat", "lon", *portable.tile_cols_list("lat", "lon", 12)
    )
    # warm python workers / codegen on a slice, then measure the full
    # set twice and keep the best: this host is SHARED and co-tenant
    # interference is one-sided (only ever slows a run down), so max
    # over repeats estimates uncontended throughput — same documented
    # estimator as tools/bench_scaling.py
    broadcast_pip_join(tiled.limit(cpus * 20000), polys).count()
    dt = float("inf")
    rows = 0
    for _ in range(3):
        t0 = time.time()
        rows = broadcast_pip_join(tiled, polys).count()
        dt = min(dt, time.time() - t0)
    base.unpersist()
    return {
        "n_pages": n_pages,
        "join_rows": rows,
        "join_sec": round(dt, 3),
        "pages_per_sec": round(n_pages / dt, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="gdal_spark_bench", master=f"local[{cpus}]")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    times: dict[str, float] = {}
    # One throwaway action warms the 32 python workers (pandas/pyarrow
    # import, Arrow serializer init) so the FIRST measured query isn't
    # charged the whole session warmup; then best-of-2 per query — the
    # same one-sided-noise estimator the headline and
    # tools/bench_scaling.py document (co-tenant interference only ever
    # slows a run down).
    queries["spatial_join_tiles"](spark, sf_dir).limit(1).count()
    for name in BENCH_QUERIES:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    h = headline(spark, sf_dir, cpus)
    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assign_throughput",
                "value": h["pages_per_sec"],
                "unit": "pages/sec",
                "queries": times,
                "sf": sf_dir,
                "cpus": cpus,
                # frozen estimator (VERDICT r3 #9): round-over-round
                # deltas are comparable only under the same methodology
                "methodology": {
                    "amplify": int(
                        os.environ.get("GDAL_SPARK_BENCH_AMPLIFY", "2048")
                    ),
                    "headline_estimator": "warm-best-of-3",
                    "per_query_estimator": "warm-best-of-2",
                },
                **h,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
