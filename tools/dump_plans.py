"""Regenerate PLANS.md — formatted physical plans of the headline
queries with scale commentary (the `.explain` evidence the 100 TB
design claims rest on). Run after changing any operator's plan shape.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from gdal_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

NOTES = {
    "spatial_join_tiles": (
        "Flagship. ONE narrow MapInPandas over the page scan — no Exchange "
        "anywhere: the polygon layer travels as a broadcast variable "
        "(packed R-tree), tile math is codegen'd column arithmetic. "
        "Scales with executors; nothing shuffles."
    ),
    "spatial_join_sql": (
        "Pure-Catalyst strategy: BroadcastNestedLoopJoin on the bbox range "
        "predicate, then a hash aggregate for the crossing parity. Zero "
        "Python; whole-stage codegen end to end."
    ),
    "dedup_minhash_lsh": (
        "The ENTIRE signature phase is one map stage (minhash_bands: "
        "shingle array → ONE base md5 per shingle → num_perm affine "
        "mixes (a_i*h+b_i) mod 2^61-1 → band sigs, all higher-order "
        "array functions) — the corpus is scanned once and first "
        "shuffles at the band self-join. The hot-bucket cap is a window "
        "count over exactly the self-join key, so cap + both join sides "
        "share one exchange — the reuse appears in the FINAL adaptive "
        "plan (ReusedExchange after execution; the static tree below is "
        "pre-AQE-materialization). Exact-Jaccard verify joins the small "
        "pair set back to the corpus's shingle ARRAYS "
        "(size(array_intersect)) — under AQE the pair side broadcasts, "
        "so verification is map-side scans. The band self-join is the "
        "ONLY corpus shuffle the OPERATOR adds; volume O(docs), never "
        "O(tokens). (The fixture corpus itself is rebalanced once at "
        "load — the testdata parquet is a single row group = 2 scan "
        "splits; on a real table the scan supplies the splits and that "
        "exchange disappears.)"
    ),
    "groupby_agg": (
        "Standard two-phase aggregate: partial_sum/partial_count before "
        "the exchange."
    ),
    "knn_centers": (
        "25-row target layer broadcast (BroadcastNestedLoopJoin), window "
        "re-rank shuffles only (url, k) candidates."
    ),
    "where_ops": (
        "Filter + projection fully pushed: PushedFilters reach the parquet "
        "scan, ReadSchema is pruned to referenced columns."
    ),
    "raster_viewshed": (
        "The per-ray dependency chain of the reference's viewshed sweep "
        "becomes ONE hash-partitioned window (sector key): pixel math is "
        "codegen'd column arithmetic, the only exchange is "
        "hashpartitioning(sector), and the running-max is a RANGE-framed "
        "window — no Python at all in the visibility math. r3: blocks "
        "outside the observer's max_dist disc are pruned by a Catalyst "
        "Filter over the 6-number geotransform metadata BEFORE any pixel "
        "row exists (los.roi_blocks), so the fan-out is "
        "O(max_dist²/pixel_area), not O(raster)."
    ),
    "ann_ivf_topk": (
        "IVF search phase: broadcast codebook assignment (mapInPandas), "
        "k derived ≈ √N (ivf_default_k), candidate generation is a "
        "SALTED equi-join on (cell id, _salt) — a hot cell spreads over "
        "salt_n reducers instead of melting one — exact cosine only on "
        "the probed buckets, final top-k is a window over qid."
    ),
    "spatial_join_hex": (
        "r5 north-rule strategy: H3-style axial hex cells key the "
        "candidates — the cube-round cell math is the SAME codegen'd "
        "SQL text as hex_density, the cover (hex_q, hex_r, polygon_id, "
        "bbox) and edge tables are broadcast, envelope-reject kills the "
        "cover margin's false candidates before any edge row (the "
        "reference's 3-stage contract), and the refine is the even-odd "
        "parity HashAggregate. ZERO Python evaluation nodes anywhere "
        "(pytest-pinned), no corpus shuffle before the final parity "
        "aggregate. The Generate node below the hex projection is a "
        "deliberate collapse barrier: the fixture's 20-branch geocode "
        "CASE would otherwise inline into every cube-round reference "
        "and blow janino's 64 KB method limit (codegen falls back to "
        "interpreted, 4x slower — measured 7.4 s -> 1.8 s at sf0.1). "
        "The cover's ±2 margin is provable and the oracle is the exact "
        "PIP SQL, so under-cover would fail the value hash."
    ),
    "ann_pq_topk": (
        "r5 PQ/ADC compressed-scan ANN (the billion-vector path: 64 "
        "floats → m=4 codes). Search is ONE MapInPandas over the corpus "
        "scan — codebooks and the per-query distance LUT travel as a "
        "broadcast variable, each partition emits only its top-k "
        "survivors "
        "— so the single Exchange in the plan is the nq×k×partitions "
        "candidate set feeding the window re-rank, identical to "
        "cosine_topk's scale shape. Training shuffles once per Lloyd "
        "iteration on (sub, code, pos) with map-side partial sums; the "
        "driver sees m·ksub codeword rows, never vectors."
    ),
    "st_predicates": (
        "No nested-loop predicate evaluation: both layers explode their "
        "bbox cell cover, candidates come from the cell equi-join, and "
        "the false matrix rows are restored by a broadcast id left join."
    ),
    "boilerplate_removal": (
        "r4 web-curation family. The boilerplate dictionary (lines with "
        "df >= min_df) is the ONLY thing that shuffles twice — and it is "
        "tiny, so the corpus side meets it in a BroadcastHashJoin "
        "LeftAnti with NO Exchange between the parquet scan and the "
        "join; the single corpus-wide shuffle is the final groupBy(doc) "
        "reassembly. At 100 TB the crawl is read once, filtered "
        "in-place, shuffled once."
    ),
    "dedup_cluster_canonical": (
        "r4b end-to-end near-dup resolution. MinHash pairs feed the "
        "pointer-jumping component solver: each round is a linear "
        "hash-join + partial_min aggregate over a PERSISTED symmetric "
        "edge set, and the loop runs ONLY over paired nodes — state "
        "O(dup pairs), not O(corpus); singletons return via one final "
        "left join. No driver union-find, no quadratic pair blow-up "
        "(band buckets capped upstream)."
    ),
    "decontaminate": (
        "r4b. The benchmark gram dictionary (distinct 13-gram hashes of "
        "the held-out set) is aggregated once and BROADCAST; the corpus "
        "side shingles map-locally and meets it in a BroadcastHashJoin — "
        "the 100 TB side never shuffles on content. Per-doc hit counts "
        "are a map-side-combined HashAggregate; the flag join back to "
        "docs is a linear id join (AQE picks broadcast vs shuffle by "
        "the hit-set's real size)."
    ),
    "pack_sequences": (
        "r4b. ONE Exchange — hashpartitioning(part) for the per-shard "
        "window cumulative sum — then codegen'd integer division for "
        "the bin id. Never a global order-by: 10^6 shard streams pack "
        "independently. (The trailing Sort is the query's presentation "
        "orderBy, not the operator.)"
    ),
    "sample_stratified": (
        "r4b. The domain-rate table is built by one small distinct "
        "aggregate and BROADCAST; the corpus side is Scan → "
        "BroadcastHashJoin → codegen'd md5-gate Filter — zero corpus "
        "shuffle, deterministic under retry/resume."
    ),
    "dup_ngram_spans": (
        "r4b exact-substring dup signal. Shingle windows are map-local "
        "array ops; gram document frequency is a map-side-combined "
        "aggregate on the 8-byte hash; the join back is linear on gh "
        "(Catalyst broadcasts the dictionary at toy scale, "
        "sort-merge-joins it at corpus scale — size-based, not "
        "hand-forced). 3 shuffles, O(tokens), no pair enumeration."
    ),
    "coverage_simplify_arcs": (
        "r4 coverage-hygiene family. Shared-arc decomposition: segment "
        "explode is map-side, owner-sets resolve in ONE hash aggregate "
        "on the canonical segment key, junctions in one more on the "
        "vertex key; the VW simplify runs per owner-set group "
        "(applyInPandas) whose size is bounded by a single feature "
        "pair's boundary — never by table size — and ring reassembly "
        "is a groupBy(fid). 4 shuffles total, all O(segments), no "
        "driver geometry."
    ),
    "tile_assign_geodetic": (
        "r5 WorldCRS84Quad tiling scheme. Pure map: the plate-carree "
        "tile math is linear column arithmetic (no trig), fully inside "
        "WholeStageCodegen over the page scan — zero Exchange, zero "
        "Python; identical plan shape to the mercator assign but with "
        "a cheaper expression tree."
    ),
    "spatial_sort_strtree": (
        "r5 STR leaf-order sort. One unpartitioned window for the "
        "global x-rank (the documented single-node stage at fixture "
        "scale — at 100 TB this becomes repartitionByRange(lon) + "
        "partition-local ranks with broadcast offsets, semantics "
        "identical), then repartitionByRange(leaf_pos) + "
        "sortWithinPartitions so the persisted layout IS the packed "
        "tree's leaf order."
    ),
    "lm_perplexity": (
        "r5b CCNet model-based quality filter. Bigram explode is "
        "map-local (transform over the token array); LM training is two "
        "map-side-combined HashAggregates on gram keys; scoring meets "
        "the LM and the vocab-sized context table in size-checked "
        "BroadcastHashJoins (shuffle-hash fallback above the cap — the "
        "'<s>' context would be a per-doc hot key in a shuffled join, "
        "so the context side broadcasting is the skew guard); the "
        "per-doc cross-entropy is one partial-agg'd DECIMAL sum. The "
        "tercile ntile is the documented fixture-scale stage — "
        "production applies precomputed sample thresholds map-side "
        "(the CCNet protocol)."
    ),
    "tfidf_terms": (
        "r5b keyword extraction. tf = one map-side-combined aggregate "
        "on (doc, term); df derives from tf (vocab-sized, never "
        "re-reads the corpus) and comes back via a size-checked "
        "broadcast; the top-k window shuffles once on doc_id with "
        "per-doc state bounded by the doc's distinct-term count."
    ),
    "bpe_encode": (
        "r5b tokenizer apply. The whole encoder is ONE codegen'd "
        "projection: per-word nested `replace` chain over the "
        "pipe-wrapped representation (merge list constant-folded into "
        "the expression) — zero Python, scales as a pure map over the "
        "crawl. (The trailing Sort/Exchange is the query's presentation "
        "orderBy, not the operator.)"
    ),
    "raster_tile_pyramid_geodetic": (
        "r5 geodetic pyramid: same cover-shuffle + applyInPandas warp "
        "+ 4→1 reduce plan as the mercator pyramid — only the "
        "coordinate expressions differ (linear plate-carree instead of "
        "inverse web-mercator), so the per-tile kernel is strictly "
        "cheaper. ONE shuffle per level keyed (band,z,x,y)."
    ),
    "lsh_decontaminate": (
        "r5c fuzzy decontamination. BOTH sides' LSH band keys are "
        "computed entirely map-side (minhash_band_keys — a stateless "
        "projection, hence the streaming variant); the benchmark key "
        "set collapses to ONE broadcast row and the corpus-side probe "
        "is a map-local array_intersect under a "
        "BroadcastNestedLoopJoin of a single row — the 100 TB corpus "
        "NEVER shuffles, nothing joins on a per-doc key."
    ),
    "dedup_incremental": (
        "r5c daily-ingest dedup: the batch's distinct (band, sig) probe "
        "keys BROADCAST against the corpus index scan, so the corpus is "
        "filtered to colliding rows map-side and never shuffles or "
        "self-joins; the hot-bucket cap window and the candidate join "
        "run on collision-sized data, and the exact-Jaccard verify is "
        "the jaccard_pairs_arrays discipline (pair side broadcasts, "
        "base tables map-scan). Candidates are O(batch × collisions), "
        "never O(corpus²)."
    ),
    "semdedup": (
        "r5c semantic dedup (SemDeDup). Codebook assignment is "
        "map-side (broadcast centroids, mapInPandas); the clustering "
        "IS the candidate filter — the within-cell pairwise self-join "
        "exchanges the corpus ONCE on cid, shared by both sides and "
        "the hot-cell cap window, and pair cosine is a sequential "
        "array fold on the pair row (zip_with + aggregate: no "
        "pairs×dim explode, no Python in the scoring). Training "
        "(shared ivf_train) shuffles once per Lloyd iteration with "
        "map-side partial sums; the driver sees k array rows."
    ),
    "vector_reproject_merc": (
        "r5f vector reproject: ONE zero-shuffle MapInPandas over the "
        "layer (numpy vertex-array transforms, never per-vertex "
        "Python) followed by the envelope accessors — a pure map "
        "pipeline. At 10^12 features this is a single pass; the CRS "
        "math adds no exchange."
    ),
    "pipeline_chain": (
        "r5g pipeline runner: the parsed '!'-chain is ONE lazy Catalyst "
        "plan — the make-point and bbox-filter steps are a single "
        "projection + filter over the page scan, select prunes columns, "
        "and the sort/limit compile to TakeOrderedAndProject (no global "
        "sort materialization). Steps add no exchanges beyond what the "
        "operators themselves need; a mid-chain relational filter still "
        "reaches the parquet scan as PushedFilters "
        "(tests/test_pipeline_runner.py::test_pipeline_filter_pushes_to_scan)."
    ),
    "raster_overview_refresh": (
        "r5f incremental overview maintenance. The dirty overview-"
        "block key range derives closed-form from the --bbox, so the "
        "keep-side is a pushed-down filter over the existing overview "
        "(no join) and the recompute side scans ONLY the dirty base "
        "stripe (pushed-down x0/y0 range predicates) before the one "
        "regroup exchange of overview_blocks. Refresh cost is "
        "proportional to the dirty region — the plan you want when a "
        "daily update touches one tile of a 100 TB mosaic."
    ),
    "simhash_hamming_pairs": (
        "r5g Manku Hamming<=k near-dup. Signatures are doc-local array "
        "lambdas (simhash_cols — a pure map, no shuffle of its own); "
        "the pigeonhole block explode shuffles ONCE on (blk, bv) and "
        "that exchange is shared by the hot-bucket cap window and both "
        "self-join sides (ReusedExchange in the final adaptive plan — "
        "verified post-execution: 1 ReusedExchange; the static tree "
        "below shows the pre-AQE duplicate). Verification is one "
        "bit_count(xor) per candidate pair — no join back to the "
        "corpus, because the signature rides the block rows."
    ),
    "vocab_kmv": (
        "r5g KMV distinct sketch. The corpus is NEVER shuffled or "
        "globally distinct-ed: one Arrow pass accumulates each "
        "partition's k smallest distinct hashes (O(k) state, k rows "
        "out), and the merge distinct+top-k runs on <= k x partitions "
        "rows — the tiny exchange visible below. TakeOrderedAndProject "
        "keeps the global top-k a merge, not a sort."
    ),
    "embedding_gram": (
        "r5g fixed-point exact Gram. ONE Arrow pass per partition "
        "(int64 matmul per batch, d(d+1)/2 partial rows out), ONE "
        "map-side-combined groupBy over P x d(d+1)/2 tiny rows; the "
        "embedding table itself never shuffles. Integer arithmetic "
        "makes the result bit-identical under any partitioning — the "
        "property the oracle checks."
    ),
    "raster_clip_cutline": (
        "r5g cutline clip. A pure MAP over block rows (MapInPandas, no "
        "exchange added by the operator): the cutline rings travel in "
        "the task closure, the per-block envelope test skips the "
        "ray-cast where the cutline cannot intersect, and the "
        "aggregation below is the query's reporting tail, not the "
        "clip. Mirrors gdalwarp's per-chunk cutline masking."
    ),
    "geohash_assign": (
        "r5g geohash cells. One codegen'd projection — quantize, "
        "interleave, base32 — over the page scan; zero shuffle, zero "
        "Python. The same SQL text is the DuckDB oracle."
    ),
    "hybrid_rrf": (
        "r5g reciprocal-rank fusion. Both retrieval arms produce top-k "
        "lists (O(queries x k) rows); the fusion is a full-outer "
        "equi-join + per-query window over ONLY that candidate set — "
        "the corpus-scale work stays inside the arms (BM25's one "
        "term-join, the ANN broadcast scan), and fusing adds no "
        "corpus-touching stage."
    ),
    "curation_pipeline": (
        "r5g composed curation sequence. The Gopher gate and the "
        "linear-classifier gate are doc-local array lambdas that fuse "
        "into ONE codegen'd map over the scan — no exchange between "
        "stages; the content-hash keep-first aggregate is the "
        "pipeline's single shuffle and runs on the gate-SURVIVOR "
        "subset only (filters first shrink the shuffle — the reason "
        "real pipelines order stages this way)."
    ),
    "dbscan_pages": (
        "r5g DBSCAN. eps-neighbor candidates are ONE cell-key equi-join "
        "(the a-side explodes to its 3x3 cell neighborhood, the b-side "
        "keys by home cell — every ordered pair produced exactly once, "
        "no dedup pass); the degree count is map-side combined; the "
        "component loop runs over CORE points only with per-round "
        "localCheckpoint (flat round cost — the discipline the shared "
        "CC loop now enforces after the lineage-growth fix this "
        "operator surfaced)."
    ),
    "containment_pairs": (
        "r5g Broder containment. Candidate generation shuffles the "
        "rare-shingle stream once (max_df stop-shingle cap bounds the "
        "self-join fan-out); verification joins the candidate pair set "
        "back to doc-local shingle ARRAYS — under AQE the pair side "
        "broadcasts, so the corpus is scanned, never re-shuffled, for "
        "the verify."
    ),
}


def main() -> None:
    import __spark_entry__ as E

    spark = get_spark(master="local[8]")
    qs = E.queries()
    out = [
        "# PLANS — physical-plan evidence for the scale claims",
        "",
        "Generated by `python tools/dump_plans.py` (sf0.001 inputs; plan",
        "shape is scale-independent). Guarded by tests/test_plans.py.",
        "",
    ]
    for name, note in NOTES.items():
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # keep the op tree + the scan details, trim codegen ids
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
