"""Deduplication & text-analysis operators for web-scale corpora.

All operators are DataFrame-level compositions of built-in functions
(split/explode/window/groupBy) — JVM-side, whole-stage-codegen'd, zero
Python in the hot path. The portable 60-bit md5 hash
(gdal_spark.portable.hash64) makes every derived value bit-identical to
the DuckDB oracle.

Scale notes (100 TB):
- MinHash signatures are computed ENTIRELY map-side (minhash_bands:
  shingle array → one base hash per shingle → num_perm affine mixes →
  band sigs, all higher-order array functions on the doc row) — the
  corpus is scanned once and never shuffled before the candidate
  self-join.
- candidate pairs join on the band key; hot buckets (boilerplate docs)
  are capped with a window count over exactly the self-join key, so
  the cap and both join sides share ONE exchange. Exact-Jaccard
  verification joins only candidate docs' shingle sets, never all
  pairs.
- the whole pipeline is 2 shuffles: band self-join and jaccard agg —
  independent of corpus size per-doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gdal_spark.portable import hash64

# Two hashers, one contract:
# - "portable": md5-derived 60-bit hash, bit-identical in DuckDB — the
#   correctness-gate hasher (oracle parity).
# - "fast": xxhash64 (JVM intrinsic, ~10x cheaper than md5) — the
#   production hasher; same pipeline, different fingerprints.
def H64(e: str, hasher: str = "portable"):
    if hasher == "fast":
        return F.expr(f"xxhash64({e})")
    return F.expr(hash64(e, "spark"))


def tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, w) — whitespace tokens with position."""
    return df.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    )


def shingle_array_sql(text_col: str = "text", k: int = 3) -> str:
    """SQL for the distinct k-word shingle array of a document — the
    shared map-side kernel of shingles() and minhash_bands()."""
    toks = f"split({text_col}, ' ')"
    return (
        f"case when size({toks}) >= {k} then "
        f"array_distinct(transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {k})))) "
        f"else array() end"
    )


def shingles(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle) — distinct k-word shingles per document.

    Entirely map-side: the shingle list is built with array transform +
    slice and deduped with array_distinct BEFORE exploding, so shingling
    adds ZERO shuffles — the first shuffle in any dedup pipeline is the
    MinHash aggregation itself. (A window-lead formulation would cost a
    full shuffle+sort by doc here.)"""
    return df.select(
        id_col, F.explode(F.expr(shingle_array_sql(text_col, k))).alias("shingle")
    )


MH_M31 = 2147483647  # base hash reduced mod 2^31-1 → a*h stays in int64
MH_P = 2305843009213693951  # 2^61-1 (Mersenne prime) mix modulus


def mh_ab(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine constants for the universal-hash MinHash:
    (a_i odd in [1, 2^30), b_i in [0, 2^30)), a stable prefix — the
    first 8 pairs for num_perm=8 are the first 8 of num_perm=16. Fixed
    seed: signatures are reproducible across runs/engines, and the
    DuckDB oracle inlines the SAME constants (a VALUES table)."""
    import random

    rnd = random.Random(0x5EED)
    return [
        (rnd.randrange(1, 1 << 30) | 1, rnd.randrange(0, 1 << 30))
        for _ in range(num_perm)
    ]


def minhash(
    sh: DataFrame, num_perm: int = 16, id_col: str = "doc_id",
    hasher: str = "portable",
) -> DataFrame:
    """(id, perm, mh) MinHash signature rows via the universal-hash
    construction (Broder 1997; what datasketch ships): ONE base hash
    per shingle, then num_perm affine mixes
    mh_i = min over shingles of (a_i * (hash64(shingle) mod 2^31-1) + b_i) mod 2^61-1.

    vs hashing num_perm times per shingle this cuts hash work on the
    hottest dedup path by num_perm× (md5 for the portable hasher —
    ~3.5× wall on the sf0.1 bench at num_perm=16); the mix is exact
    int64 arithmetic (a < 2^30, h < 2^31 → a*h+b < 2^62, no ANSI
    overflow) that DuckDB mirrors bit-identically.

    One pass, num_perm parallel MIN aggregates over the shingle rows —
    no perm explode: the row stream through project/combine stays 1×
    instead of num_perm×. The wide row unpivots back to (perm, mh)
    with stack() after the (map-side combined) aggregation, so the
    shuffle still carries one wide row per doc."""
    ab = mh_ab(num_perm)
    # pmod: the fast hasher (xxhash64) is signed; for portable (60-bit
    # nonneg) pmod == % == the oracle's %.
    h = F.pmod(H64("shingle", hasher), F.lit(MH_M31))
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MH_P)).alias(f"_mh{i}")
        for i, (a, b) in enumerate(ab)
    ]
    wide = sh.withColumn("_h", h).groupBy(id_col).agg(*aggs)
    stack = ", ".join(f"{i}, _mh{i}" for i in range(num_perm))
    return wide.selectExpr(
        id_col, f"stack({num_perm}, {stack}) as (perm, mh)"
    )


def minhash_bands(
    df: DataFrame,
    k: int = 3,
    num_perm: int = 16,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> DataFrame:
    """(id, band, sig) LSH band signatures computed ENTIRELY map-side —
    zero shuffle: shingle array → base-hash array → per-perm affine min
    (all higher-order array functions on the doc row) → per-band
    combine → inline explode to (band, sig) rows. Bit-identical to
    band_keys(minhash(shingles(df)))'s values (same base hash, same
    affine constants, same band combine), but the corpus is scanned
    once and never shuffled before the candidate self-join — on a
    10^12-doc table the signature phase is a pure map stage, which is
    how production minhash pipelines (e.g. datasketch-over-Spark ports)
    are shaped. Docs with fewer than k tokens emit no rows (same as the
    exploded path, where they produce no shingles)."""
    ab = mh_ab(num_perm)
    base = (
        "xxhash64(s)" if hasher == "fast" else hash64("s", "spark")
    )
    d = (
        df.where(F.expr(f"size(split({text_col}, ' ')) >= {k}"))
        .selectExpr(id_col, f"{shingle_array_sql(text_col, k)} as _sh")
        .selectExpr(
            id_col, f"transform(_sh, s -> pmod({base}, {MH_M31})) as _hs"
        )
        .selectExpr(
            id_col,
            *[
                f"array_min(transform(_hs, h -> ({a} * h + {b}) % {MH_P}))"
                f" as _mh{i}"
                for i, (a, b) in enumerate(ab)
            ],
        )
    )
    sigs = band_sig_exprs(num_perm, rows_per_band, hasher)
    entries = ", ".join(
        f"named_struct('band', {b}, 'sig', {s})" for b, s in enumerate(sigs)
    )
    return d.selectExpr(id_col, f"inline(array({entries}))")


def band_sig_exprs(
    num_perm: int, rows_per_band: int, hasher: str
) -> list[str]:
    """Per-band combine SQL over the `_mh{i}` signature columns — the
    single source of truth for LSH band signatures (shared by
    minhash_bands and minhash_band_keys). Piece hash must match
    band_keys' H64 piece for the SAME hasher: xxhash64 for 'fast',
    portable md5 for 'portable' — otherwise an index built via
    band_keys probed with these sigs silently gets zero candidates.
    Combine mirrors band_keys too: sum (portable, 60-bit, can't
    overflow) vs bit_xor (fast, full-range xxhash64 would overflow an
    ANSI sum)."""

    def piece(p: int) -> str:
        arg = f"concat('{p}', ':', cast(_mh{p} as string))"
        if hasher == "fast":
            return f"xxhash64({arg})"
        return hash64(arg, "spark")

    n_bands = (num_perm + rows_per_band - 1) // rows_per_band
    op = " + " if hasher == "portable" else " ^ "
    return [
        "("
        + op.join(
            piece(p)
            for p in range(b * rows_per_band, min((b + 1) * rows_per_band, num_perm))
        )
        + ")"
        for b in range(n_bands)
    ]


def minhash_band_keys(
    df: DataFrame,
    k: int = 3,
    num_perm: int = 16,
    rows_per_band: int = 2,
    text_col: str = "text",
    hasher: str = "portable",
    out: str = "band_keys",
) -> DataFrame:
    """All input columns + `out`: array<bigint> of combined (band, sig)
    LSH keys, computed ENTIRELY doc-locally — zero shuffle, a stateless
    projection, so it is the streaming-safe signature path
    (webtext.lsh_decontaminate / streaming.ingest.decontaminate_stream
    probe a broadcast benchmark key set with it). Each key hashes the
    band index together with the band signature
    (H64('<band>|<sig>')), so ONE bigint array-membership test replaces
    the (band, sig) equi-join; the sig values are bit-identical to
    minhash_bands / band_keys (shared band_sig_exprs). Docs with fewer
    than k tokens get an EMPTY array — the same rows minhash_bands
    drops, kept here so a downstream flag column is total over df."""
    ab = mh_ab(num_perm)
    base = "xxhash64(s)" if hasher == "fast" else hash64("s", "spark")
    d = (
        df.selectExpr("*", f"{shingle_array_sql(text_col, k)} as _sh")
        .selectExpr("*", f"transform(_sh, s -> pmod({base}, {MH_M31})) as _hs")
        .selectExpr(
            "*",
            *[
                f"array_min(transform(_hs, h -> ({a} * h + {b}) % {MH_P}))"
                f" as _mh{i}"
                for i, (a, b) in enumerate(ab)
            ],
        )
    )

    def key(b: int, sig: str) -> str:
        arg = f"concat('{b}', '|', cast({sig} as string))"
        return f"xxhash64({arg})" if hasher == "fast" else hash64(arg, "spark")

    keys = ", ".join(
        key(b, s)
        for b, s in enumerate(band_sig_exprs(num_perm, rows_per_band, hasher))
    )
    return d.selectExpr(
        *df.columns,
        f"case when size(_sh) >= 1 then array({keys}) "
        f"else cast(array() as array<bigint>) end as {out}",
    )


def band_keys(
    mh: DataFrame, rows_per_band: int = 2, id_col: str = "doc_id",
    hasher: str = "portable",
) -> DataFrame:
    """(id, band, sig) LSH band signatures. sig is an order-independent
    combine (sum of hash64(perm||':'||mh)) so it needs no sort."""
    piece = H64("concat(cast(perm as string), ':', cast(mh as string))", hasher)
    # order-independent combine: sum for the portable hasher (60-bit
    # values cannot overflow), bit_xor for fast (full-range xxhash64
    # would overflow an ANSI sum)
    combine = F.sum(piece) if hasher == "portable" else F.bit_xor(piece)
    return (
        mh.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(combine.alias("sig"))
    )


def dropped_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    """(band, sig, n) — the LSH buckets candidate_pairs(max_bucket=…)
    will DROP (size > cap): the audit trail for the stop-bucket guard.
    One map-side-combined aggregate; rows are O(#hot buckets)."""
    return (
        bands.groupBy("band", "sig")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
    )


def candidate_pairs(
    bands: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """(id_a, id_b) distinct pairs sharing ≥1 LSH band bucket.

    Scale guard (the one real 100 TB risk in this family): a near-dup
    cluster — boilerplate/template pages on a real crawl — lands its
    whole mass in ONE (band, sig) bucket, and within-bucket candidate
    generation is O(|bucket|²); AQE skew-join splits partitions, not
    the pair blow-up. With `max_bucket` set, buckets larger than the
    cap are excluded BEFORE the self-join — the stop-bucket analog of
    ngram_jaccard_pairs' `max_df` stop-shingle cap, and the same
    documented recall trade: docs in a dropped bucket can still pair
    through their other (num_perm / rows_per_band − 1) bands. Audit the
    drops with dropped_buckets(bands, max_bucket). For corpora with
    massive EXACT-duplicate clusters, run dedup_exact first and pair
    the per-content representatives only — a dup cluster of size g
    then costs g rows, not g² pairs.

    The cap is a WINDOW count over (band, sig) — not an aggregate +
    join back — so the bands input is scanned ONCE and exchanged ONCE
    on exactly the self-join key; both sides of the self-join then
    reuse that exchange (ReusedExchange in the plan). This matters
    because minhash_bands is a pure map stage: with no shuffle boundary
    of its own, every extra plan reference would recompute the whole
    signature phase."""
    if max_bucket is not None:
        w = Window.partitionBy("band", "sig")
        bands = (
            bands.withColumn("_bn", F.count("*").over(w))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("sig")
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("sig")
    )
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) exact n-gram Jaccard for given pairs.

    `sizes` (id, n = distinct-shingle count) can be supplied map-side
    (size of the shingle array — no shuffle); the fallback groupBy
    count shuffles one (id, n) row per doc."""
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )


def jaccard_pairs_arrays(
    df: DataFrame, pairs: DataFrame, k: int = 3, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, jaccard) exact n-gram Jaccard via shingle ARRAYS:
    the (small, post-LSH) pair set joins the corpus twice on the doc id
    to pick up each side's distinct-shingle array, and the intersection
    is size(array_intersect(...)) on the pair row. The corpus is never
    exploded to (id, shingle) rows nor shuffled on a shingle key — under
    AQE the tiny pair side broadcasts and both joins are map-side scans
    of the corpus; a row-level formulation instead exchanges the whole
    O(tokens) shingle stream to verify a handful of candidates."""
    arr = df.selectExpr(id_col, f"{shingle_array_sql(text_col, k)} as _sh")
    a = arr.selectExpr(f"{id_col} as id_a", "_sh as _sha")
    b = arr.selectExpr(f"{id_col} as id_b", "_sh as _shb")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.expr("size(array_intersect(_sha, _shb))")
                / F.expr("size(_sha) + size(_shb) - size(array_intersect(_sha, _shb))")
            ).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 3,
    num_perm: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle → minhash → LSH bands →
    candidate pairs → exact-Jaccard verify → threshold.

    `max_bucket` (default on) is the hot-bucket stop guard — see
    candidate_pairs: a boilerplate cluster cannot go O(n²) through one
    band bucket. Fixture-scale corpora never hit the default cap, so
    results are identical to the unguarded pipeline there.

    Plan shape: the signature phase is a pure map stage
    (minhash_bands), the ONLY corpus shuffle is the band self-join,
    and the exact-Jaccard verify joins the small pair set back to the
    corpus's shingle arrays (jaccard_pairs_arrays — under AQE the pair
    side broadcasts, so verification is two map-side scans, never an
    O(tokens) exchange)."""
    bands = minhash_bands(
        df, k, num_perm, rows_per_band, id_col, text_col, hasher
    )
    cand = candidate_pairs(bands, id_col, max_bucket=max_bucket)
    jac = jaccard_pairs_arrays(df, cand, k, id_col, text_col)
    return jac.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def incremental_dedup_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    k: int = 3,
    num_perm: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """(batch_id, corpus_id, jaccard): near-dups of NEW documents
    against an EXISTING corpus — the daily-ingest pattern: the corpus
    is indexed once (its (band, sig) rows are exactly what a stored LSH
    index table holds; minhash_bands recomputes them here, a production
    pipeline reads them back), and each incoming batch probes that
    index WITHOUT re-pairing the corpus against itself. Batch-internal
    duplicates are deliberately out of scope — they surface when the
    (deduped) batch is merged and the next batch probes it.

    Scale (100 TB corpus × small daily batch): both signature phases
    are pure map stages. The batch's distinct (band, sig) probe keys —
    O(|batch| × n_bands) rows of two bigints — BROADCAST against the
    corpus index scan, so the corpus is filtered to colliding rows
    map-side and NEVER shuffles; everything downstream (hot-bucket cap
    window, candidate join, Jaccard verify) runs on collision-sized
    data. The cap is applied over the collision rows, where the
    per-(band, sig) count still equals the full corpus bucket size
    (the probe filter keeps or drops whole buckets), so a boilerplate
    bucket in the index cannot fan a colliding batch doc out by
    |bucket|; audit trail semantics match candidate_pairs. Verify is
    exact n-gram Jaccard via each side's map-side shingle ARRAYS (the
    jaccard_pairs_arrays discipline: the candidate pair set broadcasts
    under AQE, both base tables are map-scanned, nothing exchanges on
    a shingle key)."""
    cb = minhash_bands(
        corpus, k, num_perm, rows_per_band, id_col, text_col, hasher
    ).withColumnRenamed(id_col, "corpus_id")
    bb = minhash_bands(
        batch, k, num_perm, rows_per_band, id_col, text_col, hasher
    ).withColumnRenamed(id_col, "batch_id")
    probe = F.broadcast(bb.select("band", "sig").distinct())
    hits = cb.join(probe, ["band", "sig"])
    if max_bucket is not None:
        w = Window.partitionBy("band", "sig")
        hits = (
            hits.withColumn("_bn", F.count("*").over(w))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    cand = hits.join(bb, ["band", "sig"]).select("batch_id", "corpus_id").distinct()
    ba = batch.selectExpr(
        f"{id_col} as batch_id", f"{shingle_array_sql(text_col, k)} as _shb"
    )
    ca = corpus.selectExpr(
        f"{id_col} as corpus_id", f"{shingle_array_sql(text_col, k)} as _shc"
    )
    jac = (
        cand.join(ba, "batch_id")
        .join(ca, "corpus_id")
        .select(
            "batch_id",
            "corpus_id",
            (
                F.expr("size(array_intersect(_shb, _shc))")
                / F.expr("size(_shb) + size(_shc) - size(array_intersect(_shb, _shc))")
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def simhash(
    df: DataFrame, bits: int = 16, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — `bits`-bit SimHash over token multiset. Each token
    votes ±count on each bit of its hash64; bit set if the sum > 0."""
    t = (
        tokens(df, id_col, text_col)
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", H64("w"))
    )
    b = t.select(
        id_col,
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    )
    vote = F.when(F.expr("shiftright(h, b) % 2 = 1"), F.col("cnt")).otherwise(
        -F.col("cnt")
    )
    per_bit = b.groupBy(id_col, "b").agg(F.sum(vote).alias("v"))
    # bigint one before the shift: shiftleft(1, b) is int32 and flips
    # sign at b = 31 (same fix as simhash_cols — keeps bits up to 63)
    contrib = F.when(
        F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), b)")
    ).otherwise(F.lit(0))
    return per_bit.groupBy(id_col).agg(F.sum(contrib).alias("simhash"))


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text —
    (kept_id = min id, group_size). Hash-groupBy, map-side combined."""
    return (
        df.select(id_col, H64(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count("*").alias("group_size"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Direct n-gram Jaccard near-dup (no MinHash): candidates = pairs
    sharing at least one RARE shingle (document frequency ≤ max_df —
    the standard stop-shingle cap that keeps the self-join fan-out
    bounded at corpus scale: a shingle in d docs contributes d² pairs,
    so capping df caps the blow-up at max_df·|shingles| candidates),
    then EXACT Jaccard over the full shingle sets for those candidates
    only. Pairs sharing solely ultra-common shingles are missed — the
    documented recall trade, the same shape as LSH's."""
    sh = shingles(df, k=k, id_col=id_col, text_col=text_col)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    # shuffle join on shingle (the rare-shingle dictionary is the LARGE
    # side at corpus scale — never broadcast it); AQE handles residual
    # key skew
    rare = sh.join(dfreq.where(F.col("dfreq") <= max_df), "shingle")
    ra = rare.select(F.col(id_col).alias("id_a"), "shingle")
    rb = rare.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        ra.join(rb, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        jaccard_pairs(sh, cand, id_col=id_col)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def dup_ngram_stats(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> DataFrame:
    """Per-document corpus-duplicated k-gram statistics — the
    exact-substring dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") at gram granularity:
    each doc's DISTINCT k-token windows are matched against the whole
    corpus; a window seen in >= 2 documents is a duplicated span.
    Returns (id, n_grams, n_dup_grams, dup_frac).

    Scale (100 TB): shingling is map-local (zero shuffle); the
    gram-document-frequency aggregate is map-side partially combined
    on the 8-byte hash; the join back is a linear shuffle join (the
    gram dictionary IS the corpus — never broadcast); the final
    per-doc aggregate map-side combines.  3 shuffles, all O(tokens),
    no pairwise blow-up anywhere (this is the statistic that REPLACES
    an all-pairs substring comparison)."""
    sh = shingles(df, k=k, id_col=id_col, text_col=text_col)
    g = sh.select(id_col, H64("shingle", hasher).alias("gh"))
    dfreq = g.groupBy("gh").agg(F.count("*").alias("gdf"))
    return (
        g.join(dfreq, "gh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("gdf") > 1, 1).otherwise(0)
            ).alias("n_dup_grams"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_grams") / F.col("n_grams"), 6)
        )
    )


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """End-to-end near-dup resolution: duplicate-pair edges (id_a,
    id_b) -> connected components -> per-cluster canonical = min doc
    id.  Returns (id, cluster_id, keep) for EVERY input doc
    (singletons form their own cluster via a self-edge).  This is the
    keep-one-per-cluster step production minhash pipelines run after
    candidate verification; transitivity matters (A~B, B~C keeps only
    one of {A,B,C} even when A!~C directly).

    Scale: the component solver is the alternating neighbor-min +
    pointer-jumping loop (raster/polygonize.connected_components),
    O(log n) rounds of linear shuffle joins — never a driver-side
    union-find — and it runs ONLY over nodes that appear in a pair:
    the iterative state scales with |duplicates|, not |corpus|
    (dup pairs are a tiny fraction of a 10^12-doc table; feeding
    corpus self-loops into the loop would drag the whole table
    through every round).  Singletons are restored by ONE final
    left join against the solved (tiny) component map."""
    from gdal_spark.raster.polygonize import connected_components

    comp = connected_components(
        pairs.select(F.col("id_a").alias("la"), F.col("id_b").alias("lb"))
    )
    return (
        df.select(id_col)
        .join(comp, F.col(id_col) == F.col("label"), "left")
        .select(
            id_col,
            F.coalesce("root", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def remove_dup_spans(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> DataFrame:
    """Exact-substring duplicate REMOVAL (the edit step of Lee et al.
    2022 — dup_ngram_stats is the statistic, this rewrites the corpus):
    every k-token window occurring >= min_count times corpus-wide is a
    duplicated span; a token is dropped iff it lies inside any such
    window of its document. Returns the narrow
    (id, n_tokens, n_kept_tokens, clean_md5) — callers wanting the
    cleaned text select array_join themselves.

    Scale (100 TB): window enumeration is map-local (positioned
    shingles, zero shuffle); the occurrence count is a map-side
    partially-combined aggregate on the 8-byte gram hash; flagged
    positions come back via ONE linear shuffle join and collapse to one
    array row per affected doc (collect over at most n_windows ints);
    the final rewrite is a doc-local array lambda, codegen'd. No
    pairwise comparison anywhere. The per-doc rewrite is
    O(tokens x flagged spans) — at pathological span counts switch the
    lambda for a sorted-merge, the join shape is unchanged. A 64-bit
    gram-hash collision can only ever OVER-remove one span (hash
    equality stands in for text equality, like dup_ngram_stats)."""
    toks = f"split({text_col}, ' ')"
    w = df.select(
        F.col(id_col),
        F.expr(
            f"posexplode(transform(sequence(1, greatest(size({toks})"
            f" - {k} + 1, 0)), j -> array_join(slice({toks}, j, {k}),"
            f" ' ')))"
        ).alias("pos", "gram"),
    )
    g = w.select(id_col, "pos", H64("gram", hasher).alias("gh"))
    cnt = g.groupBy("gh").agg(F.count("*").alias("c"))
    starts = (
        g.join(cnt, "gh")
        .where(F.col("c") >= min_count)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_starts"))
    )
    j = df.select(id_col, text_col).join(starts, id_col, "left")
    kept = (
        f"filter({toks}, (t, i) -> not exists(coalesce(_starts,"
        f" array()), p -> i >= p and i < p + {k}))"
    )
    return j.select(
        id_col,
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size({kept})").alias("n_kept_tokens"),
        F.md5(F.expr(f"array_join({kept}, ' ')")).alias("clean_md5"),
    )


def simhash_cols(
    df: DataFrame,
    bits: int = 16,
    text_col: str = "text",
    hasher: str = "portable",
    out: str = "simhash",
) -> DataFrame:
    """All input columns + a `bits`-bit SimHash column, computed
    ENTIRELY doc-locally (array lambdas over the token list — zero
    shuffle, a pure map stage). Bit-identical to simhash() for the
    portable hasher, pinned by a pytest parity test: simhash() sums
    count-weighted votes over DISTINCT tokens, which equals one vote
    per token OCCURRENCE over the multiset (the grouping is just an
    associativity regroup of the same sum).

    Being a stateless projection, this is the streaming-safe signature
    path (streaming.ingest.near_dup_stream) — the groupBy formulation
    in simhash() would burn the one stateful-op slot batch code doesn't
    care about."""
    base = "xxhash64(t)" if hasher == "fast" else hash64("t", "spark")
    d = df.selectExpr(
        "*", f"transform(split({text_col}, ' '), t -> {base}) as _hs"
    )
    votes = [
        f"aggregate(_hs, cast(0 as bigint), (acc, h) -> acc + "
        f"(case when (shiftright(h, {b}) & 1) = 1 then cast(1 as bigint) "
        f"else cast(-1 as bigint) end)) as _v{b}"
        for b in range(bits)
    ]
    v = d.selectExpr("*", *votes)
    # shift a BIGINT one: shiftleft(1, b) is int32 and overflows at
    # b = 31, capping usable signature width at 31 bits
    contrib = " + ".join(
        f"(case when _v{b} > 0 then shiftleft(cast(1 as bigint), {b}) "
        f"else cast(0 as bigint) end)"
        for b in range(bits)
    )
    return v.selectExpr(*df.columns, f"{contrib} as {out}")


def simhash_blocks(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) per pigeonhole block: max_hamming+1 contiguous
    bit ranges covering [0, bits), widths differing by at most 1. Two
    signatures within Hamming distance max_hamming differ in at most
    max_hamming blocks, so they agree EXACTLY on >= 1 block — the
    pigeonhole guarantee behind Manku/Jain/Sarma's table scheme."""
    n_blocks = max_hamming + 1
    if n_blocks > bits:
        raise ValueError("need max_hamming + 1 <= bits")
    base, extra = divmod(bits, n_blocks)
    out, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_hamming_pairs(
    df: DataFrame,
    bits: int = 16,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """(id_a, id_b, hamming) — near-dup pairs whose `bits`-bit SimHash
    signatures are within Hamming distance `max_hamming`: the
    Manku-Jain-Sarma web-crawl rule (WWW 2007, "Detecting
    Near-Duplicates for Web Crawling"), of which the exact-signature
    join (simhash_dup_pairs) is the k=0 special case.

    Candidate generation is the pigeonhole block probe: the signature
    splits into max_hamming+1 contiguous blocks (simhash_blocks) and
    candidates equi-join on (block_idx, block_bits). Recall is PERFECT
    (pigeonhole: <= max_hamming differing bits cannot touch all
    max_hamming+1 blocks), so the brute-force all-pairs Hamming join is
    an exact oracle for the blocked plan — not an approximation bound.
    Verification is one bit_count(a XOR b) per candidate pair.

    Scale: signatures are a pure map stage (simhash_cols — zero
    shuffle); the corpus is exchanged ONCE on the block key, the
    hot-bucket window cap and both self-join sides reuse that exchange
    (same ReusedExchange discipline as candidate_pairs, same
    O(bucket²) stop guard and recall trade — a pair dropped from one
    hot block can still meet through its other max_hamming blocks)."""
    sigs = simhash_cols(
        df.select(id_col, text_col), bits=bits, text_col=text_col,
        hasher=hasher,
    ).select(id_col, "simhash")
    entries = ", ".join(
        f"named_struct('blk', {i}, 'bv', "
        f"shiftright(simhash, {off}) & {(1 << w) - 1})"
        for i, (off, w) in enumerate(simhash_blocks(bits, max_hamming))
    )
    blocks = sigs.selectExpr(
        id_col, "simhash", f"inline(array({entries}))"
    )
    if max_bucket is not None:
        w = Window.partitionBy("blk", "bv")
        blocks = (
            blocks.withColumn("_bn", F.count("*").over(w))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = blocks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"),
        "blk", "bv",
    )
    b = blocks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"),
        "blk", "bv",
    )
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr("cast(bit_count(_sa ^ _sb) as int)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    eval_permille: int = 100,
    id_col: str = "doc_id",
    salt: str = "split",
    hasher: str = "portable",
) -> DataFrame:
    """Leakage-safe train/eval split: hash-gate on the DEDUP CLUSTER
    canonical id, not the document id, so every member of a near-dup
    cluster lands on the same side.  Splitting i.i.d. by document leaks
    near-duplicates of eval docs into train — the train-test
    contamination channel measured by Lee et al. 2022 (arXiv:2107.06499
    §6.2: models memorize the train-side twin) — and cluster-level
    assignment is the standard fix.  Returns (id, cluster_id, split)
    for every input doc; split = 'eval' iff
    hash64(salt || cluster_id) % 1000 < eval_permille.

    Determinism: the canonical id is the cluster min (stable under any
    partitioning), and the gate is the portable 60-bit hash — the split
    is reproducible across engines, retries, and resumed runs, and
    unseen future docs joining an existing cluster inherit its side.

    Scale: exactly dedup_clusters' cost (CC over dup-pair nodes only,
    O(log n) linear rounds) plus one map-side hash + comparison — no
    extra shuffle beyond the cluster resolution itself."""
    clusters = dedup_clusters(df, pairs, id_col=id_col)
    gate = H64(f"concat('{salt}', cast(cluster_id as string))", hasher) % 1000
    return clusters.select(
        id_col,
        "cluster_id",
        F.when(gate < F.lit(int(eval_permille)), F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def containment_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, containment_a, containment_b) — Broder CONTAINMENT
    near-dup (Broder 1997 §2: C(A,B) = |A∩B| / |A|), keeping pairs
    where max(C(A,B), C(B,A)) >= threshold.  The asymmetric complement
    of Jaccard dedup: a short document quoted inside a long one has
    high containment but LOW Jaccard (the size mismatch crushes
    |A∩B|/|A∪B|), so Jaccard-tuned MinHash/LSH misses exactly the
    quote/subset/boilerplate-inclusion cases this operator targets.

    Candidates are pairs sharing >= 1 RARE shingle (document frequency
    <= max_df — the same stop-shingle cap and documented recall trade
    as ngram_jaccard_pairs: containment > 0 requires a shared shingle,
    so within the cap the candidate recall is exact, not sketch-
    approximate).  Verification joins the candidate set back to the
    corpus's distinct-shingle ARRAYS (broadcast pair side under AQE,
    map-side corpus scans — the corpus never shuffles on shingles for
    verification)."""
    sh = shingles(df, k=k, id_col=id_col, text_col=text_col)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    rare = sh.join(dfreq.where(F.col("dfreq") <= max_df), "shingle")
    ra = rare.select(F.col(id_col).alias("id_a"), "shingle")
    rb = rare.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        ra.join(rb, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    arr = df.selectExpr(id_col, f"{shingle_array_sql(text_col, k)} as _sh")
    a = arr.selectExpr(f"{id_col} as id_a", "_sh as _sha")
    b = arr.selectExpr(f"{id_col} as id_b", "_sh as _shb")
    inter = F.expr("size(array_intersect(_sha, _shb))")
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / F.expr("size(_sha)"), 6).alias("containment_a"),
            F.round(inter / F.expr("size(_shb)"), 6).alias("containment_b"),
        )
    )
    return scored.where(
        F.greatest("containment_a", "containment_b") >= threshold
    )
