"""Training-data pipeline text operators over `documents`.

Deduplication (exact hash, MinHash+LSH, SimHash, n-gram Jaccard), text
analysis (token counting, language-ID heuristic, quality scoring,
fingerprinting). Spark side = DataFrame compositions in
gdal_spark.operators.dedup (JVM-side, zero Python); oracle = the same
math in DuckDB SQL via the portable md5-based hash64.

The near-dup queries amplify the corpus with mutated copies
(doc_id+100000, one appended token) so LSH has true positives to find;
exact-dedup amplifies with verbatim copies (doc_id+200000). Both
amplifications are part of the query on BOTH sides, so the oracle
compare stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import tables
from gdal_spark.operators import dedup
from gdal_spark.portable import hash64

LANGS = ["de", "en", "es", "fr", "zh"]
STOPWORDS = ("a", "the")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    # Single-row-group testdata parquet → 1 scan split; rebalance so the
    # tokenize/regex map phases use the session's parallelism (a real
    # table's scan supplies the splits and this exchange disappears).
    return spark.table("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # raw view (not _docs): this builder does its own post-union
    # rebalance below, so the loader's exchange would be redundant.
    tables.register_views(spark, sf_dir)
    d = spark.table("documents").select("doc_id", "text")
    mutated = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutated")).alias("text"),
    )
    # the testdata parquet is a SINGLE row group, so the scan yields 1-2
    # splits and every downstream map-side phase (the whole minhash
    # signature stage) would run on 2 of N cores. Rebalance to the
    # session's parallelism — on a real table the scan itself supplies
    # the splits and this exchange disappears. Hash-partitioned by
    # doc_id (deterministic, no round-robin sort).
    return d.unionAll(mutated).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


NEAR_DUP_CORPUS_SQL = """
    select doc_id, text from documents
    union all
    select doc_id + 100000 as doc_id, concat(text, ' mutated') as text
    from documents
"""


# --- text stats / quality scoring ---


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    stops = ",".join(f"'{s}'" for s in STOPWORDS)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.expr(f"filter(split(text, ' '), w -> w in ({stops}))"))
    distinct_ratio = n_distinct / n_tokens
    stop_ratio = n_stop / n_tokens
    quality = F.round(
        0.4 * distinct_ratio
        + 0.4 * (1.0 - stop_ratio)
        + 0.2 * F.least(n_tokens / F.lit(50.0), F.lit(1.0)),
        6,
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality.alias("quality"),
    )


TEXT_STATS_ORACLE = f"""
    with t as (
        select doc_id, text, string_split(text, ' ') as toks
        from documents
    )
    select doc_id,
           length(text) as n_chars,
           len(toks) as n_tokens,
           len(list_distinct(toks)) as n_distinct_tokens,
           round(len(list_filter(toks, w -> w in
                 ({','.join(f"'{s}'" for s in STOPWORDS)}))) / len(toks), 6)
             as stop_ratio,
           round(0.4 * (len(list_distinct(toks)) / len(toks))
               + 0.4 * (1.0 - len(list_filter(toks, w -> w in
                 ({','.join(f"'{s}'" for s in STOPWORDS)}))) / len(toks))
               + 0.2 * least(len(toks) / 50.0, 1.0), 6) as quality
    from t
"""


def _token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish regex tokenization counts."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.expr("regexp_count(text, '[a-z]+|[^a-z ]')").alias("n_re_tokens"),
    )


TOKEN_COUNT_ORACLE = """
    select doc_id,
           len(string_split(text, ' ')) as n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[^a-z ]')) as n_re_tokens
    from documents
"""


# --- language-ID heuristic ---
# Each token deterministically "belongs" to a language profile
# (hash64(w) % 5 → sorted lang list); predicted language = plurality vote
# over the doc's tokens, ties broken by lang name. The mechanism mirrors
# n-gram profile scoring; profiles here are hash-derived because the
# synthetic corpus shares one vocabulary across langs.

_LANG_CASE_SPARK = "case " + " ".join(
    f"when pl = {i} then '{l}'" for i, l in enumerate(LANGS)
) + " end"


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    t = dedup.tokens(d).withColumn(
        "pl", F.expr(hash64("w", "spark")) % len(LANGS)
    )
    counts = t.groupBy("doc_id", "pl").agg(F.count("*").alias("c"))
    counts = counts.withColumn("pred_lang", F.expr(_LANG_CASE_SPARK))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("pred_lang").asc()
    )
    best = counts.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    return (
        best.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            (F.col("pred_lang") == F.col("lang")).alias("agree"),
        )
    )


_LANG_CASE_DUCK = "case " + " ".join(
    f"when pl = {i} then '{l}'" for i, l in enumerate(LANGS)
) + " end"

LANG_ID_ORACLE = f"""
    with toks as (
        select doc_id, unnest(string_split(text, ' ')) as w from documents
    ),
    scored as (
        select doc_id, {hash64('w', 'duckdb')} % {len(LANGS)} as pl,
               count(*) as c
        from toks group by doc_id, pl
    ),
    named as (
        select doc_id, c, {_LANG_CASE_DUCK} as pred_lang from scored
    ),
    best as (
        select doc_id, pred_lang
        from named
        qualify row_number() over (partition by doc_id
                                   order by c desc, pred_lang asc) = 1
    )
    select b.doc_id, b.pred_lang, (b.pred_lang = d.lang) as agree
    from best b join documents d on b.doc_id = d.doc_id
"""


# --- fingerprinting ---


def _doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hash + min-shingle fingerprint (1-perm MinHash) per doc."""
    d = _docs(spark, sf_dir)
    sh = dedup.shingles(d, k=3)
    minsh = sh.groupBy("doc_id").agg(
        F.min(F.expr(hash64("shingle", "spark"))).alias("min_shingle_hash")
    )
    return (
        d.select("doc_id", F.expr(hash64("text", "spark")).alias("content_hash"))
        .join(minsh, "doc_id")
    )


DOC_FINGERPRINT_ORACLE = f"""
    with toks as (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as w
        from documents
    ),
    sh as (
        select distinct doc_id, concat(w, ' ', w1, ' ', w2) as shingle
        from (
            select doc_id, w,
                   lead(w, 1) over (partition by doc_id order by pos) as w1,
                   lead(w, 2) over (partition by doc_id order by pos) as w2
            from toks
        ) where w2 is not null
    )
    select d.doc_id,
           {hash64('d.text', 'duckdb')} as content_hash,
           m.min_shingle_hash
    from documents d
    join (select doc_id, min({hash64('shingle', 'duckdb')}) as min_shingle_hash
          from sh group by doc_id) m on d.doc_id = m.doc_id
"""


# --- dedup: exact ---


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dup = d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    return dedup.dedup_exact(d.unionAll(dup))


DEDUP_EXACT_ORACLE = f"""
    with corpus as (
        select doc_id, text from documents
        union all
        select doc_id + 200000 as doc_id, text from documents
    )
    select {hash64('text', 'duckdb')} as content_hash,
           min(doc_id) as kept_id,
           count(*) as group_size
    from corpus
    group by content_hash
"""


# --- dedup: MinHash + LSH ---

NUM_PERM = 16
ROWS_PER_BAND = 2
JACCARD_T = 0.5


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _near_dup_corpus(spark, sf_dir)
    return dedup.minhash_lsh_pairs(
        corpus,
        k=3,
        num_perm=NUM_PERM,
        rows_per_band=ROWS_PER_BAND,
        threshold=JACCARD_T,
    )


def _minhash_oracle() -> str:
    # universal-hash MinHash mirror: same base hash, same affine
    # constants (inlined VALUES table), same int64 arithmetic as
    # operators.dedup.minhash — bit-identical signatures.
    ab_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup.mh_ab(NUM_PERM))
    )
    h_base = hash64("shingle", "duckdb")
    h_sig = hash64(
        "concat(cast(perm as varchar), ':', cast(mh as varchar))", "duckdb"
    )
    return f"""
    with corpus as ({NEAR_DUP_CORPUS_SQL}),
    toks as (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as w
        from corpus
    ),
    sh as (
        select distinct doc_id, concat(w, ' ', w1, ' ', w2) as shingle
        from (
            select doc_id, w,
                   lead(w, 1) over (partition by doc_id order by pos) as w1,
                   lead(w, 2) over (partition by doc_id order by pos) as w2
            from toks
        ) where w2 is not null
    ),
    mh as (
        select doc_id, ab.perm,
               min((ab.a * s.h + ab.b) % {dedup.MH_P}) as mh
        from (select doc_id, ({h_base}) % {dedup.MH_M31} as h from sh) s
        cross join (values {ab_rows}) ab(perm, a, b)
        group by doc_id, ab.perm
    ),
    bands as (
        select doc_id, perm // {ROWS_PER_BAND} as band, sum({h_sig}) as sig
        from mh group by doc_id, band
    ),
    cand as (
        select distinct a.doc_id as id_a, b.doc_id as id_b
        from bands a join bands b on a.band = b.band and a.sig = b.sig
        where a.doc_id < b.doc_id
    ),
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    inter as (
        select c.id_a, c.id_b, count(*) as i
        from cand c
        join sh a on a.doc_id = c.id_a
        join sh b on b.doc_id = c.id_b and b.shingle = a.shingle
        group by c.id_a, c.id_b
    )
    select i.id_a, i.id_b,
           round(i.i / (na.n + nb.n - i.i), 6) as jaccard
    from inter i
    join sizes na on na.doc_id = i.id_a
    join sizes nb on nb.doc_id = i.id_b
    where i.i / (na.n + nb.n - i.i) >= {JACCARD_T}
    """


# --- dedup: incremental (new batch vs corpus index) ---


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: corpus = the original documents, batch = the
    mutated near-copies (doc_id+100000). Every batch doc should pair
    with its source document; corpus-internal pairs are NOT produced
    (the point of the incremental probe — the corpus never self-joins)."""
    tables.register_views(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    d = spark.table("documents").select("doc_id", "text")
    corpus = d.repartition(par, "doc_id")
    batch = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutated")).alias("text"),
    ).repartition(par, "doc_id")
    return dedup.incremental_dedup_pairs(
        corpus,
        batch,
        k=3,
        num_perm=NUM_PERM,
        rows_per_band=ROWS_PER_BAND,
        threshold=JACCARD_T,
    )


def _incremental_oracle() -> str:
    # same signature machinery as _minhash_oracle over the union corpus
    # (bands referenced twice -> materialized); candidates restricted to
    # corpus-side doc_id < 100000 x batch-side >= 100000 — exactly the
    # engine's probe, which never pairs corpus docs with each other.
    ab_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup.mh_ab(NUM_PERM))
    )
    h_base = hash64("shingle", "duckdb")
    h_sig = hash64(
        "concat(cast(perm as varchar), ':', cast(mh as varchar))", "duckdb"
    )
    return f"""
    with corpus as ({NEAR_DUP_CORPUS_SQL}),
    toks as (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as w
        from corpus
    ),
    sh as (
        select distinct doc_id, concat(w, ' ', w1, ' ', w2) as shingle
        from (
            select doc_id, w,
                   lead(w, 1) over (partition by doc_id order by pos) as w1,
                   lead(w, 2) over (partition by doc_id order by pos) as w2
            from toks
        ) where w2 is not null
    ),
    mh as (
        select doc_id, ab.perm,
               min((ab.a * s.h + ab.b) % {dedup.MH_P}) as mh
        from (select doc_id, ({h_base}) % {dedup.MH_M31} as h from sh) s
        cross join (values {ab_rows}) ab(perm, a, b)
        group by doc_id, ab.perm
    ),
    bands as materialized (
        select doc_id, perm // {ROWS_PER_BAND} as band, sum({h_sig}) as sig
        from mh group by doc_id, band
    ),
    cand as (
        select distinct b.doc_id as batch_id, c.doc_id as corpus_id
        from bands c join bands b on c.band = b.band and c.sig = b.sig
        where c.doc_id < 100000 and b.doc_id >= 100000
    ),
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    inter as (
        select c.batch_id, c.corpus_id, count(*) as i
        from cand c
        join sh a on a.doc_id = c.batch_id
        join sh b on b.doc_id = c.corpus_id and b.shingle = a.shingle
        group by c.batch_id, c.corpus_id
    )
    select i.batch_id, i.corpus_id,
           round(i.i / (nb.n + nc.n - i.i), 6) as jaccard
    from inter i
    join sizes nb on nb.doc_id = i.batch_id
    join sizes nc on nc.doc_id = i.corpus_id
    where i.i / (nb.n + nc.n - i.i) >= {JACCARD_T}
    """


# --- fuzzy (LSH) benchmark decontamination ---


def _lsh_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination over the near-dup corpus: benchmark = every
    20th ORIGINAL document; the corpus also holds each document's
    ' mutated' near-copy, which the exact 13-gram rule would need a
    verbatim window to catch but band collision flags — the point of
    the LSH variant. Output is total over the corpus (clean rows carry
    n_bands_hit = 0)."""
    from gdal_spark.operators.webtext import lsh_decontaminate

    corpus = _near_dup_corpus(spark, sf_dir)
    bench = (
        spark.table("documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("text")
    )
    out = lsh_decontaminate(
        corpus, bench, k=3, num_perm=NUM_PERM, rows_per_band=ROWS_PER_BAND
    )
    return out.select(
        "doc_id",
        F.col("n_bands_hit").cast("long").alias("n_bands_hit"),
        "contaminated",
    ).orderBy("doc_id")


def _lsh_decon_oracle() -> str:
    # same signature CTEs as _minhash_oracle (bit-identical band sigs);
    # benchmark = original docs with doc_id % 20 = 0, matched on raw
    # (band, sig) — the engine's combined bigint key is 1:1 with that
    # pair modulo a 60-bit hash collision. `bands` is referenced twice
    # → materialized (DuckDB inlines multi-referenced CTEs otherwise).
    ab_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup.mh_ab(NUM_PERM))
    )
    h_base = hash64("shingle", "duckdb")
    h_sig = hash64(
        "concat(cast(perm as varchar), ':', cast(mh as varchar))", "duckdb"
    )
    return f"""
    with corpus as ({NEAR_DUP_CORPUS_SQL}),
    toks as (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as w
        from corpus
    ),
    sh as (
        select distinct doc_id, concat(w, ' ', w1, ' ', w2) as shingle
        from (
            select doc_id, w,
                   lead(w, 1) over (partition by doc_id order by pos) as w1,
                   lead(w, 2) over (partition by doc_id order by pos) as w2
            from toks
        ) where w2 is not null
    ),
    mh as (
        select doc_id, ab.perm,
               min((ab.a * s.h + ab.b) % {dedup.MH_P}) as mh
        from (select doc_id, ({h_base}) % {dedup.MH_M31} as h from sh) s
        cross join (values {ab_rows}) ab(perm, a, b)
        group by doc_id, ab.perm
    ),
    bands as materialized (
        select doc_id, perm // {ROWS_PER_BAND} as band, sum({h_sig}) as sig
        from mh group by doc_id, band
    ),
    bench as (
        select distinct band, sig from bands
        where doc_id % 20 = 0 and doc_id < 100000
    ),
    hits as (
        select b.doc_id, count(distinct b.band) as nh
        from bands b join bench using (band, sig)
        group by b.doc_id
    )
    select c.doc_id,
           cast(coalesce(h.nh, 0) as bigint) as n_bands_hit,
           coalesce(h.nh, 0) > 0 as contaminated
    from corpus c left join hits h using (doc_id)
    order by doc_id
    """


# --- dedup: SimHash ---


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _near_dup_corpus(spark, sf_dir)
    return dedup.simhash(corpus, bits=16)


def _simhash_oracle(bits: int) -> str:
    return f"""
    with corpus as ({NEAR_DUP_CORPUS_SQL}),
    t as (
        select doc_id, w, count(*) as cnt,
               {hash64('w', 'duckdb')} as h
        from (select doc_id, unnest(string_split(text, ' ')) as w from corpus)
        group by doc_id, w
    ),
    bits as (
        select doc_id, b,
               sum(case when (h >> b) % 2 = 1 then cnt else -cnt end) as v
        from t cross join (select unnest(range({bits})) as b)
        group by doc_id, b
    )
    select doc_id,
           cast(sum(case when v > 0 then (cast(1 as bigint) << b) else 0 end)
                as bigint) as simhash
    from bits group by doc_id
"""


SIMHASH_ORACLE = _simhash_oracle(16)


def _dedup_simhash_mapside(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same operator, zero-shuffle physical plan: the doc-local
    simhash_cols formulation (streaming-safe signature path) against
    the SAME oracle as dedup_simhash — bit-identity is the contract."""
    corpus = _near_dup_corpus(spark, sf_dir)
    return dedup.simhash_cols(corpus, bits=16).select("doc_id", "simhash")


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs: identical 16-bit SimHash."""
    sh = dedup.simhash(_near_dup_corpus(spark, sf_dir), bits=16)
    a = sh.select(F.col("doc_id").alias("id_a"), "simhash")
    b = sh.select(F.col("doc_id").alias("id_b"), "simhash")
    return (
        a.join(b, "simhash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "simhash")
    )


SIMHASH_PAIRS_ORACLE = f"""
    with sh as ({SIMHASH_ORACLE})
    select a.doc_id as id_a, b.doc_id as id_b, a.simhash
    from sh a join sh b on a.simhash = b.simhash
    where a.doc_id < b.doc_id
"""


def _simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manku et al. 2007 near-dup: Hamming(simhash) <= 3 via the
    pigeonhole block probe. The oracle is the BRUTE-FORCE all-pairs
    Hamming join — valid because block-probe recall is provably
    perfect (see operators/dedup.simhash_hamming_pairs), so the oracle
    checks the recall guarantee itself, not just the verify step.
    32-bit signatures: at 16 bits, random non-dup pairs collide within
    Hamming 3 by chance; at 32 the rule separates the real near-dups
    (doc vs its ' mutated' twin) from noise."""
    return dedup.simhash_hamming_pairs(
        _near_dup_corpus(spark, sf_dir), bits=32, max_hamming=3
    )


SIMHASH_HAMMING_ORACLE = f"""
    with sh as ({_simhash_oracle(32)})
    select a.doc_id as id_a, b.doc_id as id_b,
           cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
    from sh a join sh b on a.doc_id < b.doc_id
    where bit_count(xor(a.simhash, b.simhash)) <= 3
"""


QUERIES = {
    "text_stats": _text_stats,
    "token_count": _token_count,
    "lang_id": _lang_id,
    "doc_fingerprint": _doc_fingerprint,
    "dedup_exact": _dedup_exact,
    "dedup_minhash_lsh": _dedup_minhash,
    "dedup_simhash": _dedup_simhash,
    "dedup_simhash_mapside": _dedup_simhash_mapside,
    "simhash_dup_pairs": _simhash_pairs,
    "simhash_hamming_pairs": _simhash_hamming,
    "lsh_decontaminate": _lsh_decontaminate,
    "dedup_incremental": _dedup_incremental,
}

ORACLES = {
    "text_stats": TEXT_STATS_ORACLE,
    "token_count": TOKEN_COUNT_ORACLE,
    "lang_id": LANG_ID_ORACLE,
    "doc_fingerprint": DOC_FINGERPRINT_ORACLE,
    "dedup_exact": DEDUP_EXACT_ORACLE,
    "dedup_minhash_lsh": _minhash_oracle(),
    "dedup_simhash": SIMHASH_ORACLE,
    "dedup_simhash_mapside": SIMHASH_ORACLE,
    "simhash_dup_pairs": SIMHASH_PAIRS_ORACLE,
    "simhash_hamming_pairs": SIMHASH_HAMMING_ORACLE,
    "lsh_decontaminate": _lsh_decon_oracle(),
    "dedup_incremental": _incremental_oracle(),
}


# --- per-row invariant (BASELINE.json input_hint): byte-identical text ---

def _text_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracted text is a byte-identical pass-through per url: decode
    the html binary column and prove it round-trips to `text`, plus an
    md5 fingerprint the oracle recomputes from the raw documents table."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        select url,
               md5(text) as text_md5,
               (decode(html, 'utf-8') = text) as html_roundtrip
        from pages
        """
    )


TEXT_PASSTHROUGH_ORACLE = """
    select concat('https://', source, '.example/', cast(doc_id as varchar)) as url,
           md5(text) as text_md5,
           true as html_roundtrip
    from documents
"""

QUERIES["text_passthrough"] = _text_passthrough
ORACLES["text_passthrough"] = TEXT_PASSTHROUGH_ORACLE


# --- skew-safe salted aggregation (SURVEY §7.3, north-rule skew clause) -----
# The deterministic geocode makes the hottest city ~10% of pages; the
# salted two-phase aggregate must produce EXACTLY the plain groupBy
# results (salting redistributes work, never values). Oracle = plain SQL
# groupBy over the same derivation.


def _skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark import tables as T
    from gdal_spark.operators.skew import salted_agg

    gp = T.geo_pages(spark, sf_dir).selectExpr(
        "url", "city_id", "length(text) as n_chars"
    )
    out = salted_agg(
        gp, key_col="city_id", id_col="url", salt_n=16,
        aggs={"sum_chars": "n_chars"},
    )
    return out.select("city_id", "cnt", "sum_chars")


def _skew_salted_oracle() -> str:
    from gdal_spark import portable as P

    return f"""
    with g as ({P.geo_pages_cte('duckdb')})
    select city_id, count(*) as cnt,
           cast(sum(length(text)) as bigint) as sum_chars
    from g group by city_id
    """


QUERIES["skew_salted_agg"] = _skew_salted_agg
ORACLES["skew_salted_agg"] = _skew_salted_oracle()


# --- dedup: direct n-gram Jaccard (rare-shingle blocking, exact verify) ---

_NGJ_T = 0.5
_NGJ_MAXDF = 50


def _dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _near_dup_corpus(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        corpus, k=3, threshold=_NGJ_T, max_df=_NGJ_MAXDF
    )


def _ngram_jaccard_oracle() -> str:
    return f"""
    with corpus as ({NEAR_DUP_CORPUS_SQL}),
    toks as (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as w
        from corpus
    ),
    sh as (
        select distinct doc_id, concat(w, ' ', w1, ' ', w2) as shingle
        from (
            select doc_id, w,
                   lead(w, 1) over (partition by doc_id order by pos) as w1,
                   lead(w, 2) over (partition by doc_id order by pos) as w2
            from toks
        ) where w2 is not null
    ),
    dfreq as (
        select shingle, count(*) as dfq from sh group by shingle
    ),
    rare as (
        select sh.doc_id, sh.shingle
        from sh join dfreq on dfreq.shingle = sh.shingle
        where dfreq.dfq <= {_NGJ_MAXDF}
    ),
    cand as (
        select distinct a.doc_id as id_a, b.doc_id as id_b
        from rare a join rare b on a.shingle = b.shingle
        where a.doc_id < b.doc_id
    ),
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    inter as (
        select c.id_a, c.id_b, count(*) as i
        from cand c
        join sh a on a.doc_id = c.id_a
        join sh b on b.doc_id = c.id_b and b.shingle = a.shingle
        group by c.id_a, c.id_b
    )
    select i.id_a, i.id_b,
           round(i.i / (na.n + nb.n - i.i), 6) as jaccard
    from inter i
    join sizes na on na.doc_id = i.id_a
    join sizes nb on nb.doc_id = i.id_b
    where i.i / (na.n + nb.n - i.i) >= {_NGJ_T}
    """


QUERIES["dedup_ngram_jaccard"] = _dedup_ngram_jaccard
ORACLES["dedup_ngram_jaccard"] = _ngram_jaccard_oracle()


# --- BPE tokenizer (operators/bpe.py) ---

# Fixed tokenizer MODEL used by the bpe_encode query (a tokenizer model
# is an input to encoding, like IVF centroids to search): the merge
# table bpe_train produced on the sf0.01 documents corpus, cross-checked
# there against an independent single-machine dict-based BPE trainer
# (tests/test_bpe.py re-verifies that parity on a fixture).  The TRAINER
# query below does NOT use this table — its oracle unrolls the k
# training rounds in SQL over whatever corpus the gate supplies, so it
# is exact at every sf.
_BPE_K = 16
_BPE_GOLDEN = [
    (1, "e", "r", 4568),
    (2, "i", "n", 2760),
    (3, "o", "w", 2747),
    (4, "o", "r", 2696),
    (5, "s", "t", 2676),
    (6, "m", "er", 1852),
    (7, "a", "t", 1845),
    (8, "l", "u", 1831),
    (9, "a", "r", 1758),
    (10, "p", "ar", 1758),
    (11, "j", "o", 964),
    (12, "jo", "in", 964),
    (13, "a", "s", 947),
    (14, "as", "h", 947),
    (15, "h", "ash", 947),
    (16, "r", "ow", 943),
]


def _bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training (operators/bpe.py bpe_train): word
    histogram collapse, then k argmax-pair rounds over the histogram."""
    from gdal_spark.operators.bpe import bpe_train, merges_df

    m = bpe_train(_docs(spark, sf_dir), k=_BPE_K)
    return merges_df(spark, m).orderBy("rank")


def _bpe_train_oracle(k: int) -> str:
    """Unrolled-in-SQL BPE training (DuckDB side): the engine's loop —
    adjacent-pair histogram, argmax with (total desc, a, b) tie-break,
    pipe-replace merge — repeated k times as a generated CTE chain, the
    same data-driven discipline as the IVF/PQ Lloyd oracles.  Exact at
    any sf because it trains on the corpus the gate supplies (the
    min_count=2 early stop is not expressed; the fixture corpora clear
    it by orders of magnitude at every sf)."""
    steps = [
        """
    h0 as materialized (
        select '|' || array_to_string(string_split(word, ''), '||')
                   || '|' as repr,
               cnt
        from (
            select word, count(*) as cnt
            from (select unnest(string_split(text, ' ')) as word
                  from documents)
            group by word
        )
    )"""
    ]
    for i in range(k):
        steps.append(f"""
    e{i} as (
        select cnt,
               unnest(range(1, len(toks))) as j,
               toks
        from (
            select cnt,
                   string_split(regexp_replace(repr, '^[|]|[|]$', '', 'g'),
                                '||') as toks
            from h{i}
        )
    ),
    t{i} as materialized (
        select a, b, total from (
            select toks[j] as a, toks[j + 1] as b,
                   sum(cnt) as total
            from e{i}
            group by a, b
        ) order by total desc, a, b limit 1
    ),
    h{i + 1} as materialized (
        select replace(h.repr,
                       '|' || t.a || '||' || t.b || '|',
                       '|' || t.a || t.b || '|') as repr,
               h.cnt
        from h{i} h, t{i} t
    )""")
    finals = " union all ".join(
        f"select {i + 1} as rank, a, b, cast(total as bigint) as total"
        f" from t{i}"
        for i in range(k)
    )
    return "with " + ",".join(steps) + f" {finals} order by rank"


ORACLES["bpe_train_merges"] = _bpe_train_oracle(_BPE_K)
QUERIES["bpe_train_merges"] = _bpe_train_merges


def _bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding with the fixed golden merge list — a per-word
    nested-replace chain over the pipe-wrapped representation, one
    narrow codegen'd expression (operators/bpe.py bpe_encode)."""
    from gdal_spark.operators.bpe import bpe_encode

    m = [(a, b) for _, a, b, _ in _BPE_GOLDEN]
    return bpe_encode(_docs(spark, sf_dir), m).orderBy("doc_id")


def _bpe_encode_oracle() -> str:
    from gdal_spark.operators.bpe import merge_chain_sql

    m = [(a, b) for _, a, b, _ in _BPE_GOLDEN]
    # same replace chain text as the engine; only the char-split and
    # list-fold syntax differ per engine.
    init = "'|' || array_to_string(string_split(w, ''), '||') || '|'"
    chain = merge_chain_sql(m, init)
    return f"""
with enc as (
  select doc_id,
         list_transform(string_split(text, ' '), w -> {chain}) as rs
  from documents
)
select doc_id,
       cast(list_sum(list_transform(rs, r ->
           (length(r) - length(replace(r, '|', ''))) // 2))
         as bigint) as n_bpe_tokens,
       md5(array_to_string(rs, ' ')) as bpe_md5
from enc order by doc_id
"""


ORACLES["bpe_encode"] = _bpe_encode_oracle()
QUERIES["bpe_encode"] = _bpe_encode


# --- Broder containment (asymmetric quote/subset near-dup) ---

_CNT_T = 0.9
_CNT_MAXDF = 50


def _containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment C(A,B)=|A∩B|/|A| over the near-dup corpus:
    every original is FULLY contained in its ' mutated' twin
    (containment_a = 1.0) even where Jaccard dips below a symmetric
    threshold — the asymmetric case Jaccard-tuned LSH misses."""
    return dedup.containment_pairs(
        _near_dup_corpus(spark, sf_dir), k=3, threshold=_CNT_T,
        max_df=_CNT_MAXDF,
    )


def _containment_oracle() -> str:
    return f"""
    with corpus as ({NEAR_DUP_CORPUS_SQL}),
    toks as (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as w
        from corpus
    ),
    sh as (
        select distinct doc_id, concat(w, ' ', w1, ' ', w2) as shingle
        from (
            select doc_id, w,
                   lead(w, 1) over (partition by doc_id order by pos) as w1,
                   lead(w, 2) over (partition by doc_id order by pos) as w2
            from toks
        ) where w2 is not null
    ),
    dfreq as (select shingle, count(*) as dfq from sh group by shingle),
    rare as (
        select sh.doc_id, sh.shingle
        from sh join dfreq on dfreq.shingle = sh.shingle
        where dfreq.dfq <= {_CNT_MAXDF}
    ),
    cand as (
        select distinct a.doc_id as id_a, b.doc_id as id_b
        from rare a join rare b on a.shingle = b.shingle
        where a.doc_id < b.doc_id
    ),
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    inter as (
        select c.id_a, c.id_b, count(*) as i
        from cand c
        join sh a on a.doc_id = c.id_a
        join sh b on b.doc_id = c.id_b and b.shingle = a.shingle
        group by c.id_a, c.id_b
    )
    select i.id_a, i.id_b,
           round(cast(i.i as double) / na.n, 6) as containment_a,
           round(cast(i.i as double) / nb.n, 6) as containment_b
    from inter i
    join sizes na on na.doc_id = i.id_a
    join sizes nb on nb.doc_id = i.id_b
    where greatest(round(cast(i.i as double) / na.n, 6),
                   round(cast(i.i as double) / nb.n, 6)) >= {_CNT_T}
    """


QUERIES["containment_pairs"] = _containment_pairs
ORACLES["containment_pairs"] = _containment_oracle()
