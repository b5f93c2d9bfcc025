"""Web-corpus curation oracle queries (operators/webtext.py): CCNet /
RefinedWeb-style boilerplate line removal, Gopher repetition-quality
rules, PII scrubbing, and URL canonicalization + dedup.

The synthetic corpus is single-line word soup, so "lines" are
fixed-width character windows (the explode / df-count / anti-join /
reassembly mechanics are identical to newline segmentation) and the PII
/ URL fixtures are injected deterministically from (doc_id, source) so
DuckDB can rebuild the exact same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

_HDR = "HDR "
_FTR = "FTR common-footer"
_W = 64  # boilerplate line width
_MIN_DF = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-row-group testdata parquet → 1 scan split; rebalance so the
    # line-split/regex map phases use the session's parallelism (a real
    # table's scan supplies the splits and this exchange disappears).
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def _boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject one per-source header line + one global footer line around
    the content chunks, detect them with heavy_lines (df >= 20), strip
    with the broadcast anti-join, and report per-doc kept-line count +
    md5 of the reassembled text."""
    from gdal_spark.operators.webtext import (
        doc_lines,
        heavy_lines,
        remove_boilerplate,
    )

    d = _docs(spark, sf_dir)
    content = doc_lines(d, width=_W).select(
        "doc_id", (F.col("pos") + 1).alias("pos"), "line"
    )
    hdr = d.select(
        "doc_id", F.lit(0).alias("pos"),
        F.concat(F.lit(_HDR), F.col("source")).alias("line"),
    )
    ftr = d.select(
        "doc_id", F.lit(999).alias("pos"), F.lit(_FTR).alias("line")
    )
    lines = hdr.unionByName(content).unionByName(ftr)
    heavy = heavy_lines(lines, min_df=_MIN_DF)
    out = remove_boilerplate(lines, heavy)
    return out.select(
        "doc_id",
        "n_lines_kept",
        F.md5("text_kept").alias("kept_md5"),
    ).orderBy("doc_id")


ORACLES["boilerplate_removal"] = f"""
with idx as (select unnest(range(0, 16)) as i),
content as (
  select doc_id, i + 1 as pos, substring(text, i*{_W} + 1, {_W}) as line
  from documents cross join idx
  where i*{_W} < length(text)
),
lines as (
  select doc_id, 0 as pos, '{_HDR}' || source as line from documents
  union all select * from content
  union all select doc_id, 999 as pos, '{_FTR}' as line from documents
),
docfreq as (
  select line, count(distinct doc_id) as df from lines group by line
),
kept as (
  select l.doc_id, l.pos, l.line
  from lines l join docfreq using(line)
  where docfreq.df < {_MIN_DF}
)
select doc_id, count(*) as n_lines_kept,
       md5(string_agg(line, '' order by pos)) as kept_md5
from kept group by doc_id order by doc_id
"""
QUERIES["boilerplate_removal"] = _boilerplate_removal


def _gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import gopher_metrics

    return gopher_metrics(_docs(spark, sf_dir)).orderBy("doc_id")


# DuckDB mirror of every Gopher metric with list lambdas; the keep flag
# compares the ROUNDED columns, mirroring the engine exactly.
ORACLES["gopher_quality"] = """
with t as (
  select doc_id, text,
         string_split(text, ' ') as toks,
         list_transform(range(0, cast(floor(greatest(length(text)-1, 0)
             / 32.0) as int) + 1),
             i -> substring(text, i*32 + 1, 32)) as lns
  from documents
),
m as (
  select doc_id, text, toks, lns,
         len(toks) as n_words,
         list_transform(range(0, greatest(len(toks)-1, 1)),
             i -> toks[i+1] || ' ' || toks[i+2]) as grams
  from t
),
g as (
  select doc_id, n_words,
         round(list_sum(list_transform(toks, w -> length(w)))
               / greatest(n_words, 1), 6) as mean_word_len,
         round(case when n_words < 2 then 0.0 else
             list_max(list_transform(list_distinct(grams), gr ->
                 len(list_filter(grams, x -> x = gr)) * length(gr)))
             / greatest(length(text), 1) end, 6) as top_2gram_char_frac,
         round(list_sum(list_concat([0], list_transform(
                 list_filter(list_distinct(lns),
                     l2 -> len(list_filter(lns, x -> x = l2)) > 1),
                 l2 -> len(list_filter(lns, x -> x = l2)))))
               / greatest(len(lns), 1), 6) as dup_line_frac,
         round(list_sum(list_concat([0], list_transform(
                 list_filter(list_distinct(lns),
                     l2 -> len(list_filter(lns, x -> x = l2)) > 1),
                 l2 -> len(list_filter(lns, x -> x = l2)) * length(l2))))
               / greatest(length(text), 1), 6) as dup_line_char_frac
  from m
)
select doc_id, n_words, mean_word_len, top_2gram_char_frac,
       dup_line_frac, dup_line_char_frac,
       (n_words between 50 and 100000
        and mean_word_len between 3.0 and 10.0
        and top_2gram_char_frac < 0.20
        and dup_line_char_frac < 0.20) as gopher_keep
from g order by doc_id
"""
QUERIES["gopher_quality"] = _gopher_quality


# Injected PII, rebuilt identically in SQL from (doc_id, text):
#   ' mail user<id>@example.com ip 10.0.<id%256>.7 tel +1 555 010 <pad4>'
_PII_SUFFIX_SPARK = (
    "concat(' mail user', cast(doc_id as string), "
    "'@example.com ip 10.0.', cast(doc_id % 256 as string), "
    "'.7 tel +1 555 010 ', lpad(cast(doc_id % 10000 as string), 4, '0'))"
)
_PII_SUFFIX_DUCK = (
    "' mail user' || doc_id || '@example.com ip 10.0.' || "
    "(doc_id % 256) || '.7 tel +1 555 010 ' || "
    "lpad((doc_id % 10000)::varchar, 4, '0')"
)


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import pii_scrub

    d = _docs(spark, sf_dir).withColumn(
        "text", F.expr(f"concat(text, {_PII_SUFFIX_SPARK})")
    )
    out = pii_scrub(d)
    return out.select(
        "doc_id", "n_emails", "n_ips", "n_phones",
        F.md5("scrubbed").alias("scrubbed_md5"),
    ).orderBy("doc_id")


def _pii_oracle() -> str:
    from gdal_spark.operators.webtext import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
with t as (
  select doc_id, text || {_PII_SUFFIX_DUCK} as text from documents
)
select doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) as n_emails,
       len(regexp_extract_all(text, '{IPV4_RE}')) as n_ips,
       len(regexp_extract_all(text, '{PHONE_RE}')) as n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g')) as scrubbed_md5
from t order by doc_id
"""


ORACLES["pii_scrub"] = _pii_oracle()
QUERIES["pii_scrub"] = _pii_scrub


# Synthetic URL: mixed case, default port, tracking params, fragment.
_URL_SPARK = (
    "concat('HTTPS://', upper(source), '.Example.com:443/page/', "
    "cast(doc_id % 40 as string), '/?utm_source=feed&ref=', "
    "cast(doc_id % 3 as string), '#frag')"
)
_URL_DUCK = (
    "'https://' || source || '.example.com/page/' || (doc_id % 40) || "
    "'/?ref=' || (doc_id % 3)"
)


def _url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import dedup_by_url

    d = _docs(spark, sf_dir).withColumn("url", F.expr(_URL_SPARK))
    return dedup_by_url(d).orderBy("canon_url")


# The canonical form is closed-form: lowercase, port gone, utm gone,
# fragment gone; the trailing '/' precedes '?' so it survives (only a
# URL-final slash is stripped).  Group key = (source, id%40, id%3).
ORACLES["url_dedup"] = f"""
select {_URL_DUCK} as canon_url,
       min(doc_id) as keep_id,
       count(*) as n_dups
from documents
group by canon_url
order by canon_url
"""
QUERIES["url_dedup"] = _url_dedup


def _quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import quality_score_linear

    return quality_score_linear(_docs(spark, sf_dir)).orderBy("doc_id")


def _quality_linear_oracle() -> str:
    from gdal_spark.portable import hash64

    dim = 1024
    b = hash64("w", "duck")
    wt = hash64(f"'wt' || (({b}) % {dim})::varchar", "duck")
    return f"""
with t as (
  select doc_id, string_split(text, ' ') as toks from documents
),
z as (
  select doc_id, len(toks) as n_tokens,
         cast(list_sum(list_transform(toks,
             w -> ({wt}) % 2001 - 1000)) as bigint) as logit_milli
  from t
)
select doc_id, n_tokens, logit_milli,
       round(logit_milli / (1000.0 * n_tokens), 6) as score,
       (logit_milli > 0) as quality_keep
from z order by doc_id
"""


ORACLES["quality_linear"] = _quality_linear_oracle()
QUERIES["quality_linear"] = _quality_linear


# --- corpus-duplicated k-gram spans (exact-substring dedup signal) ---

# 10-token span appended to every 5th doc: those docs share 6 interior
# 5-grams corpus-wide; the span/doc boundary grams stay unique per doc.
_SPAN = " shared span alpha beta gamma delta epsilon zeta eta theta"
_K = 5


def _dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.dedup import dup_ngram_stats

    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(_SPAN))
        ).otherwise(F.col("text")),
    )
    return dup_ngram_stats(d, k=_K).orderBy("doc_id")


ORACLES["dup_ngram_spans"] = f"""
with corpus as (
  select doc_id,
         case when doc_id % 5 = 0 then text || '{_SPAN}' else text end as text
  from documents
),
t as (select doc_id, string_split(text, ' ') as toks from corpus),
sh as (
  select distinct doc_id, gram from (
    select doc_id, array_to_string(toks[i+1:i+{_K}], ' ') as gram
    from t cross join (select unnest(range(0,
         (select max(len(toks)) from t))) as i)
    where i + {_K} <= len(toks)
  )
),
dfreq as (select gram, count(*) as gdf from sh group by gram)
select doc_id, count(*) as n_grams,
       cast(sum(case when gdf > 1 then 1 else 0 end) as bigint)
           as n_dup_grams,
       round(cast(sum(case when gdf > 1 then 1 else 0 end) as double)
             / count(*), 6) as dup_frac
from sh join dfreq using(gram)
group by doc_id order by doc_id
"""
QUERIES["dup_ngram_spans"] = _dup_ngram_spans


# --- end-to-end near-dup resolution: pairs -> components -> canonical ---


def _dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators import dedup
    from gdal_spark.operators.dedup import dedup_clusters
    from gdal_spark.queries import textops

    corpus = textops._near_dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus,
        k=3,
        num_perm=textops.NUM_PERM,
        rows_per_band=textops.ROWS_PER_BAND,
        threshold=textops.JACCARD_T,
    )
    return dedup_clusters(corpus, pairs).orderBy("doc_id")


def _dedup_cluster_oracle() -> str:
    from gdal_spark.queries import textops

    return f"""
with recursive pairs as (
  {textops._minhash_oracle()}
),
corpus as ({textops.NEAR_DUP_CORPUS_SQL}),
e as (
  select id_a as la, id_b as lb from pairs
  union select id_b as la, id_a as lb from pairs
  union select doc_id as la, doc_id as lb from corpus
),
reach(node, r) as (
  select la, la from e
  union
  select e.lb, reach.r from reach join e on e.la = reach.node
)
select node as doc_id, min(r) as cluster_id, (node = min(r)) as keep
from reach group by node order by doc_id
"""


ORACLES["dedup_cluster_canonical"] = _dedup_cluster_oracle()
QUERIES["dedup_cluster_canonical"] = _dedup_cluster_canonical


# --- domain-stratified deterministic sampling (corpus mixing) ---


def _sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import stratified_sample
    from gdal_spark.portable import hash64

    d = _docs(spark, sf_dir)
    h_rate = hash64("concat('rate', source)", "spark")
    rate = f"100 + ({h_rate}) % 800"
    rates = (
        d.select("source")
        .distinct()
        .withColumn("rate_permille", F.expr(rate))
    )
    samp = stratified_sample(d, rates)
    tot = d.groupBy("source").agg(F.count("*").alias("n_total"))
    s = samp.groupBy("source").agg(F.count("*").alias("n_sampled"))
    return (
        tot.join(s, "source", "left")
        .join(rates, "source")
        .select(
            "source",
            "n_total",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            "rate_permille",
        )
        .orderBy("source")
    )


def _sample_stratified_oracle() -> str:
    from gdal_spark.portable import hash64

    h_rate = hash64("concat('rate', source)", "duckdb")
    h_gate = hash64("concat('smp', cast(doc_id as varchar))", "duckdb")
    return f"""
with r as (
  select doc_id, source,
         100 + ({h_rate}) % 800 as rate_permille,
         ({h_gate}) % 1000 as gate
  from documents
)
select source, count(*) as n_total,
       cast(sum(case when gate < rate_permille then 1 else 0 end)
            as bigint) as n_sampled,
       min(rate_permille) as rate_permille
from r group by source order by source
"""


ORACLES["sample_stratified"] = _sample_stratified_oracle()
QUERIES["sample_stratified"] = _sample_stratified


# --- benchmark decontamination (13-gram overlap rule) ---

_DECON_K = 13


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import decontaminate

    d = _docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 97 == 0).select("text")
    out = decontaminate(d, bench, k=_DECON_K)
    return out.select(
        "doc_id", "n_contaminated_grams", "contaminated"
    ).orderBy("doc_id")


ORACLES["decontaminate"] = f"""
with bt as (select text from documents where doc_id % 97 = 0),
bg as (
  select distinct array_to_string(toks[i+1:i+{_DECON_K}], ' ') as gram
  from (select string_split(text, ' ') as toks from bt)
  cross join (select unnest(range(0,
       (select max(len(string_split(text, ' '))) from bt))) as i)
  where i + {_DECON_K} <= len(toks)
),
g as (
  select distinct doc_id, array_to_string(toks[i+1:i+{_DECON_K}], ' ') as gram
  from (select doc_id, string_split(text, ' ') as toks from documents)
  cross join (select unnest(range(0,
       (select max(len(string_split(text, ' '))) from documents))) as i)
  where i + {_DECON_K} <= len(toks)
),
hits as (
  select doc_id, count(*) as n from g join bg using(gram) group by doc_id
)
select d.doc_id,
       cast(coalesce(hits.n, 0) as bigint) as n_contaminated_grams,
       coalesce(hits.n, 0) > 0 as contaminated
from documents d left join hits using(doc_id)
order by doc_id
"""
QUERIES["decontaminate"] = _decontaminate


# --- sequence packing (token-budget bins per shard stream) ---

_PACK_BUDGET = 256


def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import pack_sequences

    out = pack_sequences(_docs(spark, sf_dir), budget=_PACK_BUDGET)
    return out.select(
        "doc_id",
        "part",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "seq_pos",
        "seq_id",
    ).orderBy("doc_id")


ORACLES["pack_sequences"] = f"""
with t as (
  select doc_id, source as part,
         len(string_split(text, ' ')) as n_tokens
  from documents
),
c as (
  select doc_id, part, n_tokens,
         cast(coalesce(sum(n_tokens) over (
             partition by part order by doc_id
             rows between unbounded preceding and 1 preceding
         ), 0) as bigint) as seq_pos
  from t
)
select doc_id, part, n_tokens, seq_pos,
       seq_pos // {_PACK_BUDGET} as seq_id
from c order by doc_id
"""
QUERIES["pack_sequences"] = _pack_sequences


def _lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM quality scoring (operators/webtext.py
    lm_perplexity): add-1 bigram LM trained on the corpus itself,
    per-doc cross-entropy from a 6-dp-rounded DECIMAL log-prob sum
    (order-independent), tercile head/middle/tail bucket."""
    from gdal_spark.operators.webtext import lm_perplexity

    return lm_perplexity(_docs(spark, sf_dir)).orderBy("doc_id")


# DuckDB mirror: the two unnests zip positionally, rebuilding the exact
# (prev, w) bigram rows; the decimal cast mirrors the engine's exact
# accumulation, so xent matches bit-for-bit and only ppl = exp(xent)
# (rounded 4 dp) re-enters float land.
ORACLES["lm_perplexity"] = """
with t as (select doc_id, string_split(text, ' ') as toks from documents),
bg as (
  select doc_id,
         unnest(list_transform(range(1, len(toks) + 1),
             i -> case when i = 1 then '<s>' else toks[i - 1] end)) as prev,
         unnest(toks) as w
  from t
),
lm as (select prev, w, count(*) as c_bi from bg group by 1, 2),
ctx as (select prev, sum(c_bi) as c_ctx from lm group by 1),
v as (select count(distinct w) as v from bg),
s as (
  select bg.doc_id,
         cast(round(ln((lm.c_bi + 1.0) / (ctx.c_ctx + 1.0 * v.v)), 6)
              as decimal(18,6)) as logp
  from bg join lm using (prev, w) join ctx using (prev) cross join v
),
d as (
  select doc_id, count(*) as n_bigrams,
         round(-cast(sum(logp) as double) / count(*), 6) as xent
  from s group by doc_id
)
select doc_id, n_bigrams, xent, round(exp(xent), 4) as ppl,
       cast(ntile(3) over (order by xent, doc_id) as int) as bucket
from d order by doc_id
"""
QUERIES["lm_perplexity"] = _lm_perplexity


def _tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 TF-IDF terms (operators/webtext.py tfidf_terms),
    ranked on ROUNDED scores with a term-asc tie-break."""
    from gdal_spark.operators.webtext import tfidf_terms

    return tfidf_terms(_docs(spark, sf_dir)).orderBy("doc_id", "rank")


ORACLES["tfidf_terms"] = """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) as term from documents
),
tf as (select doc_id, term, count(*) as tf from tok group by 1, 2),
dfreq as (select term, count(*) as df from tf group by 1),
n as (select count(distinct doc_id) as n from documents),
s as (
  select tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(tf.tf * round(ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1, 6), 6)
           as score
  from tf join dfreq using (term) cross join n
),
r as (
  select *, cast(row_number() over (
      partition by doc_id order by score desc, term) as int) as rank
  from s
)
select doc_id, term, tf, df, score, rank
from r where rank <= 5 order by doc_id, rank
"""
QUERIES["tfidf_terms"] = _tfidf_terms


# --- fixed-window chunking with overlap (RAG / pretraining windows) ---

_CHUNK = 32
_STRIDE = 24


def _chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token windows (operators/webtext.py chunk_documents):
    chunk=32 / stride=24 → 8-token overlap; pure codegen'd array
    lambdas, zero shuffle (the presentation orderBy is the query's,
    not the operator's)."""
    from gdal_spark.operators.webtext import chunk_documents

    out = chunk_documents(_docs(spark, sf_dir), chunk=_CHUNK, stride=_STRIDE)
    return out.orderBy("doc_id", "chunk_id")


CHUNK_OVERLAP_ORACLE = """
with t as (
  select doc_id, string_split(text, ' ') as toks from documents
),
c as (
  select doc_id,
         unnest(range(0, cast(greatest(ceil((len(toks) - {CH}.0) / {ST}.0),
                                       0) as int) + 1)) as chunk_id,
         toks
  from t
)
select doc_id, cast(chunk_id as int) as chunk_id,
       len(toks[chunk_id * {ST} + 1 : chunk_id * {ST} + {CH}])
         as n_chunk_tokens,
       md5(array_to_string(
             toks[chunk_id * {ST} + 1 : chunk_id * {ST} + {CH}], ' '))
         as chunk_md5
from c order by doc_id, chunk_id
""".replace("{CH}", str(_CHUNK)).replace("{ST}", str(_STRIDE))
QUERIES["chunk_overlap"] = _chunk_overlap
ORACLES["chunk_overlap"] = CHUNK_OVERLAP_ORACLE


# --- exact-substring duplicate removal (the edit step of Lee et al.) ---


def _remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rewrite dropping every token inside a k-gram window that
    occurs >= 2 times corpus-wide (operators/dedup.py remove_dup_spans);
    same planted-span fixture as dup_ngram_spans so there are true
    duplicated spans to cut."""
    from gdal_spark.operators.dedup import remove_dup_spans

    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(_SPAN))
        ).otherwise(F.col("text")),
    )
    return remove_dup_spans(d, k=_K).orderBy("doc_id")


ORACLES["remove_dup_spans"] = """
with corpus as (
  select doc_id,
         case when doc_id % 5 = 0 then text || '{SPAN}' else text end as text
  from documents
),
t as (select doc_id, string_split(text, ' ') as toks from corpus),
w as (
  select doc_id, i as pos, array_to_string(toks[i+1:i+{K}], ' ') as gram
  from t cross join (select unnest(range(0,
       (select max(len(toks)) from t))) as i)
  where i + {K} <= len(toks)
),
cnt as (select gram, count(*) as c from w group by gram),
fl as (
  select doc_id, list_sort(list(pos)) as starts
  from (select w.doc_id, w.pos from w join cnt using(gram) where c >= 2)
  group by doc_id
),
j as (
  select t.doc_id, t.toks, coalesce(fl.starts, []) as starts
  from t left join fl using(doc_id)
),
tok_idx as (
  select j.doc_id, idx, j.toks[idx + 1] as tok, j.starts
  from j cross join (select unnest(range(0,
       (select max(len(toks)) from t))) as idx)
  where idx < len(j.toks)
),
kept as (
  select doc_id, idx, tok from tok_idx
  where len(list_filter(starts, p -> idx >= p and idx < p + {K})) = 0
),
agg as (
  select doc_id, count(*) as n_kept_tokens,
         md5(string_agg(tok, ' ' order by idx)) as clean_md5
  from kept group by doc_id
)
select j.doc_id, len(j.toks) as n_tokens,
       cast(coalesce(agg.n_kept_tokens, 0) as int) as n_kept_tokens,
       coalesce(agg.clean_md5, md5('')) as clean_md5
from j left join agg using(doc_id)
order by doc_id
""".replace("{K}", str(_K)).replace("{SPAN}", _SPAN)
QUERIES["remove_dup_spans"] = _remove_dup_spans


def _dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/webtext.py dsir_select):
    hashed unigram+bigram bucket distributions, add-alpha-smoothed
    target/raw log-ratio weights summed exactly in DECIMAL, keep the
    top quarter most target-like docs (target = the English subset)."""
    from gdal_spark.operators.webtext import dsir_select

    docs = _docs(spark, sf_dir)
    return dsir_select(docs, docs.where("lang = 'en'")).orderBy("rank")


def _dsir_oracle() -> str:
    from gdal_spark.portable import hash64

    b = hash64("gram", "duck")
    return """
with t as (select doc_id, string_split(text, ' ') as toks, lang
           from documents),
g as materialized (
  select doc_id, lang,
         {B} % 4096 as bucket
  from (
    select doc_id, lang,
           unnest(list_concat(
             list_transform(toks, w -> '1|' || w),
             list_transform(range(2, len(toks) + 1),
                 i -> '2|' || toks[i - 1] || ' ' || toks[i])
           )) as gram
    from t
  )
),
fr as materialized (
  select doc_id, bucket, count(*) as c from g group by 1, 2
),
raw_b as (select bucket, sum(c) as c_raw from fr group by 1),
tgt_b as (select bucket, count(*) as c_tgt from g
          where lang = 'en' group by 1),
tot as (select (select count(*) from g) as traw,
               (select count(*) from g where lang = 'en') as ttgt),
lr as (
  select raw_b.bucket,
         cast(round(
           ln((coalesce(tgt_b.c_tgt, 0) + 0.5) / (tot.ttgt + 0.5 * 4096))
           - ln((raw_b.c_raw + 0.5) / (tot.traw + 0.5 * 4096)), 6)
           as decimal(18,6)) as lr
  from raw_b left join tgt_b using (bucket) cross join tot
),
s as (
  select fr.doc_id, cast(sum(fr.c) as bigint) as n_grams,
         sum(fr.c * lr.lr) as w
  from fr join lr using (bucket) group by 1
),
r as (
  select doc_id, n_grams,
         round(cast(w as double), 6) as weight,
         cast(row_number() over (order by w desc, doc_id) as int) as rank
  from s
)
select doc_id, n_grams, weight, rank from r
where rank <= ceil(0.25 * (select count(*) from documents))
order by rank
""".replace("{B}", b)


ORACLES["dsir_select"] = _dsir_oracle()
QUERIES["dsir_select"] = _dsir_select


# --- C4 cleaning rules (Raffel et al. 2020) ---
#
# The word-soup corpus has no punctuation or line breaks, so the fixture
# decorates the fixed-width windows deterministically from (doc_id, pos):
# a terminal-punct cycle ('.', '!', '?', none), a mid-line "javascript"
# injection, one always-too-short line, and doc-level poisons ("lorem
# ipsum", '{', blocklist word) on fixed doc_id residues — both engines
# rebuild the identical documents, then apply the identical rules.

_C4_W = 64


def _c4_text_expr() -> "F.Column":
    wins = (
        f"transform(sequence(0, int(floor(greatest(length(text)-1,0)"
        f"/{_C4_W}))), i -> concat(substring(text, i*{_C4_W}+1, {_C4_W}), "
        f"case when (doc_id + 3*i) % 17 = 0 then ' javascript extra' "
        f"else '' end, "
        f"element_at(array('.', '!', '?', ''), int((doc_id*7 + i) % 4) + 1)))"
    )
    extras = (
        "concat(array('too short.'), "
        "case when doc_id % 13 = 0 then "
        "array('lorem ipsum dolor sit amet here.') "
        "else cast(array() as array<string>) end, "
        "case when doc_id % 11 = 3 then "
        "array('this config block has a bracket { inside it.') "
        "else cast(array() as array<string>) end, "
        "case when doc_id % 19 = 5 then "
        "array('this page mentions zoinks and more words here.') "
        "else cast(array() as array<string>) end)"
    )
    return F.array_join(F.expr(f"concat({wins}, {extras})"), "\n")


def _c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (operators/webtext.py c4_filter) over the
    deterministically decorated corpus; zero-shuffle doc-local plan."""
    from gdal_spark.operators.webtext import c4_filter

    d = _docs(spark, sf_dir).withColumn("text", _c4_text_expr())
    out = c4_filter(d, blocklist=("zoinks",))
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept").cast("long").alias("n_kept"),
        "c4_keep",
        F.md5("text_clean").alias("kept_md5"),
    ).orderBy("doc_id")


ORACLES["c4_filter"] = f"""
with base as (
  select doc_id,
    list_transform(range(0, cast(floor(greatest(length(text)-1, 0)
        /{_C4_W}.0) as int) + 1),
      i -> substring(text, cast(i*{_C4_W} + 1 as int), {_C4_W})
           || (case when (doc_id + 3*i) % 17 = 0 then ' javascript extra'
               else '' end)
           || (['.', '!', '?', ''])[cast((doc_id*7 + i) % 4 as int) + 1])
      as wins
  from documents
),
lines as (
  select doc_id,
    wins || ['too short.']
         || (case when doc_id % 13 = 0 then
             ['lorem ipsum dolor sit amet here.']
             else cast([] as varchar[]) end)
         || (case when doc_id % 11 = 3 then
             ['this config block has a bracket ' || chr(123) || ' inside it.']
             else cast([] as varchar[]) end)
         || (case when doc_id % 19 = 5 then
             ['this page mentions zoinks and more words here.']
             else cast([] as varchar[]) end) as lns
  from base
),
m as (
  select doc_id, len(lns) as n_lines,
    list_filter(lns, x ->
        (right(x, 1) in ('.', '!', '?', '"'))
        and len(string_split(x, ' ')) >= 5
        and not contains(lower(x), 'javascript')) as kept,
    (contains(lower(array_to_string(lns, chr(10))), 'lorem ipsum')
     or contains(array_to_string(lns, chr(10)), chr(123))
     or list_has_any(flatten(list_transform(lns,
            x -> string_split(lower(x), ' '))), ['zoinks'])) as doc_bad
  from lines
)
select doc_id, n_lines, cast(len(kept) as bigint) as n_kept,
       (not doc_bad and len(kept) >= 3) as c4_keep,
       case when (not doc_bad and len(kept) >= 3)
            then md5(array_to_string(kept, chr(10))) end as kept_md5
from m order by doc_id
"""
QUERIES["c4_filter"] = _c4_filter


# --- BM25 lexical retrieval (Robertson & Zaragoza 2009) ---

_BM25_QUERIES = [
    (0, "spark join table"),
    (1, "window group vector"),
    (2, "customer order data"),
    (3, "stream filter slow"),
    (4, "batch scan key"),
]


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 per query (operators/webtext.py bm25_topk): Lucene
    idf, per-term contributions as exact 6-dp DECIMAL sums, rank on the
    decimal score with doc-id tie-break."""
    from gdal_spark.operators.webtext import bm25_topk

    q = spark.createDataFrame(_BM25_QUERIES, "q_id long, q_text string")
    out = bm25_topk(_docs(spark, sf_dir), q, k=5)
    return out.orderBy("q_id", "rank")


def _bm25_oracle() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    return f"""
with q(q_id, q_text) as (values {vals}),
qt as (select distinct q_id, unnest(string_split(q_text, ' ')) as term
       from q),
tset as (select distinct term from qt),
d as (select doc_id, len(string_split(text, ' ')) as dl from documents),
stats as (select count(*) as n, avg(dl) as avgdl from d),
tok as (select doc_id, unnest(string_split(text, ' ')) as term
        from documents),
hits as (
  select tok.doc_id, tok.term, count(*) as tf, any_value(d.dl) as dl
  from tok join tset using (term) join d using (doc_id)
  group by 1, 2
),
dfreq as (select term, count(*) as df from hits group by 1),
idf as (
  select term,
         round(ln(1e0 + (cast(n - df as double) + 0.5e0)
                        / (cast(df as double) + 0.5e0)), 6) as idf,
         avgdl
  from dfreq cross join stats
),
contrib as (
  select h.doc_id, h.term,
         cast(round(idf.idf * ((cast(h.tf as double) * (1.2e0 + 1e0))
             / (cast(h.tf as double) + 1.2e0 * ((1e0 - 0.75e0)
                + 0.75e0 * cast(h.dl as double) / idf.avgdl))), 6)
              as decimal(18,6)) as c
  from hits h join idf using (term)
),
scored as (
  select qt.q_id, c.doc_id, sum(c.c) as s
  from contrib c join qt using (term) group by 1, 2
),
r as (
  select q_id, doc_id, s,
         cast(row_number() over (partition by q_id
              order by s desc, doc_id) as int) as rank
  from scored
)
select q_id, doc_id, round(cast(s as double), 6) as score, rank
from r where rank <= 5 order by q_id, rank
"""


ORACLES["bm25_topk"] = _bm25_oracle()
QUERIES["bm25_topk"] = _bm25_topk


# --- temperature-scaled domain mixing (UniMax-ish) ---------------------------
# n_d^0.5 temperature allocation with the <=1-epoch cap, integer-exact end to
# end: weight = floor(sqrt(n_d)) (IEEE sqrt is correctly rounded in both
# engines), every downstream value is bigint integer division — no float sum
# anywhere, so the plan table is bit-identical regardless of accumulation
# order.  Gate = portable md5 hash64, the same mirror as sample_stratified.

_MIX_BUDGET = 200


def _domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import domain_mix

    d = _docs(spark, sf_dir)
    return domain_mix(d, budget=_MIX_BUDGET, sqrt_steps=1).orderBy("source")


def _domain_mix_oracle() -> str:
    from gdal_spark.portable import hash64

    h_gate = hash64("concat('mix', cast(doc_id as varchar))", "duckdb")
    return f"""
with c as (
  select source, count(*) as n_total,
         cast(floor(sqrt(cast(count(*) as double))) as bigint) as weight
  from documents group by source
),
t as (select cast(sum(weight) as bigint) as w_sum from c),
r as (
  select c.source, c.n_total, c.weight,
         cast(least(cast({_MIX_BUDGET} as bigint) * c.weight // t.w_sum,
                    c.n_total) as bigint) as target
  from c, t
),
r2 as (
  select source, n_total, weight, target,
         cast(least(cast(1000 as bigint), (1000 * target) // n_total)
              as bigint) as rate_permille
  from r
),
g as (
  select doc_id, source, ({h_gate}) % 1000 as gate from documents
)
select r2.source, r2.n_total, r2.weight, r2.target, r2.rate_permille,
       cast(sum(case when g.gate < r2.rate_permille then 1 else 0 end)
            as bigint) as n_kept
from r2 join g on g.source = r2.source
group by r2.source, r2.n_total, r2.weight, r2.target, r2.rate_permille
order by r2.source
"""


QUERIES["domain_mix"] = _domain_mix
ORACLES["domain_mix"] = _domain_mix_oracle()


# --- character-entropy quality filter ----------------------------------------
# Doc-local char unigram entropy (operators/webtext.py char_entropy): per-term
# round-6 DECIMAL accumulation makes the sum order-independent, so the oracle
# can take the unnest+groupBy route while the engine stays a zero-shuffle
# array fold — same discipline as lm_perplexity.


def _char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.webtext import char_entropy

    return char_entropy(_docs(spark, sf_dir), min_bits=3.0).orderBy("doc_id")


ORACLES["char_entropy_filter"] = """
with c as (
  select doc_id,
         unnest(list_filter(string_split(text, ''), x -> x <> '')) as ch
  from documents
),
n as (select doc_id, count(*) as n_chars from c group by doc_id),
t as (select doc_id, ch, count(*) as cnt from c group by doc_id, ch),
terms as (
  select t.doc_id,
         cast(round((t.cnt / cast(n.n_chars as double))
                    * log2(t.cnt / cast(n.n_chars as double)), 6)
              as decimal(18,6)) as term
  from t join n using (doc_id)
),
e as (
  select doc_id, count(*) as n_distinct,
         round(-cast(sum(term) as double), 6) as char_entropy
  from terms group by doc_id
)
select d.doc_id,
       cast(coalesce(n.n_chars, 0) as int) as n_chars,
       cast(coalesce(e.n_distinct, 0) as int) as n_distinct,
       coalesce(e.char_entropy, cast(0 as double)) as char_entropy,
       coalesce(e.char_entropy, cast(0 as double)) >= 3.0 as keep
from documents d
left join n using (doc_id)
left join e using (doc_id)
order by doc_id
"""
QUERIES["char_entropy_filter"] = _char_entropy


# --- leakage-safe train/eval split (cluster-level assignment) -----------------
# Same near-dup corpus + minhash pair generation as dedup_cluster_canonical;
# the split gate hashes the cluster canonical (min id), so near-dup twins can
# never straddle the split (Lee et al. 2022 arXiv:2107.06499 §6.2).

_SPLIT_EVAL_PERMILLE = 200


def _cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators import dedup
    from gdal_spark.queries import textops

    corpus = textops._near_dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus,
        k=3,
        num_perm=textops.NUM_PERM,
        rows_per_band=textops.ROWS_PER_BAND,
        threshold=textops.JACCARD_T,
    )
    return dedup.cluster_safe_split(
        corpus, pairs, eval_permille=_SPLIT_EVAL_PERMILLE
    ).orderBy("doc_id")


def _cluster_safe_split_oracle() -> str:
    from gdal_spark.portable import hash64
    from gdal_spark.queries import textops

    h_gate = hash64("concat('split', cast(cluster_id as varchar))", "duckdb")
    return f"""
with recursive pairs as (
  {textops._minhash_oracle()}
),
corpus as ({textops.NEAR_DUP_CORPUS_SQL}),
e as (
  select id_a as la, id_b as lb from pairs
  union select id_b as la, id_a as lb from pairs
  union select doc_id as la, doc_id as lb from corpus
),
reach(node, r) as (
  select la, la from e
  union
  select e.lb, reach.r from reach join e on e.la = reach.node
),
cl as (
  select node as doc_id, min(r) as cluster_id from reach group by node
)
select doc_id, cluster_id,
       case when ({h_gate}) % 1000 < {_SPLIT_EVAL_PERMILLE}
            then 'eval' else 'train' end as split
from cl order by doc_id
"""


ORACLES["cluster_safe_split"] = _cluster_safe_split_oracle()
QUERIES["cluster_safe_split"] = _cluster_safe_split


# --- Kneser–Ney bigram perplexity (quality filtering, KN smoothing) ---


def _kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (operators/webtext.py
    kn_perplexity): discounted bigram ML + continuation-probability
    backoff, per-doc cross-entropy from a 6-dp decimal log-prob sum."""
    from gdal_spark.operators.webtext import kn_perplexity

    return kn_perplexity(_docs(spark, sf_dir)).orderBy("doc_id")


# DuckDB mirror of the engine's exact arithmetic: identical float
# expression shape ((c−d)/ctx + (d·n1p/ctx)·(cont/T), every divisor an
# exactly-representable integer), ln rounded to 6 dp into DECIMAL(18,6)
# so the per-doc sum is order-independent. bg/lm are multi-referenced —
# materialized to stop DuckDB's exponential CTE inlining.
ORACLES["kn_perplexity"] = """
with t as (select doc_id, string_split(text, ' ') as toks from documents),
bg as materialized (
  select doc_id,
         unnest(list_transform(range(1, len(toks) + 1),
             i -> case when i = 1 then '<s>' else toks[i - 1] end)) as prev,
         unnest(toks) as w
  from t
),
lm as materialized (
  select prev, w, count(*) as c_bi from bg group by 1, 2
),
ctx as (select prev, sum(c_bi) as c_ctx, count(*) as n1p from lm group by 1),
cont as (select w, count(*) as n_cont from lm group by 1),
ty as (select count(*) as t from lm),
s as (
  select bg.doc_id,
         cast(round(ln(
             (lm.c_bi - cast(0.75 as double)) / ctx.c_ctx
             + (cast(0.75 as double) * ctx.n1p / ctx.c_ctx)
               * (cont.n_cont / ty.t)
         ), 6) as decimal(18,6)) as logp
  from bg join lm using (prev, w) join ctx using (prev)
       join cont using (w) cross join ty
),
d as (
  select doc_id, count(*) as n_bigrams,
         cast(-sum(logp) * 1000000 as bigint) as s_micro
  from s group by doc_id
),
x as (
  -- integer-space half-up round of S_micro/n: a float round here is a
  -- trap (lattice-sum / count can land exactly on the 5e-7 boundary)
  select doc_id, n_bigrams,
         cast((2 * s_micro + n_bigrams) // (2 * n_bigrams) as double)
           / cast(1000000 as double) as xent
  from d
)
select doc_id, n_bigrams, xent, round(exp(xent), 4) as ppl
from x order by doc_id
"""
QUERIES["kn_perplexity"] = _kn_perplexity


# --- per-domain exact-quantile quality gate ---


def _domain_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-40% gate on an integer-exact chars-per-token score
    (operators/webtext.py domain_quantile_filter): exact rank-based
    quantile, integer-space cutoff, one shuffle on the domain key."""
    from gdal_spark.operators.webtext import domain_quantile_filter

    return domain_quantile_filter(_docs(spark, sf_dir)).orderBy(
        "source", "doc_id"
    )


ORACLES["domain_quantile"] = """
with sc as (
  select doc_id, source,
         len(string_split(text, ' ')) as n_toks,
         (length(text) * 1000) // len(string_split(text, ' '))
           as score_milli
  from documents
),
r as (
  select *,
         row_number() over (
             partition by source
             order by score_milli desc, doc_id asc) as rnk,
         count(*) over (partition by source) as n_in_domain
  from sc
)
select doc_id, source, n_toks, score_milli, cast(rnk as bigint) as rnk
from r where rnk <= (n_in_domain * 2 + 5 - 1) // 5
order by source, doc_id
"""
QUERIES["domain_quantile"] = _domain_quantile


# --- k-gram novelty (curriculum ordering / crawl-dive triage) ---


def _ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 5-gram shingles first seen (by
    min doc_id) in that doc (operators/webtext.py ngram_novelty) —
    integer counts, one rounded division."""
    from gdal_spark.operators.webtext import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir)).orderBy("doc_id")


# Window bound is corpus-derived (range over len(toks)), per the r4
# ADVICE on fixed-bound unnest truncation.
ORACLES["ngram_novelty"] = """
with t as (select doc_id, string_split(text, ' ') as toks from documents
           where len(string_split(text, ' ')) >= 5),
g as materialized (
  select distinct doc_id, gram from (
    select doc_id,
           unnest(list_transform(range(1, len(toks) - 3),
               i -> array_to_string(toks[i:i+4], ' '))) as gram
    from t) u
),
f as (select gram, min(doc_id) as first_doc from g group by 1),
p as (
  select g.doc_id, count(*) as n_grams,
         cast(sum(case when f.first_doc = g.doc_id then 1 else 0 end)
              as bigint) as n_novel
  from g join f using (gram) group by 1
)
select doc_id, n_grams, n_novel,
       round(n_novel / n_grams, 6) as novelty
from p order by doc_id
"""
QUERIES["ngram_novelty"] = _ngram_novelty


# --- winnowing fingerprints (Schleimer et al. 2003, MOSS) ---

_WINNOW_K = 4
_WINNOW_W = 4


def _winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed (pos, fp) fingerprint set per doc (operators/webtext.py
    winnow_fingerprints): window-min of portable-hashed 4-grams,
    rightmost tie, doc-local zero-shuffle plan."""
    from gdal_spark.operators.webtext import winnow_fingerprints

    return winnow_fingerprints(
        _docs(spark, sf_dir), k=_WINNOW_K, w=_WINNOW_W
    ).orderBy("doc_id", "pos")


# Same md5 60-bit gram hash, same window-min + rightmost-tie selection
# (list_position over the REVERSED window) — positions are 0-based gram
# indices in both engines.
ORACLES["winnow_fingerprint"] = f"""
with t as (select doc_id, string_split(text, ' ') as toks from documents
           where len(string_split(text, ' ')) >= {_WINNOW_K + _WINNOW_W - 1}),
g as materialized (
  select doc_id,
         list_transform(range(1, len(toks) - {_WINNOW_K} + 2),
             i -> cast(concat('0x', substring(md5(
                 array_to_string(toks[i:i+{_WINNOW_K - 1}], ' ')),1,15))
                 as bigint)) as h
  from t
),
fp as (
  select distinct doc_id, u.pos as pos, u.fp as fp from (
    select doc_id,
           unnest(list_transform(range(1, len(h) - {_WINNOW_W} + 2),
               j -> {{'pos': j + {_WINNOW_W}
                         - list_position(list_reverse(h[j:j+{_WINNOW_W - 1}]),
                                         list_min(h[j:j+{_WINNOW_W - 1}])) - 1,
                      'fp': list_min(h[j:j+{_WINNOW_W - 1}])}})) as u
    from g) q
)
select doc_id, cast(pos as int) as pos, fp from fp order by doc_id, pos
"""
QUERIES["winnow_fingerprint"] = _winnow_fingerprint


# --- URL domain-suffix blocklist filter (RefinedWeb / UT1 stage) ---

_BLOCKED = ["src1.example.com", "src3.example.com"]

# www. on even doc_ids so the suffix (subdomain) match path is exercised
# by the gate, not just host equality.
_BL_URL_SPARK = (
    "concat('HTTPS://', case when doc_id % 2 = 0 then 'WWW.' else '' end, "
    "upper(source), '.Example.com:443/p/', cast(doc_id as string))"
)


def _url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept rows after domain-suffix blocklist filtering
    (operators/webtext.py blocklist_filter): host suffix-chain vs a
    literal blocklist array, pure map-side."""
    from gdal_spark.operators.webtext import blocklist_filter

    d = _docs(spark, sf_dir).withColumn("url", F.expr(_BL_URL_SPARK))
    return (
        blocklist_filter(d, _BLOCKED)
        .select("doc_id", "source", "host")
        .orderBy("doc_id")
    )


ORACLES["url_blocklist"] = """
with u as (
  select doc_id, source,
         (case when doc_id % 2 = 0 then 'www.' else '' end)
           || source || '.example.com' as host
  from documents
)
select doc_id, source, host from u
where not (host = 'src1.example.com' or host like '%.src1.example.com'
        or host = 'src3.example.com' or host like '%.src3.example.com')
order by doc_id
"""
QUERIES["url_blocklist"] = _url_blocklist


# --- MOSS overlap pairs over the winnowed fingerprints ---

_WN_MIN_SHARED = 2
_WN_MAX_POSTING = 64


def _winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing >= 2 winnowed fingerprints with containment
    overlap (operators/webtext.py winnow_overlap_pairs): capped-posting
    self-join on the fingerprint hash."""
    from gdal_spark.operators.webtext import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _docs(spark, sf_dir),
        k=_WINNOW_K,
        w=_WINNOW_W,
        min_shared=_WN_MIN_SHARED,
        max_posting=_WN_MAX_POSTING,
    ).orderBy("id_a", "id_b")


ORACLES["winnow_overlap"] = f"""
with t as (select doc_id, string_split(text, ' ') as toks from documents
           where len(string_split(text, ' ')) >= {_WINNOW_K + _WINNOW_W - 1}),
g as materialized (
  select doc_id,
         list_transform(range(1, len(toks) - {_WINNOW_K} + 2),
             i -> cast(concat('0x', substring(md5(
                 array_to_string(toks[i:i+{_WINNOW_K - 1}], ' ')),1,15))
                 as bigint)) as h
  from t
),
fp as materialized (
  select distinct doc_id, u.fp as fp from (
    select doc_id,
           unnest(list_transform(range(1, len(h) - {_WINNOW_W} + 2),
               j -> {{'fp': list_min(h[j:j+{_WINNOW_W - 1}])}})) as u
    from g) q
),
capped as materialized (
  select doc_id, fp from (
    select doc_id, fp, count(*) over (partition by fp) as pn from fp)
  where pn <= {_WN_MAX_POSTING}
),
sizes as (select doc_id, count(*) as n from capped group by 1),
p as (
  select a.doc_id as id_a, b.doc_id as id_b, count(*) as n_shared
  from capped a join capped b using (fp)
  where a.doc_id < b.doc_id
  group by 1, 2
)
select id_a, id_b, n_shared,
       round(n_shared / least(sa.n, sb.n), 6) as overlap
from p join sizes sa on sa.doc_id = p.id_a
       join sizes sb on sb.doc_id = p.id_b
where n_shared >= {_WN_MIN_SHARED}
order by id_a, id_b
"""
QUERIES["winnow_overlap"] = _winnow_overlap


# --- KMV distinct-count sketch (vocabulary-size estimation) ---

def _vocab_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-256 sketch of the corpus vocabulary size (distinct
    tokens).  The oracle recomputes the ESTIMATOR exactly — the sketch
    state is the k smallest distinct hashes, which `order by h limit k`
    reproduces in SQL — so this checks the estimate value-for-value,
    not within a tolerance band."""
    from gdal_spark.operators.webtext import distinct_kmv

    d = _docs(spark, sf_dir)
    toks = d.selectExpr("explode(split(text, ' ')) as w")
    return distinct_kmv(toks, value_col="w", k=256)


ORACLES["vocab_kmv"] = """
with v as (
  select distinct
    cast(concat('0x', substring(md5(w), 1, 15)) as bigint) as h
  from (select unnest(string_split(text, ' ')) as w from documents)
),
mins as (select h from v order by h limit 256),
s as (select count(*) as n, max(h) as kth from mins)
select cast(256 as int) as k_kmv,
       cast(n as bigint) as n_mins,
       cast(kth as bigint) as kth_min_hash,
       case when n < 256 then cast(n as double)
            else round((cast(255 as double) * 1152921504606846976.0)
                       / cast(kth as double), 4) end as est_distinct
from s
"""
QUERIES["vocab_kmv"] = _vocab_kmv


# --- hybrid retrieval: reciprocal-rank fusion of BM25 + cosine ANN ---

def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse the BM25 lexical top-5 with the exact cosine top-5
    (reciprocal-rank fusion, k=60) for queries 0-4.  The corpus key:
    embeddings.vec_id enumerates the same id space as documents.doc_id
    in the test tables, standing in for the shared document key a real
    hybrid index joins on.  Both arms' ranks are integer-exact with
    explicit tie-breaks, so the fusion is engine-exact."""
    from gdal_spark import tables
    from gdal_spark.operators.similarity import cosine_topk
    from gdal_spark.operators.webtext import bm25_topk, rrf_fuse
    from gdal_spark.queries.similarity import query_vectors

    d = _docs(spark, sf_dir)
    q = spark.createDataFrame(_BM25_QUERIES, "q_id long, q_text string")
    lex = bm25_topk(d, q, k=5).select(
        "q_id", F.col("doc_id").alias("item_id"), "rank"
    )
    tables.register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    queries = query_vectors(emb, len(_BM25_QUERIES))
    sem = cosine_topk(emb, queries, k=5).select(
        F.col("query_id").cast("long").alias("q_id"),
        F.col("vec_id").alias("item_id"),
        F.col("rnk").alias("rank"),
    )
    return rrf_fuse(lex, sem).orderBy("q_id", "fused_rank")


def _hybrid_rrf_oracle() -> str:
    from gdal_spark.queries.similarity import ANN_COSINE_ORACLE

    nq = len(_BM25_QUERIES)
    return f"""
with lex as (
  select q_id, doc_id as item_id, rank from ({_bm25_oracle()})
),
sem as (
  select cast(query_id as bigint) as q_id, vec_id as item_id,
         rnk as rank
  from ({ANN_COSINE_ORACLE}) where query_id < {nq}
),
f as (
  select coalesce(l.q_id, s.q_id) as q_id,
         coalesce(l.item_id, s.item_id) as item_id,
         round(coalesce(cast(1 as double) / (60 + l.rank), 0)
               + coalesce(cast(1 as double) / (60 + s.rank), 0), 6) as rrf
  from lex l full outer join sem s
    on l.q_id = s.q_id and l.item_id = s.item_id
)
select q_id, item_id, rrf,
       cast(row_number() over (partition by q_id
            order by rrf desc, item_id asc) as int) as fused_rank
from f order by q_id, fused_rank
"""


QUERIES["hybrid_rrf"] = _hybrid_rrf
ORACLES["hybrid_rrf"] = _hybrid_rrf_oracle()


# --- end-to-end curation pipeline (FineWeb-style stage composition) ---

def _curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical curation SEQUENCE as one composed Catalyst plan:
    Gopher quality gate → hashed-BoW linear-classifier gate → exact
    dedup keep-first AMONG SURVIVORS (dedup after filtering, the
    FineWeb/RefinedWeb stage order), over the corpus amplified with
    verbatim copies so the dedup stage does real work.  Returns per-doc
    stage flags (dedup_keep is NULL for gate-dropped docs — the stage
    never saw them) + the final kept bit.

    Plan shape: both gates are doc-local array lambdas fused into ONE
    map over the scan (no exchange between stages); the content-hash
    keep-first is the pipeline's single shuffle, running on the
    gate-SURVIVOR subset only — filters first shrink the shuffle, the
    reason real pipelines order stages this way."""
    from gdal_spark.operators.webtext import (
        gopher_metrics,
        quality_score_linear,
    )

    d0 = _docs(spark, sf_dir).select("doc_id", "text")
    dup = d0.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    d = d0.unionAll(dup)
    g = gopher_metrics(d).select("doc_id", "gopher_keep")
    q = quality_score_linear(d).select("doc_id", "quality_keep")
    from gdal_spark.portable import hash64 as _h64

    flags = (
        d.join(g, "doc_id")
        .join(q, "doc_id")
        .withColumn("_h", F.expr(_h64("text", "spark")))
    )
    surv = flags.where("gopher_keep and quality_keep")
    keeper = surv.groupBy("_h").agg(
        F.min("doc_id").alias("_keeper"), F.count("*").alias("_n")
    )
    gates = F.col("gopher_keep") & F.col("quality_keep")
    return (
        flags.join(keeper, "_h", "left")
        .select(
            "doc_id",
            "gopher_keep",
            "quality_keep",
            # survivor content-group size (0 = doc never reached the
            # dedup stage; its identical twin fails the same gates, so
            # the group truly has no survivors)
            F.coalesce(F.col("_n"), F.lit(0)).alias("surv_group_size"),
            (gates & (F.col("doc_id") == F.col("_keeper"))).alias("kept"),
        )
        .orderBy("doc_id")
    )


def _curation_pipeline_oracle() -> str:
    from gdal_spark.portable import hash64

    dim = 1024
    b = hash64("w", "duck")
    wt = hash64(f"'wt' || (({b}) % {dim})::varchar", "duck")
    ch = hash64("text", "duck")
    return f"""
with corpus as (
  select doc_id, text from documents
  union all
  select doc_id + 200000 as doc_id, text from documents
),
t as (
  select doc_id, text,
         string_split(text, ' ') as toks,
         list_transform(range(0, cast(floor(greatest(length(text)-1, 0)
             / 32.0) as int) + 1),
             i -> substring(text, i*32 + 1, 32)) as lns
  from corpus
),
m as (
  select doc_id, text, toks, lns,
         len(toks) as n_words,
         list_transform(range(0, greatest(len(toks)-1, 1)),
             i -> toks[i+1] || ' ' || toks[i+2]) as grams
  from t
),
g as (
  -- the engine gates on the 6-dp ROUNDED metric columns
  -- (gopher_metrics emits round(...,6) then builds the flag), so the
  -- mirror must round before comparing or a metric within 5e-7 of a
  -- gate boundary diverges
  select doc_id,
         (len(toks) between 50 and 100000
          and round(list_sum(list_transform(toks, w -> length(w)))
               / greatest(len(toks), 1), 6) between 3.0 and 10.0
          and round(case when len(toks) < 2 then 0.0 else
              list_max(list_transform(list_distinct(grams), gr ->
                  len(list_filter(grams, x -> x = gr)) * length(gr)))
              / greatest(length(text), 1) end, 6) < 0.20
          and round(list_sum(list_concat([0], list_transform(
                  list_filter(list_distinct(lns),
                      l2 -> len(list_filter(lns, x -> x = l2)) > 1),
                  l2 -> len(list_filter(lns, x -> x = l2)) * length(l2))))
                / greatest(length(text), 1), 6) < 0.20) as gopher_keep
  from m
),
q as (
  select doc_id,
         (cast(list_sum(list_transform(toks,
              w -> ({wt}) % 2001 - 1000)) as bigint) > 0) as quality_keep
  from t
),
flags as (
  select c.doc_id, g.gopher_keep, q.quality_keep, {ch} as h
  from corpus c
  join g on g.doc_id = c.doc_id
  join q on q.doc_id = c.doc_id
),
keeper as (
  select h, min(doc_id) as keeper, count(*) as n
  from flags where gopher_keep and quality_keep group by h
)
select f.doc_id, f.gopher_keep, f.quality_keep,
       cast(coalesce(k.n, 0) as bigint) as surv_group_size,
       (f.gopher_keep and f.quality_keep
        and f.doc_id = k.keeper) as kept
from flags f left join keeper k using (h)
order by f.doc_id
"""


QUERIES["curation_pipeline"] = _curation_pipeline
ORACLES["curation_pipeline"] = _curation_pipeline_oracle()


# --- Zipf-law fit (corpus power-law health check) ---

def _zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of ln(freq) on ln(rank) over the 500 most frequent tokens.
    Decimal-exact sums make the closed-form regression bit-reproducible
    in SQL; the oracle computes the identical operation sequence."""
    from gdal_spark.operators.webtext import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), top_k=500)


ORACLES["zipf_fit"] = """
with counts as (
  select w, count(*) as c
  from (select unnest(string_split(text, ' ')) as w from documents)
  group by w
),
top as (select w, c from counts order by c desc, w asc limit 500),
ranked as (
  select c, row_number() over (order by c desc, w asc) as r from top
),
d as (
  select cast(round(ln(cast(r as double)), 6) as decimal(18, 6)) as x,
         cast(round(ln(cast(c as double)), 6) as decimal(18, 6)) as y
  from ranked
),
s as (
  select cast(count(*) as bigint) as n_terms,
         cast(count(*) as double) as n,
         cast(sum(x) as double) as sx,
         cast(sum(y) as double) as sy,
         cast(sum(x * y) as double) as sxy,
         cast(sum(x * x) as double) as sxx,
         cast(sum(y * y) as double) as syy
  from d
)
select n_terms,
       round(((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) as slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) as intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) as r2
from s
"""
QUERIES["zipf_fit"] = _zipf_fit
