"""Byte-pair-encoding tokenizer: distributed trainer + pure-SQL encoder.

The real tokenization step of a training-data pipeline (Sennrich et al.
2016), replacing the BPE-ish regex token count in queries/textops.py
with the actual algorithm.

Representation: a word's token sequence is one delimited string with
every token wrapped in pipes — "hello" starts as ``|h||e||l||l||o|``.
Merging the pair (a, b) is then the plain string replacement
``|a||b|`` → ``|ab|``: the doubled delimiter means adjacent occurrences
never share a character, so left-to-right non-overlapping `replace`
reproduces BPE's greedy left-to-right merge exactly, in ANY engine with
`replace` (Spark codegen, DuckDB) — which is what makes the encoder a
single built-in expression with a bit-exact SQL oracle.

Scale (100 TB):
- `word_histogram` is the standard trainer trick (what single-node BPE
  libraries do in-process): ONE shuffle on the word collapses the
  corpus to its distinct-word histogram, and every training round
  thereafter runs on |vocab| rows, not corpus rows.
- Each `bpe_train` round is two narrow maps + one small aggregate over
  the histogram and collects exactly ONE row (the argmax pair).  k
  merges = k bounded rounds; the histogram is re-persisted every few
  rounds so the replace-chain lineage stays shallow.
- `bpe_encode` is a per-row `aggregate(merges, init, replace)`
  expression — narrow, codegen'd, zero shuffle, merges inlined as an
  array literal (vocab-sized, i.e. constant-folded, never broadcast
  state).

Reference parity: GDAL has no tokenizer; this implements the published
algorithm (cited above) as SURVEY.md's training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# init expr: '|' || char || '|' for every char, concatenated.
# split(w, '') yields the character array in Spark; DuckDB's
# string_split(w, '') is the oracle-side mirror.
_INIT = "concat('|', array_join(split({w}, ''), '||'), '|')"
# tokens of a repr: strip the outer pipes, split on the doubled
# delimiter.  Character-class regex only — no backslash escapes
# (CLAUDE.md portability trap).
_TOKS = "split(regexp_replace({r}, '^[|]|[|]$', ''), '[|][|]')"


def word_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over the whitespace-split corpus — the one
    corpus-scale shuffle of BPE training (map-side combined)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    k: int = 16,
    text_col: str = "text",
    min_count: int = 2,
    repersist_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Train k BPE merges on the corpus; returns [(a, b, total), ...]
    in merge order.  Merge rule: maximum summed count, ties broken by
    (a, b) lexicographic ascending — deterministic.

    Driver artifact by design (like ivf_train's centroids): the merge
    table IS the tokenizer model, k rows.
    """
    hist = word_histogram(df, text_col).withColumn(
        "repr", F.expr(_INIT.format(w="word"))
    )
    hist = hist.select("repr", "cnt").persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for rnd in range(k):
            toks = _TOKS.format(r="repr")
            pairs = hist.select(
                F.expr(
                    f"explode(transform(slice({toks}, 1, "
                    f"greatest(size({toks}) - 1, 0)), "
                    f"(x, i) -> struct(x as a, "
                    f"element_at({toks}, i + 2) as b)))"
                ).alias("p"),
                "cnt",
            ).select("p.a", "p.b", "cnt")
            top = (
                pairs.groupBy("a", "b")
                .agg(F.sum("cnt").alias("total"))
                .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()  # bounded-metadata: argmax = exactly 1 row
            )
            if not top or top[0]["total"] < min_count:
                break
            a, b, total = top[0]["a"], top[0]["b"], int(top[0]["total"])
            merges.append((a, b, total))
            nxt = hist.withColumn(
                "repr",
                F.expr(
                    "replace(repr, '|' || {a} || '||' || {b} || '|', "
                    "'|' || {a} || {b} || '|')".format(
                        a=_lit(a), b=_lit(b)
                    )
                ),
            )
            if (rnd + 1) % repersist_every == 0:
                nxt = nxt.persist()
                nxt.count()  # materialize before dropping the parent
                hist.unpersist()
            hist = nxt
    finally:
        hist.unpersist()
    return merges


def _lit(s: str) -> str:
    """SQL string literal (single-quote doubling only — the corpus is
    whitespace-split so tokens never contain quotes, but be safe)."""
    return "'" + s.replace("'", "''") + "'"


def merge_chain_sql(merges: list[tuple[str, str]], init: str) -> str:
    """Nested-replace expression applying `merges` in order to `init`
    (a repr-typed SQL expression).  Plain `replace` only, so the SAME
    text runs under Spark and DuckDB — the encoder and its oracle are
    one string."""
    expr = init
    for a, b, *_ in merges:
        expr = (
            f"replace({expr}, {_lit('|' + a + '||' + b + '|')}, "
            f"{_lit('|' + a + b + '|')})"
        )
    return expr


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a trained merge list: per-word replace
    chain, word boundaries never merged (standard BPE).  Returns
    (id, n_bpe_tokens, bpe_md5) where bpe_md5 fingerprints the exact
    token sequence.  One narrow codegen'd expression — zero shuffle,
    zero Python."""
    word_expr = merge_chain_sql(merges, _INIT.format(w="w"))
    enc = (
        f"transform(split({text_col}, ' '), w -> {word_expr})"
    )
    # each token contributes exactly two pipes; adjacent tokens share
    # none, so n_tokens = pipes / 2 (integer div keeps ANSI engines
    # exact).
    n_tok = (
        f"aggregate({enc}, cast(0 as bigint), (acc, r) -> acc + "
        f"(length(r) - length(replace(r, '|', ''))) div 2)"
    )
    return df.select(
        F.col(id_col),
        F.expr(n_tok).alias("n_bpe_tokens"),
        F.md5(F.expr(f"array_join({enc}, ' ')")).alias("bpe_md5"),
    )


def merges_df(
    spark: SparkSession, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Merge list as a (rank, a, b, total) DataFrame — the persistable
    tokenizer model."""
    rows = [(i + 1, a, b, t) for i, (a, b, t) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, a string, b string, total bigint"
    )
