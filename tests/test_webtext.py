"""Web-corpus curation operators (operators/webtext.py): boilerplate
removal, global line dedup, Gopher metrics, PII scrub, URL canon."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.webtext import (
    canonical_url,
    dedup_by_url,
    dedup_lines,
    doc_lines,
    gopher_metrics,
    heavy_lines,
    pii_scrub,
    remove_boilerplate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "NAV HOME" + "x" * 8),   # boilerplate + unique tail
        (1, "NAV HOME" + "y" * 8),
        (2, "NAV HOME" + "z" * 8),
        (3, "NAV HOME"),             # entirely boilerplate
        (4, "unique document four"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_lines_width(spark, corpus):
    lines = doc_lines(corpus, width=8).toPandas()
    d0 = lines[lines.doc_id == 0].sort_values("pos")
    assert list(d0.line) == ["NAV HOME", "xxxxxxxx"]
    d3 = lines[lines.doc_id == 3].sort_values("pos")
    assert list(d3.line) == ["NAV HOME"]


def test_boilerplate_removal(spark, corpus):
    lines = doc_lines(corpus, width=8)
    heavy = heavy_lines(lines, min_df=3)
    assert [r.line for r in heavy.collect()] == ["NAV HOME"]
    out = remove_boilerplate(lines, heavy).toPandas()
    # doc 3 was entirely boilerplate -> absent
    assert sorted(out.doc_id) == [0, 1, 2, 4]
    assert out.set_index("doc_id").loc[0, "text_kept"] == "x" * 8
    assert (
        out.set_index("doc_id").loc[4, "text_kept"]
        == "unique document four"
    )


def test_remove_boilerplate_is_broadcast(spark, corpus):
    lines = doc_lines(corpus, width=8)
    heavy = heavy_lines(lines, min_df=3)
    plan = (
        remove_boilerplate(lines, heavy)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the dictionary side broadcasts; the corpus side reaches the
    # anti-join unshuffled (its only Exchange is the final groupBy)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_remove_boilerplate_size_checked_fallback(spark, corpus):
    """VERDICT r4 #1: above broadcast_max the dictionary must NOT carry
    an explicit broadcast hint (AQE never demotes one) — the plan falls
    back to a shuffle anti-join; at/below the cap it broadcasts."""
    lines = doc_lines(corpus, width=8)
    heavy = heavy_lines(lines, min_df=3)  # dictionary = 1 line
    over = (
        remove_boilerplate(lines, heavy, broadcast_max=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in over and "LeftAnti" in over
    under = (
        remove_boilerplate(lines, heavy, broadcast_max=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in under and "LeftAnti" in under
    # both strategies produce identical rows
    a = remove_boilerplate(lines, heavy, broadcast_max=0).collect()
    b = remove_boilerplate(lines, heavy, broadcast_max=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_heavy_lines_fractional_threshold(spark, corpus):
    """CCNet-style min_df_frac: corpus has 5 docs; 'NAV HOME' appears in
    4 of them (0.8) — kept at frac 0.5, dropped at frac 0.9. The plan
    stays lazy (doc count via broadcast cross join, no driver action)."""
    lines = doc_lines(corpus, width=8)
    assert [r.line for r in heavy_lines(lines, min_df_frac=0.5).collect()] == [
        "NAV HOME"
    ]
    assert heavy_lines(lines, min_df_frac=0.9).count() == 0


def test_dedup_lines_first_occurrence(spark):
    df = spark.createDataFrame(
        [(0, "dup line dup line"), (1, "dup line fresh one")],
        "doc_id long, text string",
    )
    lines = doc_lines(df, width=9)  # "dup line " / "fresh one" etc.
    kept = dedup_lines(lines).toPandas()
    # the duplicated first window survives only at (doc 0, pos 0)
    occ = kept[kept.line == "dup line "]
    assert len(occ) == 1 and occ.iloc[0].doc_id == 0 and occ.iloc[0].pos == 0


def test_gopher_metrics_values(spark):
    text_rep = " ".join(["spam ham"] * 16).strip()  # 'spam ham spam ...'
    text_ok = " ".join(f"w{i:02d}x" for i in range(60))
    df = spark.createDataFrame(
        [(0, text_rep), (1, text_ok)], "doc_id long, text string"
    )
    m = gopher_metrics(df).toPandas().set_index("doc_id")
    # doc 0: 32 words, every 2-gram is 'spam ham'/'ham spam' (~half each)
    assert m.loc[0, "n_words"] == 32
    assert m.loc[0, "top_2gram_char_frac"] > 0.2
    assert not m.loc[0, "gopher_keep"]
    # doc 1: 60 distinct 4-char words, no repetition
    assert m.loc[1, "n_words"] == 60
    assert m.loc[1, "mean_word_len"] == 4.0
    assert m.loc[1, "top_2gram_char_frac"] < 0.2
    assert m.loc[1, "dup_line_char_frac"] == 0.0
    assert bool(m.loc[1, "gopher_keep"])


def test_gopher_dup_lines(spark):
    # width-32 windows: make the doc two identical 32-char windows
    block = "abcdefgh" * 4
    df = spark.createDataFrame(
        [(0, block + block)], "doc_id long, text string"
    )
    m = gopher_metrics(df).toPandas().iloc[0]
    assert m["dup_line_frac"] == 1.0
    assert m["dup_line_char_frac"] == 1.0


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@sub.example.org now"),
            (1, "server 192.168.0.1 and 10.0.0.2 up"),
            (2, "call +44 123 456 7890 today"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = pii_scrub(df).toPandas().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 1
    assert out.loc[0, "scrubbed"] == "mail <EMAIL> now"
    assert out.loc[1, "n_ips"] == 2
    assert out.loc[1, "scrubbed"] == "server <IP> and <IP> up"
    assert out.loc[2, "n_phones"] == 1
    assert out.loc[2, "scrubbed"] == "call <PHONE> today"
    assert out.loc[3, ["n_emails", "n_ips", "n_phones"]].sum() == 0
    assert out.loc[3, "scrubbed"] == "clean text only"


def test_canonical_url_cases(spark):
    cases = [
        # (raw, canonical)
        ("HTTPS://WWW.Example.COM:443/A/B/", "https://www.example.com/a/b"),
        ("http://h.net:80/p?id=1#frag", "http://h.net/p?id=1"),
        (
            "https://x.io/p?utm_source=a&utm_medium=b&id=3",
            "https://x.io/p?id=3",
        ),
        ("https://x.io/p?utm_source=a", "https://x.io/p"),
        ("https://x.io/p?id=3&utm_term=z", "https://x.io/p?id=3"),
        ("https://x.io:8080/p", "https://x.io:8080/p"),  # non-default port
    ]
    df = spark.createDataFrame(
        [(i, r) for i, (r, _) in enumerate(cases)], "i long, url string"
    )
    got = (
        df.select("i", canonical_url("url").alias("c"))
        .toPandas()
        .sort_values("i")
    )
    assert list(got.c) == [want for _, want in cases]


def test_dedup_by_url(spark):
    df = spark.createDataFrame(
        [
            (7, "https://a.com/x?utm_source=f"),
            (3, "HTTPS://A.com/x"),
            (9, "https://a.com/x/"),
            (5, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = dedup_by_url(df).toPandas().set_index("canon_url")
    assert out.loc["https://a.com/x", "keep_id"] == 3
    assert out.loc["https://a.com/x", "n_dups"] == 3
    assert out.loc["https://a.com/y", "n_dups"] == 1


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over adversarial inputs."""
    urls = [
        "HTTPS://A.com:443/x/?utm_a=1&utm_b=2&utm_c=3",
        "http://b.org:80/?utm_x=9",
        "https://c.net/p/?id=1&utm_m=2&q=3#f#g",
        "https://d.io:443/",
        "https://e.gov/p?utm_a=x&utm_b=y",
        "ftp://f.mil:80/deep/path/",
        "https://g.edu/#only-frag",
        "https://h.biz/p?&",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = df.select("i", canonical_url("url").alias("c1"))
    twice = once.select("i", "c1", canonical_url("c1").alias("c2"))
    bad = twice.where(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad


def test_quality_score_linear(spark):
    import hashlib

    from gdal_spark.operators.webtext import quality_score_linear

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def wt(word):
        return h64(f"wt{h64(word) % 1024}") % 2001 - 1000

    df = spark.createDataFrame(
        [(0, "hello hello"), (1, "alpha beta gamma")],
        "doc_id long, text string",
    )
    out = quality_score_linear(df).toPandas().set_index("doc_id")
    assert out.loc[0, "logit_milli"] == 2 * wt("hello")
    want1 = wt("alpha") + wt("beta") + wt("gamma")
    assert out.loc[1, "logit_milli"] == want1
    assert out.loc[1, "quality_keep"] == (want1 > 0)
    assert out.loc[1, "score"] == round(want1 / 3000.0, 6)


# --- r4b additions: dup-span stats, cluster canonicalization, sampling ---


def test_dup_ngram_stats_shared_span(spark):
    from gdal_spark.operators.dedup import dup_ngram_stats

    rows = [
        (0, "a b c d e unique zero tail words here"),
        (1, "a b c d e other one ending entirely different"),
        (2, "nothing in common with anything else at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dup_ngram_stats(df, k=5).collect()
    }
    # docs 0 and 1 share exactly one 5-gram: "a b c d e"
    assert out[0]["n_grams"] == 6 and out[0]["n_dup_grams"] == 1
    assert out[1]["n_grams"] == 6 and out[1]["n_dup_grams"] == 1
    assert out[2]["n_dup_grams"] == 0 and out[2]["dup_frac"] == 0.0


def test_dedup_clusters_transitive(spark):
    from gdal_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    # chain 0~1, 1~2 (0 and 2 never directly paired) + pair 4~5
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(out) == 6
    assert [out[i]["cluster_id"] for i in range(6)] == [0, 0, 0, 3, 4, 4]
    assert [out[i]["keep"] for i in range(6)] == [
        True, False, False, True, True, False,
    ]


def test_stratified_sample_deterministic(spark):
    from gdal_spark.operators.webtext import stratified_sample

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    rates = spark.createDataFrame(
        [("a", 1000), ("b", 250)], "source string, rate_permille int"
    )
    s1 = stratified_sample(docs, rates).select("doc_id").toPandas()
    s2 = stratified_sample(docs, rates).select("doc_id").toPandas()
    # deterministic: identical subset on re-run
    assert sorted(s1.doc_id) == sorted(s2.doc_id)
    kept_a = sum(1 for i in s1.doc_id if i % 2 == 0)
    kept_b = len(s1) - kept_a
    assert kept_a == 200          # rate 1000 => keep all of stratum a
    assert 20 <= kept_b <= 80     # ~25% of 200, hash-binomial bounds
    # unknown stratum => dropped
    extra = spark.createDataFrame([(999, "zz")], "doc_id long, source string")
    assert stratified_sample(extra, rates).count() == 0


def test_decontaminate_flags_only_overlapping(spark):
    from gdal_spark.operators.webtext import decontaminate

    span = " ".join(f"w{i}" for i in range(13))
    rows = [
        (0, "clean doc with no benchmark overlap anywhere at all ok"),
        (1, f"prefix words {span} suffix words"),
        (2, "short doc"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(f"lead {span} tail",)], "text string")
    out = {r["doc_id"]: r for r in decontaminate(d, bench, k=13).collect()}
    assert not out[0]["contaminated"] and out[0]["n_contaminated_grams"] == 0
    assert out[1]["contaminated"] and out[1]["n_contaminated_grams"] == 1
    assert not out[2]["contaminated"]  # < k tokens: trivially clean


def test_lsh_decontaminate_catches_fuzzy_copies(spark):
    """Band collision flags the verbatim copy on ALL bands, the
    perturbed near-copy on at least one band (which the exact k-gram
    rule with a larger k would miss), and stays total over the corpus
    (short docs carry an empty signature and n_bands_hit = 0)."""
    from gdal_spark.operators.webtext import lsh_decontaminate

    bench_text = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (0, bench_text),                       # verbatim benchmark copy
        (1, bench_text + " extra trailing"),   # perturbed near-copy
        (2, " ".join(f"zz{i}" for i in range(30))),  # unrelated
        (3, "too short"),                      # < k tokens
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(bench_text,)], "text string")
    out = {
        r["doc_id"]: r
        for r in lsh_decontaminate(
            d, bench, k=3, num_perm=16, rows_per_band=2
        ).collect()
    }
    assert out[0]["contaminated"] and out[0]["n_bands_hit"] == 8
    assert out[1]["contaminated"] and out[1]["n_bands_hit"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_bands_hit"] == 0
    assert not out[3]["contaminated"] and out[3]["n_bands_hit"] == 0
    # broadcast probe, not a per-doc join: corpus side has no Exchange
    plan = (
        lsh_decontaminate(d, bench, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pack_sequences_budget_bins(spark):
    from gdal_spark.operators.webtext import pack_sequences

    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in pack_sequences(d, budget=32).collect()}
    # 10-token docs, budget 32: seq_pos 0,10,20,30,40... -> bins 0,0,0,0,1,...
    assert [out[i]["seq_pos"] for i in range(10)] == [
        10 * i for i in range(10)
    ]
    assert [out[i]["seq_id"] for i in range(10)] == [
        (10 * i) // 32 for i in range(10)
    ]


def test_lm_perplexity_hand_computed(spark):
    """Add-1 bigram LM on a 2-doc corpus, every probability verified by
    hand: counts (<s>,a)=2 (a,b)=2 (b,a)=1 (b,c)=1; contexts <s>=2 a=2
    b=2; V=3."""
    import math

    from gdal_spark.operators.webtext import lm_perplexity

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in lm_perplexity(df).collect()
    }
    # p(a|<s>) = 3/5, p(b|a) = 3/5, p(a|b) = p(c|b) = 2/5
    logp = lambda p: round(math.log(p), 6)
    xent = round(-(logp(0.6) + logp(0.6) + logp(0.4)) / 3, 6)
    for d in (1, 2):
        assert out[d]["n_bigrams"] == 3
        assert out[d]["xent"] == pytest.approx(xent, abs=1e-9)
        assert out[d]["ppl"] == pytest.approx(round(math.exp(xent), 4))
    # identical xent -> ntile tie-break on doc_id
    assert (out[1]["bucket"], out[2]["bucket"]) == (1, 2)


def test_lm_perplexity_ranks_quality(spark):
    """A doc made of the corpus's dominant pattern scores lower xent
    (head bucket) than a doc of hapax tokens (tail bucket)."""
    from gdal_spark.operators.webtext import lm_perplexity

    common = [(i, "the cat sat on the mat") for i in range(8)]
    rare = [(100, "zq xv wk jj pq lm")]
    df = spark.createDataFrame(common + rare, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
    assert out[0]["xent"] < out[100]["xent"]
    assert out[0]["bucket"] == 1
    assert out[100]["bucket"] == 3


def test_tfidf_terms_hand_computed(spark):
    """N=2: doc1 'a a b', doc2 'b c'. df(a)=1 df(b)=2 df(c)=1;
    idf(a)=idf(c)=ln(1.5)+1, idf(b)=ln(1)+1=1."""
    import math

    from gdal_spark.operators.webtext import tfidf_terms

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = tfidf_terms(df, k=2).collect()
    rows = {(r["doc_id"], r["rank"]): r for r in out}
    idf_rare = round(math.log(1.5) + 1, 6)
    # doc1: a scores 2*idf_rare > b scores 1.0
    assert rows[(1, 1)]["term"] == "a"
    assert rows[(1, 1)]["score"] == pytest.approx(round(2 * idf_rare, 6))
    assert rows[(1, 2)]["term"] == "b"
    assert rows[(1, 2)]["score"] == pytest.approx(1.0)
    # doc2: c (rare) outranks b (common)
    assert rows[(2, 1)]["term"] == "c"
    assert rows[(2, 2)]["term"] == "b"


def test_tfidf_rank_tie_breaks_on_term(spark):
    from gdal_spark.operators.webtext import tfidf_terms

    # both terms appear once in the only doc -> equal scores -> term asc
    df = spark.createDataFrame([(1, "zz aa")], "doc_id long, text string")
    out = tfidf_terms(df, k=2).orderBy("rank").collect()
    assert [r["term"] for r in out] == ["aa", "zz"]


def test_lm_perplexity_threshold_path_is_mapside(spark):
    """Production bucketing: explicit xent thresholds assign buckets
    with a plain comparison (no window stage), matching the ntile
    terciles when the thresholds are the tercile boundaries."""
    from gdal_spark.operators.webtext import lm_perplexity

    common = [(i, "the cat sat on the mat") for i in range(8)]
    rare = [(100, "zq xv wk jj pq lm")]
    df = spark.createDataFrame(common + rare, "doc_id long, text string")
    base = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
    # cutoffs strictly between the two xent populations
    lo = base[0]["xent"]
    hi = base[100]["xent"]
    t1 = lo + (hi - lo) / 3
    t2 = lo + 2 * (hi - lo) / 3
    out = lm_perplexity(df, bucket_thresholds=(t1, t2))
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "ntile" not in plan and "window" not in plan
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    # bucket = 1 + number of cutoffs strictly below the doc's xent
    for d, r in base.items():
        want = 1 + (r["xent"] > t1) + (r["xent"] > t2)
        assert got[d] == want, d


def test_chunk_documents_window_semantics(spark):
    """Boundary semantics of the sliding-window chunker: single chunk
    for short docs, stride-spaced starts, last window reaches the end,
    full token coverage, guard rails."""
    import pytest

    from gdal_spark.operators.webtext import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # n < chunk
            (2, " ".join(f"t{i}" for i in range(16))),   # n == chunk
            (3, " ".join(f"t{i}" for i in range(17))),   # one over
            (4, " ".join(f"t{i}" for i in range(100))),  # many windows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk=16, stride=12)
    rows = {}
    for r in out.collect():
        rows.setdefault(r.doc_id, []).append((r.chunk_id, r.n_chunk_tokens))
    assert rows[1] == [(0, 10)]
    assert rows[2] == [(0, 16)]
    # n=17: m = ceil((17-16)/12) = 1 -> starts 0, 12; window 2 has 5 toks
    assert sorted(rows[3]) == [(0, 16), (1, 5)]
    # n=100: m = ceil(84/12) = 7 -> 8 windows; last starts at 84, 16 toks
    assert sorted(rows[4]) == [(i, 16) for i in range(8)]
    # coverage: stride <= chunk means every token index is inside some
    # window: start of window i is 12*i, end 12*i+15, next start 12*(i+1)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk=8, stride=9)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk=0, stride=0)


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs sharing the target subset's distinctive vocabulary must
    out-rank docs that don't (Xie et al. 2023: importance weight is
    the smoothed target/raw log-likelihood ratio)."""
    from gdal_spark.operators.webtext import dsir_select

    tgt_like = [(i, "alpha beta gamma alpha beta") for i in range(4)]
    other = [(i + 10, "delta epsilon zeta eta theta") for i in range(4)]
    df = spark.createDataFrame(
        tgt_like + other, "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(100, "alpha beta alpha gamma beta")], "doc_id long, text string"
    )
    out = dsir_select(df, target, top_frac=0.5).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3]
    ws = [r["weight"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ws == sorted(ws, reverse=True)


def test_dsir_threshold_path_is_mapside(spark):
    """Production selection: an explicit weight cutoff keeps the same
    docs as the rank path with NO window/sort stage in the plan."""
    from gdal_spark.operators.webtext import dsir_select

    docs = [(i, "alpha beta gamma") for i in range(3)] + [
        (i + 10, "delta epsilon zeta") for i in range(3)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    target = spark.createDataFrame(
        [(0, "alpha beta")], "doc_id long, text string"
    )
    ranked = dsir_select(df, target, top_frac=0.5).collect()
    cutoff = min(r["weight"] for r in ranked)
    out = dsir_select(df, target, weight_threshold=cutoff)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "window" not in plan
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in ranked
    )


def test_dsir_log_ratio_table_is_broadcast(spark):
    """The per-bucket log-ratio table is bounded by n_buckets (corpus-
    size-independent) and must reach the corpus probe as a broadcast
    join, never a corpus shuffle."""
    from gdal_spark.operators.webtext import dsir_select

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(6)],
        "doc_id long, text string",
    )
    target = df.where("doc_id < 2")
    out = dsir_select(df, target, n_buckets=64, weight_threshold=-10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_c4_filter_rules(spark):
    from gdal_spark.operators.webtext import c4_filter

    good1 = "this line has enough words here."
    good2 = "another good line with plenty of words!"
    good3 = 'this line ends with a double quote"'
    docs = [
        # 3 kept lines + one of each line-level drop -> kept doc
        (1, "\n".join([
            good1,
            "too short.",
            "this line has no terminal punctuation at all",
            "this line mentions javascript somewhere in it.",
            good2,
            good3,
        ])),
        # doc-level poison: lorem ipsum (lines themselves fine)
        (2, "\n".join([good1, good2, good3,
                       "some lorem ipsum filler sits right here."])),
        # doc-level poison: curly bracket
        (3, "\n".join([good1, good2, good3, "config { block here is bad."])),
        # doc-level poison: blocklist word
        (4, "\n".join([good1, good2, good3,
                       "this page mentions zoinks here sadly."])),
        # only 2 surviving lines -> dropped by min_kept_lines
        (5, "\n".join([good1, good2, "too short."])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = (
        c4_filter(df, blocklist=("zoinks",))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_lines"] == 6 and out.loc[1, "n_kept"] == 3
    assert bool(out.loc[1, "c4_keep"])
    assert out.loc[1, "text_clean"] == "\n".join([good1, good2, good3])
    for poisoned in (2, 3, 4):
        assert out.loc[poisoned, "n_kept"] >= 3  # lines fine...
        assert not bool(out.loc[poisoned, "c4_keep"])  # ...doc dropped
        assert out.loc[poisoned, "text_clean"] is None
    assert out.loc[5, "n_kept"] == 2 and not bool(out.loc[5, "c4_keep"])


def test_c4_filter_is_mapside(spark):
    """C4 rules are doc-local array lambdas: the plan must contain NO
    Exchange — a pure map over the scan (composes shuffle-free at
    100 TB)."""
    from gdal_spark.operators.webtext import c4_filter

    df = spark.createDataFrame(
        [(1, "a fine line with five words.")], "doc_id long, text string"
    )
    plan = (
        c4_filter(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bm25_hand_computed(spark):
    import math

    from gdal_spark.operators.webtext import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "banana banana banana cherry"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "apple"), (1, "banana cherry")], "q_id long, q_text string"
    )
    out = bm25_topk(docs, qs, k=5).toPandas()
    # N=3, avgdl=3; df=2 for all three terms -> shared idf
    idf = round(math.log(1 + (3 - 2 + 0.5) / 2.5), 6)

    def tfn(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    q0 = out[out.q_id == 0].sort_values("rank")
    assert list(q0.doc_id) == [1, 2]
    assert q0.score.iloc[0] == pytest.approx(
        round(idf * tfn(2, 3), 6), abs=2e-6
    )
    q1 = out[out.q_id == 1].sort_values("rank")
    # doc3: banana tf=3 + cherry tf=1; doc2: cherry only; doc1: banana only
    assert list(q1.doc_id) == [3, 2, 1]
    assert q1.score.iloc[0] == pytest.approx(
        round(idf * tfn(3, 4), 6) + round(idf * tfn(1, 4), 6), abs=2e-6
    )


def test_bm25_sides_are_broadcast(spark):
    """The corpus side must meet every join unshuffled: query terms,
    idf, and the per-query sum's qterms side are all broadcast; the
    only hashpartitioning exchanges are the (doc,term) aggregate, the
    (q_id, doc) aggregate, and the per-query top-k window."""
    from gdal_spark.operators.webtext import bm25_topk

    docs = spark.createDataFrame(
        [(i, "apple banana cherry") for i in range(20)],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "apple")], "q_id long, q_text string")
    plan = (
        bm25_topk(docs, qs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastExchange") >= 3
    assert "SortMergeJoin" not in plan


def test_domain_mix_temperature_and_cap(spark):
    """n^0.5 temperature with the <=1-epoch cap: 90/10 skew, budget 40.
    weights floor(sqrt(90))=9, floor(sqrt(10))=3; targets 40*9//12=30,
    40*3//12=10 (cap binds exactly for the small domain); rates 333 and
    1000 permille. The rate-1000 domain keeps every row; the plan's
    n_kept equals an independently recomputed hash-gate count; and
    domain_mix_rows returns exactly those rows, schema-preserving."""
    from gdal_spark.operators.dedup import H64
    from gdal_spark.operators.webtext import domain_mix, domain_mix_rows

    rows = [(i, "big" if i < 90 else "small", f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {r.source: r for r in domain_mix(df, budget=40).collect()}
    assert plan["big"].n_total == 90 and plan["big"].weight == 9
    assert plan["small"].n_total == 10 and plan["small"].weight == 3
    assert plan["big"].target == 30 and plan["small"].target == 10
    assert plan["big"].rate_permille == 333
    assert plan["small"].rate_permille == 1000
    assert plan["small"].n_kept == 10  # gate < 1000 is always true
    gate = H64("concat('mix', cast(doc_id as string))") % 1000
    want_big = df.where(
        (F.col("source") == "big") & (gate < F.lit(333))
    ).count()
    assert plan["big"].n_kept == want_big
    kept = domain_mix_rows(df, budget=40)
    assert kept.columns == df.columns
    by_src = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"big": want_big, "small": 10}


def test_domain_mix_alpha_one_is_proportional(spark):
    """sqrt_steps=0 (alpha=1) degenerates to proportional allocation:
    targets budget*n_d//N, no temperature flattening."""
    from gdal_spark.operators.webtext import domain_mix

    rows = [(i, "a" if i < 80 else "b", "x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {r.source: r for r in domain_mix(df, budget=50, sqrt_steps=0).collect()}
    assert plan["a"].weight == 80 and plan["b"].weight == 20
    assert plan["a"].target == 40 and plan["b"].target == 10


def test_char_entropy_values_and_filter(spark):
    """Entropy values vs a python mirror using the engine's exact
    rounding (per-term round-6, then negate): constant text -> 0 bits,
    two-symbol alternation -> 1 bit, prose ~3.9 bits; only prose
    crosses the 3.0-bit keep line. Empty text -> 0 chars, keep=false.
    Plan is a zero-shuffle doc-local fold (no Exchange)."""
    import math
    from collections import Counter

    from gdal_spark.operators.webtext import char_entropy

    docs = {1: "aaaa", 2: "abab", 3: "the quick brown fox", 4: ""}
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    res = char_entropy(df, min_bits=3.0)
    out = {r.doc_id: r for r in res.collect()}
    for i, t in docs.items():
        if not t:
            assert out[i].n_chars == 0 and out[i].char_entropy == 0.0
            assert not out[i].keep
            continue
        c = Counter(t)
        n = len(t)
        want = round(
            -sum(round((v / n) * math.log2(v / n), 6) for v in c.values()), 6
        )
        assert abs(out[i].char_entropy - want) < 1e-9, (i, t)
        assert out[i].n_distinct == len(c)
        assert out[i].keep == (out[i].char_entropy >= 3.0)
    assert out[1].char_entropy == 0.0 and out[2].char_entropy == 1.0
    assert [i for i in docs if out[i].keep] == [3]
    assert "Exchange" not in res._jdf.queryExecution().executedPlan().toString()


# --- Kneser–Ney bigram perplexity ---


def _kn_expected(docs, discount=0.75):
    """Pure-python mirror of operators.webtext.kn_perplexity."""
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    big = []
    for did, text in docs:
        toks = text.split(" ")
        prev = "<s>"
        for w in toks:
            big.append((did, prev, w))
            prev = w
    c_bi = Counter((p, w) for _, p, w in big)
    c_ctx = defaultdict(int)
    n1p = defaultdict(int)
    n_cont = defaultdict(int)
    for (p, w), c in c_bi.items():
        c_ctx[p] += c
        n1p[p] += 1
        n_cont[w] += 1
    t = len(c_bi)
    out = {}
    import math

    for did, _ in docs:
        logps = []
        for d2, p, w in big:
            if d2 != did:
                continue
            pr = (c_bi[(p, w)] - discount) / c_ctx[p] + (
                discount * n1p[p] / c_ctx[p]
            ) * (n_cont[w] / t)
            logps.append(
                Decimal(repr(round(math.log(pr), 6))).quantize(
                    Decimal("0.000001")
                )
            )
        s_micro = int(-sum(logps) * 1_000_000)
        n = len(logps)
        xent = ((2 * s_micro + n) // (2 * n)) / 1_000_000
        out[did] = (n, xent, round(math.exp(xent), 4))
    return out


def test_kn_perplexity_matches_python_mirror(spark):
    from gdal_spark.operators.webtext import kn_perplexity

    docs = [
        (1, "a b a b c"),
        (2, "a b a b c"),
        (3, "c c c a z q"),
        (4, "z q a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.xent, r.ppl)
        for r in kn_perplexity(df).collect()
    }
    exp = _kn_expected(docs)
    assert got == exp
    # duplicate docs score identically; the repeated-bigram doc is more
    # predictable (lower xent) than the rare-bigram one
    assert got[1] == got[2]
    assert got[1][1] < got[3][1]


def test_kn_perplexity_xent_rounds_half_up_in_integer_space(spark):
    # the fixture-discovered trap: S_micro/n landing exactly on .5 must
    # round half-UP (away from zero for the positive xent), not by a
    # float-multiply trick — plant S_micro = 9, n = 2 -> 4.5 -> 5 micro
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit(9).alias("s_micro"), F.lit(2).alias("n")
    )
    got = df.selectExpr("(2 * s_micro + n) div (2 * n) as r").head().r
    assert got == 5


# --- per-domain exact-quantile gate ---


def test_domain_quantile_exact_cutoffs_and_ties(spark):
    from gdal_spark.operators.webtext import domain_quantile_filter

    rows = [
        # domain A: 5 docs -> keep ceil(5*2/5) = 2; scores via
        # chars-per-token; doc 1/2 tie on identical text -> doc_id asc
        (1, "A", "longword longword"),
        (2, "A", "longword longword"),
        (3, "A", "aa bb"),
        (4, "A", "a b"),
        (5, "A", "c d"),
        # domain B: 1 doc -> ceil(1*2/5) = 1, always kept
        (6, "B", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = domain_quantile_filter(df, id_col="doc_id").collect()
    kept = {r.doc_id for r in got}
    assert kept == {1, 2, 6}
    by_id = {r.doc_id: r for r in got}
    # integer-exact score: 'longword longword' = 17 chars / 2 toks
    assert by_id[1].score_milli == 17 * 1000 // 2
    assert by_id[1].rnk == 1 and by_id[2].rnk == 2
    assert by_id[6].rnk == 1


# --- k-gram first-occurrence novelty ---


def test_ngram_novelty_first_occurrence_semantics(spark):
    from gdal_spark.operators.webtext import ngram_novelty

    rows = [
        (1, "a b c d e f"),        # 2 distinct 5-grams, both first here
        (2, "a b c d e f"),        # exact copy -> novelty 0
        (3, "a b c d e z"),        # 1 old-prefix? no: 5-grams 'a b c d e'
        #   (seen in doc 1) and 'b c d e z' (new) -> novelty 0.5
        (4, "x y"),                # < 5 tokens -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_novelty(df).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].n_grams, got[1].n_novel, got[1].novelty) == (2, 2, 1.0)
    assert (got[2].n_grams, got[2].n_novel, got[2].novelty) == (2, 0, 0.0)
    assert (got[3].n_grams, got[3].n_novel, got[3].novelty) == (2, 1, 0.5)


def test_ngram_novelty_counts_distinct_grams_once(spark):
    from gdal_spark.operators.webtext import ngram_novelty

    # 'a b a b a b a b a b' repeats the same two 5-grams; distinct
    # (doc, gram) semantics must count each once
    df = spark.createDataFrame(
        [(7, "a b a b a b a b a b")], "doc_id long, text string"
    )
    r = ngram_novelty(df).head()
    assert (r.n_grams, r.n_novel, r.novelty) == (2, 2, 1.0)


def test_ngram_novelty_single_corpus_shuffle(spark):
    """Plan guard for the r5 restructure: per-doc gram dedup is
    doc-local (array_distinct), so the corpus-scale data crosses the
    wire exactly once — the exploded grams into groupBy(gram).min.
    The first cut's corpus-wide DISTINCT partitioned on the (doc, gram)
    pair key and forced a join-back re-exchange of the full gram table;
    assert neither pattern returns."""
    import re

    from gdal_spark.operators.webtext import ngram_novelty

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(8)],
        "doc_id long, text string",
    )
    out = ngram_novelty(df)
    out.collect()
    final = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("+- == Initial Plan ==")[0]
    )
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*), \d+\)", final)
    gram_exchanges = [k for k in keys if "gram" in k]
    # exactly one exchange carries gram rows, keyed on gram alone —
    # no (doc_id, gram) pair-key DISTINCT shuffle, no second gram
    # exchange for a join probe
    assert len(gram_exchanges) == 1, keys
    assert "doc_id" not in gram_exchanges[0], keys


# --- winnowing fingerprints (Schleimer et al. 2003) ---


def _winnow_mirror(toks, k=4, w=4):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [h60(g) for g in grams]
    sel = set()
    for j in range(len(hs) - w + 1):
        win = hs[j:j + w]
        m = min(win)
        # rightmost occurrence on ties, per the paper
        sel.add((j + max(i for i, v in enumerate(win) if v == m), m))
    return sel


def test_winnow_matches_python_mirror_with_repeats(spark):
    from gdal_spark.operators.webtext import winnow_fingerprints

    # repeated phrase forces equal hashes inside a window -> exercises
    # the rightmost tie-break
    text = "a b c d e f g a b c d e f g x y z w q"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {(r.pos, r.fp) for r in winnow_fingerprints(df).collect()}
    assert got == _winnow_mirror(text.split())


def test_winnow_guarantee_every_window_covered(spark):
    from gdal_spark.operators.webtext import winnow_fingerprints

    import numpy as np

    rng = np.random.default_rng(3)
    toks = [f"w{int(x)}" for x in rng.integers(0, 50, size=120)]
    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    pos = sorted(r.pos for r in winnow_fingerprints(df, k=4, w=4).collect())
    n_grams = len(toks) - 4 + 1
    # winnowing guarantee: >= 1 selected gram in every window of w grams
    for j in range(n_grams - 4 + 1):
        assert any(j <= p < j + 4 for p in pos)
    # density well below 1 (expected 2/(w+1) = 0.4)
    assert len(set(pos)) < 0.6 * n_grams


def test_winnow_short_docs_excluded(spark):
    from gdal_spark.operators.webtext import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"  # 6 < k+w-1=7
    )
    assert winnow_fingerprints(df).count() == 0


# --- URL domain-suffix blocklist ---


def test_blocklist_suffix_and_exact_and_port(spark):
    from gdal_spark.operators.webtext import blocklist_filter

    rows = [
        (1, "HTTPS://www.ads.Example.com/x"),   # subdomain of blocked
        (2, "http://ok.example.com/y"),          # kept
        (3, "https://ads.example.com:443/z"),    # exact, port stripped
        (4, "https://example.org/"),             # exact
        (5, "https://adsXexample.com/"),         # NOT a suffix match
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string")
    kept = blocklist_filter(d, ["ads.example.com", "example.org"])
    assert {r.doc_id for r in kept.collect()} == {2, 5}


def test_blocklist_is_mapside(spark):
    from gdal_spark.operators.webtext import blocklist_filter

    d = spark.createDataFrame(
        [(1, "https://a.b.c/x")], "doc_id long, url string"
    )
    out = blocklist_filter(d, ["b.c"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter, zero shuffle


# --- MOSS overlap pairs ---


def test_winnow_overlap_detects_copies_and_orders_pairs(spark):
    from gdal_spark.operators.webtext import winnow_overlap_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact copy -> full containment
        (3, base + " with a different tail of new words here"),
        (4, "completely unrelated text about spark engines at scale ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r for r in
           winnow_overlap_pairs(df, min_shared=1).collect()}
    assert (1, 2) in got and got[(1, 2)].overlap == 1.0
    assert (1, 3) in got and got[(1, 3)].overlap == 1.0  # containment
    assert all(a < b for a, b in got)
    assert not any(4 in p for p in got)


def test_winnow_overlap_posting_cap_drops_hot_fingerprint(spark):
    from gdal_spark.operators.webtext import winnow_overlap_pairs

    # 5 identical boilerplate docs -> every fingerprint's posting list
    # has length 5; cap postings at 3 -> all dropped, no pairs survive
    rows = [(i, "shared boiler plate phrase here more words too")
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_overlap_pairs(df, min_shared=1, max_posting=3).count() == 0
    assert winnow_overlap_pairs(df, min_shared=1, max_posting=None).count() > 0


def test_distinct_kmv_exact_below_k_and_estimates_above(spark):
    from gdal_spark.operators.webtext import distinct_kmv

    # below k: the sketch IS the distinct set -> exact count
    small = spark.createDataFrame(
        [(f"tok{i % 37}",) for i in range(500)], "w string"
    )
    r = distinct_kmv(small, k=256).collect()[0]
    assert (r.k_kmv, r.n_mins, r.est_distinct) == (256, 37, 37.0)

    # above k: estimate within 25% of truth (k=256 -> ~6% stderr; the
    # slack keeps the bound hash-agnostic) and independent of layout
    big = spark.createDataFrame(
        [(f"word{i}",) for i in range(5000)], "w string"
    )
    est1 = distinct_kmv(big.repartition(13), k=256).collect()[0]
    est8 = distinct_kmv(big.repartition(2), k=256).collect()[0]
    assert est1 == est8  # partitioning-independent, bit-for-bit
    assert abs(est1.est_distinct - 5000) / 5000 < 0.25
    assert est1.n_mins == 256

    # duplicates never inflate the estimate
    dup = big.unionAll(big).unionAll(big)
    assert distinct_kmv(dup.repartition(7), k=256).collect()[0] == est1


def test_rrf_fuse_mechanics(spark):
    """Items in one list only contribute one reciprocal term; shared
    items sum both; ties broken by item id; rank order follows the
    rounded fused score."""
    from gdal_spark.operators.webtext import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "q_id long, item_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "q_id long, item_id long, rank long",
    )
    out = {r.item_id: r for r in rrf_fuse(a, b, k=60).collect()}
    assert round(out[11].rrf, 6) == round(1 / 62 + 1 / 61, 6)
    assert round(out[10].rrf, 6) == round(1 / 61, 6)
    assert round(out[13].rrf, 6) == round(1 / 62, 6)
    assert round(out[12].rrf, 6) == round(1 / 63, 6)
    # 11 wins (both lists); 10 vs 13: 1/61 > 1/62; 12 last
    ranks = {r.item_id: r.fused_rank for r in out.values()}
    assert ranks == {11: 1, 10: 2, 13: 3, 12: 4}
    # tie-break: two singletons at the same rank -> lower item id first
    c = spark.createDataFrame(
        [(2, 21, 1)], "q_id long, item_id long, rank long"
    )
    d2 = spark.createDataFrame(
        [(2, 20, 1)], "q_id long, item_id long, rank long"
    )
    tied = {r.item_id: r.fused_rank for r in rrf_fuse(c, d2).collect()}
    assert tied == {20: 1, 21: 2}


def test_curation_pipeline_stage_invariants(spark):
    """Stage composition invariants on the smoke corpus: kept implies
    both gates; at most one keeper per surviving content group; the
    verbatim +200000 twin of a kept doc is never kept (keep-first);
    surv_group_size is 0 exactly for gate-dropped docs and counts the
    group's survivors otherwise."""
    from gdal_spark.queries.webtext import _curation_pipeline

    rows = _curation_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 1000  # 500 docs + 500 verbatim twins
    by_id = {r.doc_id: r for r in rows}
    n_kept = 0
    for r in rows:
        if r.kept:
            n_kept += 1
            assert r.gopher_keep and r.quality_keep
            assert r.surv_group_size >= 1
        if not (r.gopher_keep and r.quality_keep):
            assert r.surv_group_size == 0 and not r.kept
    assert 0 < n_kept < 1000
    for i in range(500):
        a, b = by_id[i], by_id[i + 200000]
        # identical text -> identical gate flags; min-id keep-first
        assert (a.gopher_keep, a.quality_keep) == (b.gopher_keep, b.quality_keep)
        assert not b.kept
        if a.gopher_keep and a.quality_keep:
            assert a.kept and a.surv_group_size == 2


def test_zipf_fit_recovers_planted_power_law(spark):
    """A corpus synthesized with freq(rank) = round(1000 * rank^-1)
    recovers slope ≈ -1 with r2 ≈ 1; a uniform corpus fits slope ≈ 0."""
    import math

    rows = []
    did = 0
    words = []
    for r in range(1, 60):
        words += [f"tok{r:03d}"] * max(1, round(1000 / r))
    # pack the multiset into docs of 50 tokens
    for i in range(0, len(words), 50):
        rows.append((did, " ".join(words[i : i + 50])))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from gdal_spark.operators.webtext import zipf_fit

    got = zipf_fit(df, top_k=59).collect()[0]
    assert got.n_terms == 59
    assert abs(got.slope + 1.0) < 0.02 and got.r2 > 0.999

    uni = spark.createDataFrame(
        [(i, " ".join(f"u{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    flat = zipf_fit(uni, top_k=40).collect()[0]
    assert abs(flat.slope) < 1e-9
