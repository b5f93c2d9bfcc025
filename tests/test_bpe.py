"""BPE tokenizer (operators/bpe.py): distributed trainer vs an
independent single-machine implementation, and encoder semantics
(greedy left-to-right merging, word-boundary isolation, round-trip)."""

import collections

from gdal_spark.operators.bpe import bpe_encode, bpe_train


def _ref_train(hist: dict[str, int], k: int):
    """Independent dict-based BPE (the oracle-build golden generator):
    max total count, (a, b)-lex-asc tie-break, greedy left-to-right
    application."""
    words = {w: list(w) for w in hist}
    merges = []
    for _ in range(k):
        counts = collections.Counter()
        for w, toks in words.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += hist[w]
        if not counts:
            break
        top = max(counts.values())
        if top < 2:
            break
        a, b = sorted(p for p, c in counts.items() if c == top)[0]
        merges.append((a, b, top))
        for w, toks in words.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            words[w] = out
    return merges


def _hist(texts):
    h = collections.Counter()
    for t in texts:
        h.update(t.split(" "))
    return dict(h)


def test_trainer_matches_independent_reference(spark):
    texts = [
        "low low low low low lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(df, k=10)
    want = _ref_train(_hist(texts), 10)
    assert got == want


def test_trainer_tie_break_lex_asc(spark):
    # 'xy' and 'zq' both appear twice -> round 1 must pick (x, y)
    df = spark.createDataFrame(
        [(0, "xy zq xy zq")], "doc_id long, text string"
    )
    m = bpe_train(df, k=1)
    assert m[0][:2] == ("x", "y")


def test_encode_greedy_left_to_right(spark):
    # 'aaa' with merge (a,a): greedy LTR -> tokens [aa, a] = 2 tokens
    df = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    out = bpe_encode(df, [("a", "a")]).collect()[0]
    assert out["n_bpe_tokens"] == 2
    # 'aaaa' then (aa,aa): -> 1 token
    df4 = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    out4 = bpe_encode(df4, [("a", "a"), ("aa", "aa")]).collect()[0]
    assert out4["n_bpe_tokens"] == 1


def test_encode_never_crosses_word_boundary(spark):
    # merge (a,b): 'a b' is two words -> stays 2 tokens; 'ab' -> 1
    df = spark.createDataFrame(
        [(0, "a b"), (1, "ab")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, [("a", "b")]).collect()}
    assert out[0]["n_bpe_tokens"] == 2
    assert out[1]["n_bpe_tokens"] == 1


def test_encode_roundtrip_and_count(spark):
    texts = ["merge sort hash join", "row row row scan"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [(a, b) for a, b, _ in bpe_train(df, k=6)]
    enc = bpe_encode(df, merges).orderBy("doc_id").collect()
    # reference encode: apply merges greedily per word
    for row, text in zip(enc, texts):
        ref_toks = []
        for w in text.split(" "):
            toks = list(w)
            for a, b in merges:
                out, i = [], 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and toks[i] == a
                        and toks[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            ref_toks.extend(toks)
        assert row["n_bpe_tokens"] == len(ref_toks)
        # detokenized reconstruction equals the original text
        assert "".join(ref_toks) == text.replace(" ", "")
