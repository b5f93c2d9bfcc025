"""Dedup / text-analysis operator unit tests on tiny planted corpora."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different text about spark engines here"),
        (5, "a b"),  # too short for 3-shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_positions(corpus):
    t = dedup.tokens(corpus).where("doc_id = 5").orderBy("pos").collect()
    assert [(r.pos, r.w) for r in t] == [(0, "a"), (1, "b")]


def test_shingles(corpus):
    sh = dedup.shingles(corpus, k=3)
    got = {r.shingle for r in sh.where("doc_id = 1").collect()}
    assert "the quick brown" in got
    assert "lazy dog" not in got  # only full 3-grams
    # 9 tokens -> 7 shingles, 'the' repeats but shingles distinct
    assert sh.where("doc_id = 1").count() == 7
    assert sh.where("doc_id = 5").count() == 0  # shorter than k


def test_dedup_exact_groups(corpus):
    g = dedup.dedup_exact(corpus)
    rows = {r.kept_id: r.group_size for r in g.collect()}
    assert rows[1] == 2  # docs 1 and 2 collapse, min id kept
    assert rows[3] == 1
    assert g.count() == 4  # 5 docs -> 4 distinct texts


def test_minhash_signature_shape(corpus):
    sh = dedup.shingles(corpus, k=3)
    mh = dedup.minhash(sh, num_perm=8)
    per_doc = mh.groupBy("doc_id").count().collect()
    assert all(r["count"] == 8 for r in per_doc)
    # identical docs have identical signatures
    a = {r.perm: r.mh for r in mh.where("doc_id = 1").collect()}
    b = {r.perm: r.mh for r in mh.where("doc_id = 2").collect()}
    assert a == b


def test_minhash_lsh_finds_near_dups(corpus):
    pairs = dedup.minhash_lsh_pairs(corpus, k=3, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0  # near dup
    assert not any(4 in p for p in got)  # unrelated never paired


def test_simhash_identity_and_locality(corpus):
    sh = dedup.simhash(corpus, bits=16)
    v = {r.doc_id: r.simhash for r in sh.collect()}
    assert v[1] == v[2]  # identical text -> identical simhash
    assert 0 <= v[1] < 2**16
    # near-dup differs in few bits, unrelated differs in more
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(v[1], v[3]) <= ham(v[1], v[4])


def test_jaccard_exact_value(corpus):
    sh = dedup.shingles(corpus, k=3)
    pairs = corpus.sparkSession.createDataFrame(
        [(1, 3)], "id_a long, id_b long"
    )
    j = dedup.jaccard_pairs(sh, pairs).collect()[0]
    # 7 shingles each, 6 shared ('over the lazy dog/cat' splits 1)
    assert abs(j.jaccard - 6.0 / 8.0) < 1e-12


def test_minhash_plan_has_partial_agg(corpus):
    """Scale guard: the min() aggregation must be partially aggregated
    (map-side combine) so the shuffle carries ~num_perm rows per doc."""
    sh = dedup.shingles(corpus, k=3)
    plan = dedup.minhash(sh, num_perm=4)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan


def test_minhash_bands_matches_rowagg_and_is_mapside(corpus):
    """minhash_bands is bit-identical to band_keys(minhash(shingles()))
    — same base hash, affine constants, band combine — and its plan has
    ZERO shuffles: the signature phase is a pure map stage."""
    via_rows = dedup.band_keys(
        dedup.minhash(dedup.shingles(corpus, k=3), num_perm=8),
        rows_per_band=2,
    )
    mapside = dedup.minhash_bands(corpus, k=3, num_perm=8, rows_per_band=2)
    assert sorted(map(tuple, mapside.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, via_rows.select("doc_id", "band", "sig").collect()),
        key=lambda t: t[:2],
    )
    plan = mapside._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_bands_matches_rowagg_fast_hasher(corpus):
    """Same parity for hasher='fast' (xxhash64 pieces, bit_xor combine):
    an index built via band_keys probed with minhash_bands sigs must not
    silently get zero candidates (ADVICE r4 medium)."""
    via_rows = dedup.band_keys(
        dedup.minhash(dedup.shingles(corpus, k=3), num_perm=8, hasher="fast"),
        rows_per_band=2,
        hasher="fast",
    )
    mapside = dedup.minhash_bands(
        corpus, k=3, num_perm=8, rows_per_band=2, hasher="fast"
    )
    assert sorted(map(tuple, mapside.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, via_rows.select("doc_id", "band", "sig").collect()),
        key=lambda t: t[:2],
    )


def test_no_python_udf_in_dedup_plans(corpus):
    """Hot-path guard: dedup pipeline is pure Catalyst (no Python eval)."""
    pairs = dedup.minhash_lsh_pairs(corpus, k=3, threshold=0.5)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_hot_bucket_cap_bounds_pair_blowup(spark):
    """VERDICT r3 #1 adversarial case: a template cluster holding ~30%
    of corpus mass lands in ONE (band, sig) bucket per band; without a
    cap the within-bucket self-join is O(|cluster|²). With max_bucket
    set the hot buckets are dropped BEFORE the join, pair counts stay
    bounded, and non-cluster near-dups are still found."""
    cluster = [(i, "breaking news subscribe to our newsletter today now")
               for i in range(60)]  # 60 identical docs = 30% of 200
    uniq = [(1000 + i,
             f"document {i} talks about topic {i * 7} and subject {i * 13} in depth")
            for i in range(138)]
    near = [(5000, "spark engines process massive tables using columnar arrow data"),
            (5001, "spark engines process massive tables using columnar arrow sets")]
    df = spark.createDataFrame(
        cluster + uniq + near, "doc_id long, text string"
    ).repartition(8)

    sh = dedup.shingles(df, k=3)
    bands = dedup.band_keys(dedup.minhash(sh, num_perm=8), rows_per_band=2)

    # uncapped: the cluster alone contributes 60*59/2 = 1770 pairs
    uncapped = dedup.candidate_pairs(bands).count()
    assert uncapped >= 1770

    # capped: every cluster bucket (size 60) exceeds the cap and is
    # dropped, so pairs are bounded by the non-cluster corpus
    capped = dedup.candidate_pairs(bands, max_bucket=20)
    n_capped = capped.count()
    assert n_capped < 200  # vs >=1770: the quadratic mass is gone
    cluster_pairs = capped.where("id_a < 60 AND id_b < 60").count()
    assert cluster_pairs == 0

    # the audit trail reports exactly the dropped hot buckets
    dropped = dedup.dropped_buckets(bands, max_bucket=20).collect()
    # the 60-doc cluster bucket appears once per band (8 perms / 2 rows)
    assert sum(1 for r in dropped if r.n == 60) == 4
    assert all(r.n > 20 for r in dropped)

    # end-to-end with the guard on: the planted near-dup outside the
    # cluster is still found with its exact Jaccard
    pairs = dedup.minhash_lsh_pairs(df, k=3, threshold=0.5, max_bucket=20)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (5000, 5001) in got
    assert not any(a < 60 and b < 60 for a, b in got)


def test_minhash_fast_hasher(corpus):
    """The xxhash64 production hasher runs the same pipeline and still
    finds the planted duplicates (fingerprints differ, semantics don't)."""
    pairs = dedup.minhash_lsh_pairs(corpus, k=3, threshold=0.5, hasher="fast")
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got


def test_remove_dup_spans_hand_fixture(spark):
    """Edit semantics of the Lee-et-al removal: the shared 5-gram span
    (and every 5-window overlapping it) is cut from both carriers,
    unique docs pass through byte-identical, and a within-doc repeat
    counts toward min_count."""
    import hashlib

    from gdal_spark.operators.dedup import remove_dup_spans

    span = "v w x y z"
    docs = spark.createDataFrame(
        [
            (1, f"a b c d e {span}"),
            (2, f"p q r s t {span}"),
            (3, "unique tokens only here nothing shared"),
            # 4: the 5-gram 'm m m m m' occurs twice WITHIN this doc
            (4, "m m m m m m m m m m tail1 tail2 tail3 tail4 tail5"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_dup_spans(docs, k=5).collect()}
    # doc 1/2: tokens 5..9 are the shared span; windows starting at
    # 5 flag all of it. Earlier windows (1..4) straddle into the span
    # and are unique per doc, so the prefix a b c d e survives.
    for did, prefix in ((1, "a b c d e"), (2, "p q r s t")):
        r = out[did]
        assert r.n_tokens == 10 and r.n_kept_tokens == 5
        assert r.clean_md5 == hashlib.md5(prefix.encode()).hexdigest()
    r3 = out[3]
    assert r3.n_kept_tokens == r3.n_tokens == 6
    assert r3.clean_md5 == hashlib.md5(
        b"unique tokens only here nothing shared"
    ).hexdigest()
    # doc 4: 'm m m m m' windows at positions 0..5 all have corpus
    # count >= 2 (within-doc repeats), so all 10 m's go; the 5 tail
    # tokens survive (every window containing a tail token includes
    # its unique tail neighborhood exactly once... positions 6..9
    # windows contain tail tokens AND m's; they occur once each, so
    # only windows fully inside the m-run flag)
    r4 = out[4]
    assert r4.n_tokens == 15
    assert r4.n_kept_tokens == 5
    assert r4.clean_md5 == hashlib.md5(
        b"tail1 tail2 tail3 tail4 tail5"
    ).hexdigest()


def test_minhash_band_keys_parity_and_mapside(spark):
    """minhash_band_keys' combined bigint keys are exactly
    H64('<band>|<sig>') over minhash_bands' (band, sig) rows for BOTH
    hashers; docs shorter than k get an empty array; and the key
    projection is a pure map stage (no Exchange)."""
    from gdal_spark.portable import hash64

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for hasher in ("portable", "fast"):
        exploded = dedup.minhash_bands(
            docs, k=3, num_perm=8, rows_per_band=2, hasher=hasher
        )
        comb = (
            "xxhash64(concat(cast(band as string), '|', cast(sig as string)))"
            if hasher == "fast"
            else hash64(
                "concat(cast(band as string), '|', cast(sig as string))",
                "spark",
            )
        )
        want = {
            (r.doc_id, r.k)
            for r in exploded.selectExpr("doc_id", f"{comb} as k").collect()
        }
        keyed = dedup.minhash_band_keys(
            docs, k=3, num_perm=8, rows_per_band=2, hasher=hasher
        )
        got = {
            (r.doc_id, k)
            for r in keyed.select("doc_id", "band_keys").collect()
            for k in r.band_keys
        }
        assert got == want
        assert keyed.count() == docs.count()  # short docs kept (empty array)
    short = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    row = dedup.minhash_band_keys(short, k=3).collect()[0]
    assert row.band_keys == []
    plan = (
        dedup.minhash_band_keys(docs, k=3, num_perm=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_incremental_dedup_pairs(spark):
    """Batch-vs-corpus probe finds exactly the cross pairs the full
    self-join finds (verified against minhash_lsh_pairs on the union),
    never emits corpus-corpus or batch-batch pairs, and the corpus
    index scan is probed via BROADCAST (the corpus never shuffles
    before the collision filter)."""
    corpus = spark.createDataFrame(
        [
            (0, " ".join(f"tok{i}" for i in range(30))),
            (1, " ".join(f"aa{i}" for i in range(30))),
            (2, " ".join(f"bb{i}" for i in range(30))),
            # corpus-internal near-dup pair (3 ~ 0): must NOT be emitted
            (3, " ".join(f"tok{i}" for i in range(30)) + " drift"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, " ".join(f"tok{i}" for i in range(30)) + " extra"),  # ~0, ~3
            (11, " ".join(f"aa{i}" for i in range(30))),              # = 1
            (12, " ".join(f"zz{i}" for i in range(30))),              # unrelated
            (13, "too short"),                                        # < k tokens
        ],
        "doc_id long, text string",
    )
    out = dedup.incremental_dedup_pairs(
        corpus, batch, k=3, num_perm=16, rows_per_band=2, threshold=0.5
    )
    got = {(r.batch_id, r.corpus_id): r.jaccard for r in out.collect()}
    assert set(got) == {(10, 0), (10, 3), (11, 1)}
    assert got[(11, 1)] == 1.0
    assert 0.5 <= got[(10, 0)] < 1.0
    # parity with the full self-join on the union, restricted to cross
    # pairs (corpus ids < 10 by construction)
    full = dedup.minhash_lsh_pairs(
        corpus.unionAll(batch), k=3, num_perm=16, rows_per_band=2, threshold=0.5
    )
    cross = {
        (r.id_b, r.id_a): r.jaccard
        for r in full.collect()
        if r.id_a < 10 and r.id_b >= 10
    }
    assert cross == got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_incremental_dedup_hot_bucket_cap(spark):
    """A boilerplate corpus bucket larger than max_bucket is dropped
    whole — the colliding batch doc pairs with nothing through it —
    while unaffected buckets still pair."""
    boiler = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(20)]
        + [(100, " ".join(f"aa{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(200, boiler), (201, " ".join(f"aa{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    out = dedup.incremental_dedup_pairs(
        corpus, batch, k=3, num_perm=16, rows_per_band=2,
        threshold=0.5, max_bucket=5,
    )
    got = {(r.batch_id, r.corpus_id) for r in out.collect()}
    assert got == {(201, 100)}  # boilerplate bucket dropped whole
    # uncapped finds the 20-way fan-out
    uncapped = dedup.incremental_dedup_pairs(
        corpus, batch, k=3, num_perm=16, rows_per_band=2,
        threshold=0.5, max_bucket=None,
    )
    assert uncapped.count() == 21


def test_simhash_mapside_parity(spark):
    """simhash_cols (doc-local, zero-shuffle) is bit-identical to the
    groupBy simhash() on real documents, both hashers consistent with
    their own contract."""
    from gdal_spark.operators.dedup import simhash, simhash_cols

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        (r.doc_id, r.simhash) for r in simhash(docs, bits=16).collect()
    }
    got = {
        (r.doc_id, r.simhash)
        for r in simhash_cols(docs, bits=16).select("doc_id", "simhash").collect()
    }
    assert got == want and len(got) == docs.count()
    # plan: the map-side path has no Exchange before the projection
    plan = simhash_cols(docs, bits=16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cluster_safe_split_keeps_clusters_together(spark):
    """A~B, B~C (no direct A~C pair): all three land on ONE side via
    the cluster canonical's gate; singletons split independently;
    permille 0/1000 degenerate to all-train/all-eval; and the split is
    reproducible call-to-call (hash gate, not rand)."""
    from gdal_spark.operators.dedup import cluster_safe_split

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 7), (7, 3)], "id_a long, id_b long"
    )
    out = {r.doc_id: r for r in cluster_safe_split(df, pairs, 500).collect()}
    assert len(out) == 10
    assert {out[0].cluster_id, out[3].cluster_id, out[7].cluster_id} == {0}
    assert len({out[0].split, out[3].split, out[7].split}) == 1
    for i in (1, 2, 4, 5, 6, 8, 9):
        assert out[i].cluster_id == i
    splits = {r.doc_id: r.split for r in cluster_safe_split(df, pairs, 500).collect()}
    assert splits == {i: out[i].split for i in out}
    assert {
        r.split for r in cluster_safe_split(df, pairs, 0).collect()
    } == {"train"}
    assert {
        r.split for r in cluster_safe_split(df, pairs, 1000).collect()
    } == {"eval"}


def test_simhash_blocks_partition():
    """Pigeonhole blocks tile [0, bits) exactly, widths within 1."""
    for bits, k in ((16, 3), (32, 3), (64, 6), (13, 4)):
        blocks = dedup.simhash_blocks(bits, k)
        assert len(blocks) == k + 1
        covered = [b for off, w in blocks for b in range(off, off + w)]
        assert covered == list(range(bits))
        widths = {w for _, w in blocks}
        assert max(widths) - min(widths) <= 1
    with pytest.raises(ValueError):
        dedup.simhash_blocks(4, 4)


def test_simhash_hamming_pairs_matches_brute_force(spark):
    """Manku block-probe recall is PERFECT: the blocked plan's output
    equals the all-pairs Hamming<=k join, for every k (the pigeonhole
    argument, checked exhaustively on a planted corpus)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "the quick brown fox jumps over the lazy dog tonight again"),
        (3, "the quick brown fox jumps over the lazy cat tonight again"),
        (4, "completely different text about spark engines and arrow data"),
        (5, "breaking news subscribe to our newsletter today for updates"),
        (6, "breaking news subscribe to our newsletter now for updates"),
        (7, "one more unrelated document mentioning graphs and rasters"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r.doc_id: r.simhash
        for r in dedup.simhash_cols(df, bits=32).collect()
    }
    for k in (0, 2, 4):
        brute = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= k
        }
        got = {
            tuple(r)
            for r in dedup.simhash_hamming_pairs(
                df, bits=32, max_hamming=k
            ).collect()
        }
        assert got == brute, f"k={k}"
    # exact dup pair present at k=0; near dups appear as k grows
    assert (1, 2, 0) in {
        tuple(r)
        for r in dedup.simhash_hamming_pairs(df, bits=32, max_hamming=0).collect()
    }


def test_simhash_hamming_hot_bucket_cap(spark):
    """A template cluster floods every block bucket; the window cap
    drops those buckets before the self-join and pair counts stay
    bounded, while distinct near-dups outside the cluster survive."""
    cluster = [(i, "breaking news subscribe to our newsletter today now")
               for i in range(60)]
    near = [(5000, "spark engines process massive tables using columnar arrow data"),
            (5001, "spark engines process massive tables using columnar arrow sets")]
    uniq = [(1000 + i,
             f"document {i} covers topic {i * 7} and subject {i * 13} deeply")
            for i in range(40)]
    df = spark.createDataFrame(
        cluster + near + uniq, "doc_id long, text string"
    ).repartition(8)
    uncapped = dedup.simhash_hamming_pairs(df, bits=32, max_hamming=3,
                                           max_bucket=None)
    assert uncapped.where("id_a < 60 and id_b < 60").count() == 1770
    capped = dedup.simhash_hamming_pairs(df, bits=32, max_hamming=3,
                                         max_bucket=20)
    assert capped.where("id_a < 60 and id_b < 60").count() == 0
    assert (5000, 5001) in {
        (r.id_a, r.id_b) for r in capped.collect()
    }


def test_containment_finds_quotes_jaccard_misses(spark):
    """A short doc quoted inside a much longer one: containment ~1.0
    but Jaccard far below threshold — the asymmetric case the Broder
    containment operator exists for."""
    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "intro words here now " + quote +
        " and then many more completely different trailing words "
        "continue the article for a while longer still going on"
    )
    rows = [
        (1, quote),
        (2, long_doc),
        (3, "totally unrelated text about raster pyramids and tiles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.containment_a, r.containment_b)
        for r in dedup.containment_pairs(df, k=3, threshold=0.9).collect()
    }
    assert (1, 2) in got
    ca, cb = got[(1, 2)]
    assert ca == 1.0 and cb < 0.5  # directional: quote fully contained
    assert not any(3 in p for p in got)
    # symmetric Jaccard at the same bar misses the pair entirely
    jac = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(df, k=3, threshold=0.9).collect()
    }
    assert (1, 2) not in jac
