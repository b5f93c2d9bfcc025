"""Similarity-search operator tests vs numpy brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((40, 8)).astype(np.float32)
    rows = [(i, mat[i].tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(4), mat


def _brute_topk(mat, qids, k):
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[qids] @ m.T
    out = {}
    for qi, q in enumerate(qids):
        s = sims[qi].copy()
        s[q] = -np.inf
        order = np.lexsort((np.arange(len(s)), -s))[:k]
        out[q] = [(int(v), float(s[v])) for v in order]
    return out


def test_cosine_topk_matches_bruteforce(vecs):
    df, mat = vecs
    qids = [0, 5, 11]
    queries = [(q, mat[q]) for q in qids]
    got = similarity.cosine_topk(df, queries, k=4).collect()
    want = _brute_topk(mat, qids, 4)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.vec_id, r.sim))
    for q in qids:
        rows = sorted(by_q[q])
        assert [v for _, v, _ in rows] == [v for v, _ in want[q]]
        for (_, _, sim), (_, ws) in zip(rows, want[q]):
            assert abs(sim - round(ws, 6)) < 2e-6


def test_hyperplane_signature_deterministic(vecs):
    df, mat = vecs
    s1 = {r.vec_id: r.sig for r in similarity.hyperplane_signature(df, bits=12, dim=8).collect()}
    s2 = {r.vec_id: r.sig for r in similarity.hyperplane_signature(df, bits=12, dim=8).collect()}
    assert s1 == s2
    assert all(0 <= v < 2**12 for v in s1.values())
    # matches the driver-side matmul
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 12))
    sig0 = int(((mat[0].astype(np.float64) @ planes) > 0)
               @ (1 << np.arange(12, dtype=np.int64)))
    assert s1[0] == sig0


def test_lsh_bucket_topk_self_similarity(spark):
    """Duplicated vectors land in the same bucket and rank each other #1."""
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((10, 8)).astype(np.float32)
    rows = [(i, mat[i].tolist()) for i in range(10)]
    rows += [(100 + i, mat[i].tolist()) for i in range(10)]  # exact copies
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = similarity.lsh_bucket_topk(df, k=1, bits=8, dim=8)
    got = {r.id_a: (r.id_b, r.sim) for r in top.collect()}
    for i in range(10):
        assert got[i][0] == 100 + i
        assert got[i][1] == 1.0
