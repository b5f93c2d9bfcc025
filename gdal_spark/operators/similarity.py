"""Embedding similarity search operators.

Brute-force cosine top-k is the exactness baseline: broadcast the query
matrix, one vectorized numpy pass over the corpus per partition
(mapInPandas), partition-local top-k prune, then a global window re-rank
over the (n_queries × k × n_partitions) survivors — the only shuffle is
that tiny candidate set. This is the scale path for "few queries × huge
corpus" (the common training-data retrieval shape).

The LSH variant buckets vectors by a 16-bit random-hyperplane signature
(deterministic hash-derived planes) so candidate generation becomes an
equi-join on the signature prefix — the 100 TB path when the query set
is itself huge.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_topk(
    corpus: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, rnk, vec_id, sim) — exact top-k by cosine.

    `queries` is a small driver-side list [(id, vector)], broadcast to
    executors as a dense float64 matrix.
    """
    spark = corpus.sparkSession
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries])
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qnorm))

    schema = "query_id long, vec_id long, sim double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mat.T  # (nq, batch)
            if exclude_self:
                mask = qids_[:, None] == ids[None, :]
                sims = np.where(mask, -np.inf, sims)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids_, kk),
                "vec_id": ids[top.ravel()],
                "sim": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[np.isfinite(out["sim"])]

    cand = corpus.select(id_col, vec_col).mapInPandas(fn, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "vec_id", F.round("sim", 6).alias("sim"))
    )


def hyperplane_signature(
    corpus: DataFrame,
    bits: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig) — random-hyperplane LSH signature via ONE matmul per
    Arrow batch (the production path; the relational/oracle-parity
    variant lives in queries.similarity)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(planes)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = bc.value
        weights = (np.int64(1) << np.arange(p.shape[1], dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sig = ((mat @ p) > 0) @ weights
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(np.int64), "sig": sig}
            )

    return corpus.select(id_col, vec_col).mapInPandas(fn, "vec_id long, sig long")


def lsh_bucket_topk(
    corpus: DataFrame,
    k: int = 5,
    bits: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs ANN: vectors sharing an LSH bucket are candidates; exact
    cosine re-rank within bucket. Shuffles once on `sig`."""
    sigs = hyperplane_signature(corpus, bits, dim, seed, id_col, vec_col)
    vecs = corpus.select(id_col, vec_col).join(sigs, id_col)
    a = vecs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "sig"
    )
    b = vecs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "sig"
    )
    pairs = a.join(b, "sig").where(F.col("id_a") != F.col("id_b"))

    def sim_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.stack([np.asarray(v, np.float64) for v in pdf["va"]])
            vb = np.stack([np.asarray(v, np.float64) for v in pdf["vb"]])
            s = np.einsum("ij,ij->i", va, vb) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "sim": s}
            )

    sims = pairs.select("id_a", "id_b", "va", "vb").mapInPandas(
        sim_fn, "id_a long, id_b long, sim double"
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("sim").desc(), F.col("id_b").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("id_a", "rnk", "id_b", F.round("sim", 6).alias("sim"))
    )
