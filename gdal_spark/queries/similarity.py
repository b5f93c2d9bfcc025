"""Similarity-search queries over `embeddings` (vec_id, embedding float[64], label).

- ann_cosine_topk: exact brute-force cosine top-k (broadcast query
  matrix, partition-local prune, global window re-rank) — the
  correctness baseline for any ANN index.
- ann_lsh_signature: random-hyperplane signature, relational variant
  with hash-derived ±1 planes so the DuckDB oracle reproduces it
  bit-for-bit (the production matmul variant is
  operators.similarity.hyperplane_signature, pinned by pytest).
- embedding_label_centroids: per-label mean vector (posexplode +
  groupBy — partial aggregation keeps the shuffle at |labels|×dim rows).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark import tables
from gdal_spark.operators.similarity import cosine_topk
from gdal_spark.portable import hash64

TOPK = 5
N_QUERIES = 10
SIG_BITS = 16


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    # The testdata parquet is a SINGLE row group, so the scan yields one
    # split and the dot-product map phase would run on 1 of N cores.
    # Rebalance to the session's parallelism — on a real table the scan
    # itself supplies the splits and this exchange disappears.
    return spark.table("embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )


def query_vectors(
    emb: DataFrame, n: int = N_QUERIES
) -> list[tuple[int, np.ndarray]]:
    """The first n embedding rows as driver-side (id, vector) query
    pairs — the protocol every broadcast-query retrieval op shares."""
    qrows = (
        emb.where(F.col("vec_id") < n)
        .select("vec_id", "embedding")
        .collect()  # bounded-metadata: the n query vectors
    )
    return [(int(r["vec_id"]), np.asarray(r["embedding"])) for r in qrows]


def _ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _emb(spark, sf_dir)
    return cosine_topk(corpus, query_vectors(corpus), k=TOPK)


ANN_COSINE_ORACLE = f"""
    with ranked as (
        select q.vec_id as query_id, c.vec_id as vec_id,
               list_cosine_similarity(cast(q.embedding as double[]),
                                      cast(c.embedding as double[])) as sim,
               row_number() over (
                   partition by q.vec_id
                   order by list_cosine_similarity(
                       cast(q.embedding as double[]),
                       cast(c.embedding as double[])) desc,
                       c.vec_id asc) as rnk
        from embeddings q join embeddings c on q.vec_id <> c.vec_id
        where q.vec_id < {N_QUERIES}
    )
    select query_id, rnk, vec_id, round(sim, 6) as sim
    from ranked where rnk <= {TOPK}
"""


def _rel_signatures(e: DataFrame) -> DataFrame:
    """Relational LSH signature: plane(j,d) = ±1 from the portable hash;
    bit j set iff sum_d emb[d]*plane(j,d) > 0. Pure Catalyst."""
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("d", "v")
    ).select(
        "vec_id",
        "d",
        F.col("v").cast("double").alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(SIG_BITS - 1))).alias("j"),
    )
    sgn = F.when(
        F.expr(hash64("concat(cast(j as string), '_', cast(d as string))", "spark"))
        % 2
        == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    per_bit = ex.groupBy("vec_id", "j").agg(F.sum(F.col("v") * sgn).alias("s"))
    contrib = F.when(
        F.col("s") > 0, F.expr("cast(shiftleft(1, j) as bigint)")
    ).otherwise(F.lit(0))
    return per_bit.groupBy("vec_id").agg(F.sum(contrib).alias("sig"))


def _ann_lsh_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rel_signatures(_emb(spark, sf_dir))


_H_JD = hash64("concat(cast(j as varchar), '_', cast(d as varchar))", "duckdb")

ANN_LSH_ORACLE = f"""
    with ex as (
        select vec_id,
               unnest(range(len(embedding))) as d,
               cast(unnest(embedding) as double) as v
        from embeddings
    ),
    bits as (
        select vec_id, j,
               sum(v * (case when {_H_JD} % 2 = 1 then 1.0 else -1.0 end)) as s
        from ex cross join (select unnest(range({SIG_BITS})) as j)
        group by vec_id, j
    )
    select vec_id,
           cast(sum(case when s > 0 then cast(1 << j as bigint) else 0 end)
                as bigint) as sig
    from bits group by vec_id
"""


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode("embedding").alias("d", "v"))
        .groupBy("label", "d")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("mean_v"))
    )


LABEL_CENTROID_ORACLE = """
    select label, d, round(avg(v), 6) as mean_v
    from (
        select label,
               unnest(range(len(embedding))) as d,
               cast(unnest(embedding) as double) as v
        from embeddings
    )
    group by label, d
"""

QUERIES = {
    "ann_cosine_topk": _ann_cosine_topk,
    "ann_lsh_signature": _ann_lsh_signature,
    "embedding_label_centroids": _label_centroids,
}

ORACLES = {
    "ann_cosine_topk": ANN_COSINE_ORACLE,
    "ann_lsh_signature": ANN_LSH_ORACLE,
    "embedding_label_centroids": LABEL_CENTROID_ORACLE,
}


# --- IVF ANN (coarse k-means quantizer + nprobe bucket search) --------------
# The scale path for huge-corpus ANN: codebook trained with
# deterministic Lloyd iterations (round-6 centroids, round-8 distances,
# lowest-cid ties), search touches only nprobe cells. The oracle unrolls
# the SAME iterations in SQL — every rounding point mirrored, so the
# trained codebook, cell assignment, candidate set and ranking are
# hash-exact.

# k is DERIVED from the corpus size (ivf_default_k: k ≈ √N — the IVF
# scale contract); 22 = ivf_default_k(500) for the sf0.001/sf0.01
# embeddings table the gate runs against. The oracle string is static,
# so it pins the derived value explicitly.
_IVF_K = 22
_IVF_ITERS = 3
_IVF_QIDS = [0, 1, 2, 3, 4]
_IVF_NPROBE = 2
_IVF_TOPK = 5
_DIM = 64


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.similarity import (
        ivf_default_k,
        ivf_topk,
        ivf_train,
    )

    emb = _emb(spark, sf_dir)
    cents = ivf_train(emb, k=None, iters=_IVF_ITERS)  # k derived ≈ √N
    assert len(cents) == ivf_default_k(emb.count())
    out = ivf_topk(
        emb, cents, _IVF_QIDS, nprobe=_IVF_NPROBE, topk=_IVF_TOPK
    )
    return out.select("qid", "vec_id", "cos", "rank")


def _ann_ivf_oracle() -> str:
    steps = [
        f"""
    x as (
        select vec_id, p.pos, cast(embedding[p.pos + 1] as double) as v
        from embeddings cross join (select unnest(range({_DIM})) as pos) p
    ),
    c0 as (select vec_id as cid, pos, v from x where vec_id < {_IVF_K})"""
    ]
    for i in range(_IVF_ITERS):
        steps.append(f"""
    a{i} as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join c{i} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    m{i} as (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from a{i}
        ) where rn = 1
    ),
    n{i} as (
        select m.cid, x.pos, round(sum(x.v) / count(*), 6) as v
        from m{i} m join x on x.vec_id = m.vec_id
        group by m.cid, x.pos
    ),
    c{i + 1} as (
        select c.cid, c.pos, coalesce(n.v, c.v) as v
        from c{i} c left join n{i} n
          on n.cid = c.cid and n.pos = c.pos
    )""")
    fc = f"c{_IVF_ITERS}"
    qids = ", ".join(str(q) for q in _IVF_QIDS)
    return (
        "with "
        + ",".join(steps)
        + f""",
    af as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join {fc} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    cells as (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from af
        ) where rn = 1
    ),
    qprobe as (
        select vec_id as qid, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from af where vec_id in ({qids})
        ) where rn <= {_IVF_NPROBE}
    ),
    cand as (
        select q.qid, c.vec_id
        from qprobe q join cells c on c.cid = q.cid
        where c.vec_id <> q.qid
    ),
    cos as (
        select cd.qid, cd.vec_id,
               round(sum(qx.v * vx.v)
                     / (sqrt(sum(qx.v * qx.v)) * sqrt(sum(vx.v * vx.v))),
                     6) as cos
        from cand cd
        join x qx on qx.vec_id = cd.qid
        join x vx on vx.vec_id = cd.vec_id and vx.pos = qx.pos
        group by cd.qid, cd.vec_id
    )
    select qid, vec_id, cos, rank from (
        select qid, vec_id, cos,
               row_number() over (partition by qid
                                  order by cos desc, vec_id) as rank
        from cos
    ) where rank <= {_IVF_TOPK}
    """
    )


QUERIES["ann_ivf_topk"] = _ann_ivf
ORACLES["ann_ivf_topk"] = _ann_ivf_oracle()


# --- embedding-cosine near-dup (the dedup-family variant of LSH ANN):
# corpus ⊎ deterministically-perturbed copies; candidates = equal
# relational LSH signature; exact cosine >= threshold. The oracle
# mirrors the signature construction and the explode-sum cosine.

_EDUP_T = 0.98
_EDUP_PERT = 0.01


def _dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    pert = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            f"transform(embedding, (v, i) -> cast(v as double) "
            f"+ {_EDUP_PERT!r} * cast(i % 3 as double))"
        ).alias("embedding"),
    )
    corpus = e.select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(v as double))").alias(
            "embedding"
        ),
    ).unionByName(pert)
    sig = _rel_signatures(corpus)
    # hot-bucket stop guard (operators.dedup.candidate_pairs semantics):
    # drop signature buckets larger than the cap BEFORE the self-join so
    # a template cluster cannot go O(n²) through one bucket. The corpus
    # here is ≤ ~2·|embeddings| rows at any sf the oracle runs, far
    # below the cap, so the guard never fires and the DuckDB oracle
    # (which omits it) stays value-identical.
    _cap = 10_000
    sig = (
        sig.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("sig"))
        )
        .where(F.col("_bn") <= _cap)
        .drop("_bn")
    )
    pairs = (
        sig.alias("a")
        .join(sig.alias("b"), F.col("a.sig") == F.col("b.sig"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
    )
    ex = corpus.select("vec_id", F.posexplode("embedding").alias("d", "v"))
    ea = ex.select(
        F.col("vec_id").alias("id_a"), "d", F.col("v").alias("va")
    )
    eb = ex.select(
        F.col("vec_id").alias("id_b"), "d", F.col("v").alias("vb")
    )
    cos = (
        pairs.join(ea, "id_a")
        .join(eb, ["id_b", "d"])
        .groupBy("id_a", "id_b")
        .agg(
            (
                F.sum(F.col("va") * F.col("vb"))
                / (
                    F.sqrt(F.sum(F.col("va") * F.col("va")))
                    * F.sqrt(F.sum(F.col("vb") * F.col("vb")))
                )
            ).alias("cos")
        )
    )
    return cos.where(F.col("cos") >= _EDUP_T).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos")
    )


DEDUP_EMB_ORACLE = f"""
    with corpus as (
        select vec_id,
               unnest(range(len(embedding))) as d,
               cast(unnest(embedding) as double) as v
        from embeddings
        union all
        select vec_id + 100000 as vec_id,
               unnest(range(len(embedding))) as d,
               cast(unnest(embedding) as double)
                 + {_EDUP_PERT!r} * cast(unnest(range(len(embedding))) % 3
                                         as double) as v
        from embeddings
    ),
    bits as (
        select vec_id, j,
               sum(v * (case when {_H_JD} % 2 = 1 then 1.0 else -1.0 end)) as s
        from corpus cross join (select unnest(range({SIG_BITS})) as j)
        group by vec_id, j
    ),
    sig as (
        select vec_id,
               cast(sum(case when s > 0 then cast(1 << j as bigint)
                        else 0 end) as bigint) as sig
        from bits group by vec_id
    ),
    pairs as (
        select a.vec_id as id_a, b.vec_id as id_b
        from sig a join sig b on a.sig = b.sig
        where a.vec_id < b.vec_id
    ),
    cos as (
        select p.id_a, p.id_b,
               sum(ca.v * cb.v)
               / (sqrt(sum(ca.v * ca.v)) * sqrt(sum(cb.v * cb.v))) as cos
        from pairs p
        join corpus ca on ca.vec_id = p.id_a
        join corpus cb on cb.vec_id = p.id_b and cb.d = ca.d
        group by p.id_a, p.id_b
    )
    select id_a, id_b, round(cos, 6) as cos
    from cos where cos >= {_EDUP_T}
"""

QUERIES["dedup_embedding_cosine"] = _dedup_embedding_cosine
ORACLES["dedup_embedding_cosine"] = DEDUP_EMB_ORACLE


# --- SemDeDup (Abbas et al. 2023): k-means cluster the embedding
# space, pairwise cosine WITHIN each cluster only, drop vectors with a
# lower-id near-identical cluster-mate. Corpus = embeddings ⊎ the same
# deterministic perturbed copies as dedup_embedding_cosine, so every
# copy should land in its original's cell and be dropped. The oracle
# unrolls the SAME deterministic Lloyd iterations as the IVF oracle
# over the union corpus, then mirrors the per-cell pairwise max-cos.

_SEM_K = 32  # ivf_default_k(2 * 500) — asserted in the query builder
_SEM_ITERS = 2
_SEM_T = 0.98


def _semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.similarity import (
        ivf_default_k,
        ivf_train,
        semdedup,
    )

    e = _emb(spark, sf_dir)
    pert = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            f"transform(embedding, (v, i) -> cast(v as double) "
            f"+ {_EDUP_PERT!r} * cast(i % 3 as double))"
        ).alias("embedding"),
    )
    corpus = e.select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(v as double))").alias(
            "embedding"
        ),
    ).unionByName(pert)
    # k derived ≈ √N — equals the oracle's pinned _SEM_K at the two
    # oracle sfs (corpus = 2×500 rows); at other sfs the query still
    # runs with its own √N (the oracle is only evaluated at sf≤0.01).
    cents = ivf_train(corpus, k=None, iters=_SEM_ITERS)
    assert len(cents) == ivf_default_k(corpus.count())
    out = semdedup(corpus, cents, threshold=_SEM_T)
    return out.select("vec_id", "cid", "max_cos_lower", "keep")


def _semdedup_oracle() -> str:
    steps = [
        f"""
    x as materialized (
        select vec_id,
               unnest(range(len(embedding))) as pos,
               cast(unnest(embedding) as double) as v
        from embeddings
        union all
        select vec_id + 100000 as vec_id,
               unnest(range(len(embedding))) as pos,
               cast(unnest(embedding) as double)
                 + {_EDUP_PERT!r} * cast(unnest(range(len(embedding))) % 3
                                         as double) as v
        from embeddings
    ),
    c0 as (select vec_id as cid, pos, v from x where vec_id < {_SEM_K})"""
    ]
    for i in range(_SEM_ITERS):
        steps.append(f"""
    a{i} as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join c{i} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    m{i} as (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from a{i}
        ) where rn = 1
    ),
    n{i} as (
        select m.cid, x.pos, round(sum(x.v) / count(*), 6) as v
        from m{i} m join x on x.vec_id = m.vec_id
        group by m.cid, x.pos
    ),
    c{i + 1} as (
        select c.cid, c.pos, coalesce(n.v, c.v) as v
        from c{i} c left join n{i} n
          on n.cid = c.cid and n.pos = c.pos
    )""")
    fc = f"c{_SEM_ITERS}"
    return (
        "with "
        + ",".join(steps)
        + f""",
    af as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join {fc} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    cells as materialized (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from af
        ) where rn = 1
    ),
    pairs as (
        select a.vec_id as lo, b.vec_id as hi
        from cells a join cells b
          on a.cid = b.cid and a.vec_id < b.vec_id
    ),
    cos as (
        select p.hi,
               sum(xa.v * xb.v)
               / (sqrt(sum(xa.v * xa.v)) * sqrt(sum(xb.v * xb.v))) as cos
        from pairs p
        join x xa on xa.vec_id = p.lo
        join x xb on xb.vec_id = p.hi and xb.pos = xa.pos
        group by p.hi, p.lo
    ),
    mx as (
        select hi as vec_id, round(max(cos), 6) as max_cos_lower
        from cos group by hi
    )
    select c.vec_id, c.cid, m.max_cos_lower,
           coalesce(m.max_cos_lower < {_SEM_T}, true) as keep
    from cells c left join mx m on m.vec_id = c.vec_id
    """
    )


QUERIES["semdedup"] = _semdedup
ORACLES["semdedup"] = _semdedup_oracle()


# --- PQ/ADC ANN (product quantization + asymmetric-distance scan) -----------
# The billion-vector compression path (faiss IndexPQ shape): m per-subspace
# codebooks trained with the same deterministic Lloyd contract as IVF
# (round-8 distances, round-6 centroid updates, lowest-code ties, init =
# the ksub lowest-id vectors' subvectors), corpus scanned as m-byte codes
# against a broadcast per-query lookup table. The oracle unrolls the SAME
# iterations in SQL with a `sub` grouping column — one generic CTE chain
# trains all m subspaces at once, exactly like the engine's single
# shuffle per iteration.

_PQ_M = 4
_PQ_KSUB = 8
_PQ_ITERS = 2
_PQ_QIDS = [0, 1, 2, 3, 4]
_PQ_TOPK = 5
_PQ_DSUB = _DIM // _PQ_M


def _ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.similarity import pq_topk, pq_train

    emb = _emb(spark, sf_dir)
    books = pq_train(emb, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS)
    return pq_topk(emb, books, _PQ_QIDS, topk=_PQ_TOPK)


def _ann_pq_oracle() -> str:
    steps = [
        f"""
    x as (
        select vec_id, p.pos // {_PQ_DSUB} as sub,
               p.pos % {_PQ_DSUB} as spos,
               cast(embedding[p.pos + 1] as double) as v
        from embeddings cross join (select unnest(range({_DIM})) as pos) p
    ),
    c0 as (select vec_id as code, sub, spos, v from x
           where vec_id < {_PQ_KSUB})"""
    ]
    for i in range(_PQ_ITERS):
        steps.append(f"""
    a{i} as (
        select x.vec_id, x.sub, c.code,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join c{i} c on c.sub = x.sub and c.spos = x.spos
        group by x.vec_id, x.sub, c.code
    ),
    m{i} as (
        select vec_id, sub, code from (
            select vec_id, sub, code,
                   row_number() over (partition by vec_id, sub
                                      order by d2, code) as rn
            from a{i}
        ) where rn = 1
    ),
    n{i} as (
        select m.sub, m.code, x.spos, round(sum(x.v) / count(*), 6) as v
        from m{i} m join x on x.vec_id = m.vec_id and x.sub = m.sub
        group by m.sub, m.code, x.spos
    ),
    c{i + 1} as (
        select c.code, c.sub, c.spos, coalesce(n.v, c.v) as v
        from c{i} c left join n{i} n
          on n.sub = c.sub and n.code = c.code and n.spos = c.spos
    )""")
    fc = f"c{_PQ_ITERS}"
    qids = ", ".join(str(q) for q in _PQ_QIDS)
    return (
        "with "
        + ",".join(steps)
        + f""",
    af as (
        select x.vec_id, x.sub, c.code,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join {fc} c on c.sub = x.sub and c.spos = x.spos
        group by x.vec_id, x.sub, c.code
    ),
    codes as (
        select vec_id, sub, code from (
            select vec_id, sub, code,
                   row_number() over (partition by vec_id, sub
                                      order by d2, code) as rn
            from af
        ) where rn = 1
    ),
    lutq as (
        -- UNROUNDED per-subspace query-to-codeword distances: the
        -- round-8 lattice in af is only for argmin tie stability;
        -- summing lattice values would put round(adc, 6) on an exact
        -- .5 boundary ~1% of the time (engine/SQL rounding modes
        -- disagree there). Off-lattice sums hit it with measure zero.
        select q.vec_id as qid, c.sub, c.code,
               sum((q.v - c.v) * (q.v - c.v)) as d2
        from x q join {fc} c on c.sub = q.sub and c.spos = q.spos
        where q.vec_id in ({qids})
        group by q.vec_id, c.sub, c.code
    ),
    adc as (
        select l.qid, cd.vec_id,
               round(sum(l.d2), 6) as adc
        from codes cd
        join lutq l on l.sub = cd.sub and l.code = cd.code
        where cd.vec_id <> l.qid
        group by l.qid, cd.vec_id
    )
    select qid, vec_id, adc, rank from (
        select qid, vec_id, adc,
               row_number() over (partition by qid
                                  order by adc, vec_id) as rank
        from adc
    ) where rank <= {_PQ_TOPK}
    """
    )


QUERIES["ann_pq_topk"] = _ann_pq
ORACLES["ann_pq_topk"] = _ann_pq_oracle()


# --- IVFPQ ANN (coarse quantizer + PQ on residuals — faiss IVFPQ) -----------
# The production billion-vector composition: ivf_train's coarse cells
# bound the scan, pq_train on RESIDUALS compresses it, search probes
# nprobe cells and scans codes against per-(query, cell) residual LUTs.
# The oracle unrolls BOTH deterministic Lloyd trainings (full-dim coarse,
# then per-subspace residual) plus the probe/ADC in one generated SQL;
# multi-referenced CTEs are MATERIALIZED (DuckDB otherwise inlines the
# chain exponentially — the bpe_train_merges lesson).

_IPQ_KC = 8
_IPQ_M = 4
_IPQ_KSUB = 8
_IPQ_ITERS = 2
_IPQ_NPROBE = 2
_IPQ_TOPK = 5
_IPQ_QIDS = [0, 1, 2, 3, 4]
_IPQ_DSUB = _DIM // _IPQ_M


def _ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.similarity import ivfpq_topk, ivfpq_train

    emb = _emb(spark, sf_dir)
    coarse, books = ivfpq_train(
        emb, k_coarse=_IPQ_KC, m=_IPQ_M, ksub=_IPQ_KSUB, iters=_IPQ_ITERS
    )
    return ivfpq_topk(
        emb, coarse, books, _IPQ_QIDS, nprobe=_IPQ_NPROBE, topk=_IPQ_TOPK
    )


def _ann_ivfpq_oracle() -> str:
    steps = [
        f"""
    x as materialized (
        select vec_id, p.pos, cast(embedding[p.pos + 1] as double) as v
        from embeddings cross join (select unnest(range({_DIM})) as pos) p
    ),
    c0 as materialized (
        select vec_id as cid, pos, v from x where vec_id < {_IPQ_KC})"""
    ]
    for i in range(_IPQ_ITERS):
        steps.append(f"""
    a{i} as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join c{i} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    m{i} as (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from a{i}
        ) where rn = 1
    ),
    n{i} as (
        select m.cid, x.pos, round(sum(x.v) / count(*), 6) as v
        from m{i} m join x on x.vec_id = m.vec_id
        group by m.cid, x.pos
    ),
    c{i + 1} as materialized (
        select c.cid, c.pos, coalesce(n.v, c.v) as v
        from c{i} c left join n{i} n
          on n.cid = c.cid and n.pos = c.pos
    )""")
    fc = f"c{_IPQ_ITERS}"
    steps.append(f"""
    af as materialized (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join {fc} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    cells as materialized (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from af
        ) where rn = 1
    ),
    rx as materialized (
        select x.vec_id, x.pos // {_IPQ_DSUB} as sub,
               x.pos % {_IPQ_DSUB} as spos,
               x.v - cf.v as v
        from x
        join cells ce on ce.vec_id = x.vec_id
        join {fc} cf on cf.cid = ce.cid and cf.pos = x.pos
    ),
    rc0 as materialized (
        select vec_id as code, sub, spos, v from rx
        where vec_id < {_IPQ_KSUB})""")
    for i in range(_IPQ_ITERS):
        steps.append(f"""
    ra{i} as (
        select rx.vec_id, rx.sub, c.code,
               round(sum((rx.v - c.v) * (rx.v - c.v)), 8) as d2
        from rx join rc{i} c on c.sub = rx.sub and c.spos = rx.spos
        group by rx.vec_id, rx.sub, c.code
    ),
    rm{i} as (
        select vec_id, sub, code from (
            select vec_id, sub, code,
                   row_number() over (partition by vec_id, sub
                                      order by d2, code) as rn
            from ra{i}
        ) where rn = 1
    ),
    rn{i} as (
        select m.sub, m.code, rx.spos, round(sum(rx.v) / count(*), 6) as v
        from rm{i} m join rx on rx.vec_id = m.vec_id and rx.sub = m.sub
        group by m.sub, m.code, rx.spos
    ),
    rc{i + 1} as materialized (
        select c.code, c.sub, c.spos, coalesce(n.v, c.v) as v
        from rc{i} c left join rn{i} n
          on n.sub = c.sub and n.code = c.code and n.spos = c.spos
    )""")
    rfc = f"rc{_IPQ_ITERS}"
    qids = ", ".join(str(q) for q in _IPQ_QIDS)
    return (
        "with "
        + ",".join(steps)
        + f""",
    raf as (
        select rx.vec_id, rx.sub, c.code,
               round(sum((rx.v - c.v) * (rx.v - c.v)), 8) as d2
        from rx join {rfc} c on c.sub = rx.sub and c.spos = rx.spos
        group by rx.vec_id, rx.sub, c.code
    ),
    codes as materialized (
        select vec_id, sub, code from (
            select vec_id, sub, code,
                   row_number() over (partition by vec_id, sub
                                      order by d2, code) as rn
            from raf
        ) where rn = 1
    ),
    qprobe as materialized (
        select vec_id as qid, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from af where vec_id in ({qids})
        ) where rn <= {_IPQ_NPROBE}
    ),
    qres as (
        select qp.qid, qp.cid,
               x.pos // {_IPQ_DSUB} as sub, x.pos % {_IPQ_DSUB} as spos,
               x.v - cf.v as v
        from qprobe qp
        join x on x.vec_id = qp.qid
        join {fc} cf on cf.cid = qp.cid and cf.pos = x.pos
    ),
    lut as materialized (
        -- UNROUNDED residual-to-codeword distances (PQ off-lattice
        -- contract: round(adc, 6) must not sit on a rounding-mode
        -- boundary)
        select q.qid, q.cid, c.sub, c.code,
               sum((q.v - c.v) * (q.v - c.v)) as d2
        from qres q join {rfc} c on c.sub = q.sub and c.spos = q.spos
        group by q.qid, q.cid, c.sub, c.code
    ),
    adc as (
        select qp.qid, ce.vec_id, round(sum(l.d2), 6) as adc
        from qprobe qp
        join cells ce on ce.cid = qp.cid and ce.vec_id <> qp.qid
        join codes cd on cd.vec_id = ce.vec_id
        join lut l on l.qid = qp.qid and l.cid = qp.cid
                  and l.sub = cd.sub and l.code = cd.code
        group by qp.qid, ce.vec_id
    )
    select qid, vec_id, adc, rank from (
        select qid, vec_id, adc,
               row_number() over (partition by qid
                                  order by adc, vec_id) as rank
        from adc
    ) where rank <= {_IPQ_TOPK}
    """
    )


QUERIES["ann_ivfpq_topk"] = _ann_ivfpq
ORACLES["ann_ivfpq_topk"] = _ann_ivfpq_oracle()


# --- Prototype pruning (Sorscher et al. 2022, arXiv:2206.14486) --------------
# k-means the embedding space with the shared deterministic Lloyd trainer,
# score every vector by cosine to its cluster prototype, and prune the most
# prototypical prune_frac of EACH cluster (per-cluster pruning preserves
# cluster balance — the paper's protocol for large datasets).  The oracle
# unrolls the SAME Lloyd iterations as the IVF/semdedup oracles over the
# plain embeddings table, then mirrors the round-6 prototype cosine and the
# rank-on-rounded-values keep rule.

_PP_K = 22  # ivf_default_k(500) — asserted in the query builder
_PP_ITERS = 2
_PP_FRAC = 0.25


def _prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.similarity import (
        ivf_default_k,
        ivf_train,
        prototype_prune,
    )

    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(v as double))").alias(
            "embedding"
        ),
    )
    # k derived ≈ √N — equals the oracle's pinned _PP_K at the two oracle
    # sfs (500 rows); at other sfs the query still runs with its own √N.
    cents = ivf_train(e, k=None, iters=_PP_ITERS)
    assert len(cents) == ivf_default_k(e.count())
    return prototype_prune(e, cents, prune_frac=_PP_FRAC)


def _prototype_prune_oracle() -> str:
    steps = [
        f"""
    x as materialized (
        select vec_id,
               unnest(range(len(embedding))) as pos,
               cast(unnest(embedding) as double) as v
        from embeddings
    ),
    c0 as (select vec_id as cid, pos, v from x where vec_id < {_PP_K})"""
    ]
    for i in range(_PP_ITERS):
        steps.append(f"""
    a{i} as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join c{i} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    m{i} as (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from a{i}
        ) where rn = 1
    ),
    n{i} as (
        select m.cid, x.pos, round(sum(x.v) / count(*), 6) as v
        from m{i} m join x on x.vec_id = m.vec_id
        group by m.cid, x.pos
    ),
    c{i + 1} as (
        select c.cid, c.pos, coalesce(n.v, c.v) as v
        from c{i} c left join n{i} n
          on n.cid = c.cid and n.pos = c.pos
    )""")
    fc = f"c{_PP_ITERS}"
    return (
        "with "
        + ",".join(steps)
        + f""",
    af as (
        select x.vec_id, c.cid,
               round(sum((x.v - c.v) * (x.v - c.v)), 8) as d2
        from x join {fc} c on c.pos = x.pos
        group by x.vec_id, c.cid
    ),
    cells as materialized (
        select vec_id, cid from (
            select vec_id, cid,
                   row_number() over (partition by vec_id
                                      order by d2, cid) as rn
            from af
        ) where rn = 1
    ),
    cos as (
        select ce.vec_id, ce.cid,
               round(sum(x.v * c.v)
                     / (sqrt(sum(x.v * x.v)) * sqrt(sum(c.v * c.v))),
                     6) as proto_cos
        from cells ce
        join x on x.vec_id = ce.vec_id
        join {fc} c on c.cid = ce.cid and c.pos = x.pos
        group by ce.vec_id, ce.cid
    )
    select vec_id, cid, proto_cos, rnk,
           rnk > floor({_PP_FRAC} * n) as keep
    from (
        select vec_id, cid, proto_cos,
               row_number() over (partition by cid
                                  order by proto_cos desc, vec_id) as rnk,
               count(*) over (partition by cid) as n
        from cos
    )
    """
    )


QUERIES["prototype_prune"] = _prototype_prune
ORACLES["prototype_prune"] = _prototype_prune_oracle()


# --- contrastive hard-negative mining ---


def _hard_negative_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most-similar DIFFERENT-label vectors per anchor
    (operators/similarity.py hard_negatives) — the candidate set for
    contrastive training; same broadcast-matmul + window-re-rank shape
    as ann_cosine_topk with a label mask."""
    from gdal_spark.operators.similarity import hard_negatives

    corpus = _emb(spark, sf_dir)
    arows = (
        corpus.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    anchors = [
        (int(r["vec_id"]), np.asarray(r["embedding"]), int(r["label"]))
        for r in arows
    ]
    return hard_negatives(corpus, anchors, k=TOPK)


ORACLES["hard_negative_mine"] = f"""
    with ranked as (
        select q.vec_id as query_id, c.vec_id as vec_id,
               list_cosine_similarity(cast(q.embedding as double[]),
                                      cast(c.embedding as double[])) as sim,
               row_number() over (
                   partition by q.vec_id
                   order by list_cosine_similarity(
                       cast(q.embedding as double[]),
                       cast(c.embedding as double[])) desc,
                       c.vec_id asc) as rnk
        from embeddings q join embeddings c on q.label <> c.label
        where q.vec_id < {N_QUERIES}
    )
    select query_id, rnk, vec_id, round(sim, 6) as sim
    from ranked where rnk <= {TOPK}
"""
QUERIES["hard_negative_mine"] = _hard_negative_mine


# --- distributed exact Gram / second-moment matrix (PCA primitive) ---

def _embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper triangle of the 64x64 second-moment matrix, fixed-point
    EXACT (floor-half-up 2^20 quantization -> integer partial matmuls
    per Arrow batch -> one tiny groupBy sum).  The oracle recomputes
    the identical integer arithmetic by exploding components in SQL —
    bit-for-bit equality regardless of accumulation order, something a
    float formulation cannot promise."""
    from gdal_spark.operators.similarity import embedding_gram

    return embedding_gram(_emb(spark, sf_dir), dim=64).orderBy("i", "j")


ORACLES["embedding_gram"] = """
with q as (
  select vec_id, cast(i as int) as i,
         cast(floor(cast(embedding[i + 1] as double) * 1048576.0 + 0.5)
              as bigint) as qv
  from embeddings cross join (select unnest(range(64)) as i)
),
p as (
  select a.i as i, b.i as j, a.qv * b.qv as prod
  from q a join q b using (vec_id)
  where a.i <= b.i
)
select i, j, cast(sum(prod) as bigint) as gram_q,
       round(cast(sum(prod) as double) /
             ((select count(*) from embeddings) * 1099511627776.0),
             6) as moment
from p group by i, j order by i, j
"""
QUERIES["embedding_gram"] = _embedding_gram
