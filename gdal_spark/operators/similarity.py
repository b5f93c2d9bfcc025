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


def hard_negatives(
    corpus: DataFrame,
    anchors: list[tuple[int, np.ndarray, int]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, rnk, vec_id, sim) — contrastive hard-negative mining:
    for each anchor vector, the k most-cosine-similar corpus vectors
    whose label DIFFERS from the anchor's (same-label candidates — which
    includes the anchor itself — are masked out, so every returned row
    is a usable training negative).

    `anchors` is a small driver-side list [(id, vector, label)],
    broadcast as a dense float64 matrix. Same scale shape as
    `cosine_topk`: one vectorized numpy pass per partition
    (mapInPandas), partition-local top-k prune, global window re-rank
    over the tiny (n_anchors × k × n_partitions) survivor set — the
    corpus itself never shuffles.
    """
    spark = corpus.sparkSession
    qids = np.array([a[0] for a in anchors], dtype=np.int64)
    qlabels = np.array([a[2] for a in anchors], dtype=np.int64)
    qmat = np.stack([np.asarray(a[1], dtype=np.float64) for a in anchors])
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qlabels, qnorm))

    schema = "query_id long, vec_id long, sim double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qlab, qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            labs = pdf[label_col].to_numpy(dtype=np.int64)
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mat.T  # (nq, batch)
            sims = np.where(qlab[:, None] == labs[None, :], -np.inf, sims)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids_, kk),
                    "vec_id": ids[top.ravel()],
                    "sim": np.take_along_axis(sims, top, axis=1).ravel(),
                }
            )
            yield out[np.isfinite(out["sim"])]

    cand = corpus.select(id_col, label_col, vec_col).mapInPandas(fn, schema)
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
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """All-pairs ANN: vectors sharing an LSH bucket are candidates; exact
    cosine re-rank within bucket. Shuffles once on `sig`.

    Hot-bucket stop guard (default on): within-bucket pairing is
    O(|bucket|²), and on a real crawl the near-identical embedding
    cluster IS the workload — AQE splits partitions, not the pair
    blow-up. Buckets larger than `max_bucket` are dropped before the
    self-join (same stop-bucket semantics as
    operators.dedup.candidate_pairs); vectors in a dropped bucket
    simply return no neighbors from THIS index — the documented recall
    trade. Fixture-scale corpora never hit the default cap."""
    sigs = hyperplane_signature(corpus, bits, dim, seed, id_col, vec_col)
    if max_bucket is not None:
        # window count over exactly the self-join key — one scan of the
        # (map-side) signature stage and one exchange that both sides
        # of the self-join reuse, instead of an aggregate + join back
        # (same shape as operators.dedup.candidate_pairs)
        wb = Window.partitionBy("sig")
        sigs = (
            sigs.withColumn("_bn", F.count("*").over(wb))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
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


def ivf_default_k(n: int) -> int:
    """IVF scale contract: number of coarse cells ≈ √N (the standard IVF
    sizing — candidate set per probe ≈ nprobe·√N, balancing cell-scan
    cost against probe fan-out). A fixture-sized constant k makes the
    cid shuffle key cardinality-8 at any corpus size, which is inherently
    skewed; √N keeps per-cell row counts O(√N) as the corpus grows."""
    return max(2, int(round(n**0.5)))


def ivf_train(
    emb: DataFrame,
    k: int | None = None,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """IVF coarse quantizer: Lloyd's k-means, deterministic — init =
    the k lowest-id vectors, every iteration rounds centroids to 6 dp so
    the trained codebook is reproducible bit-for-bit across partition
    orders (and mirrorable in SQL). Data never leaves the cluster: only
    the k×dim codebook (bounded metadata) visits the driver.

    k=None derives k ≈ √N from the corpus size (ivf_default_k)."""
    import numpy as np

    if k is None:
        # bounded-metadata: single count
        k = ivf_default_k(emb.count())  # bounded-metadata
    # bounded-metadata: k seed vectors
    seed = (
        emb.orderBy(id_col).limit(k).select(vec_col).collect()  # bounded-metadata
    )
    cents = np.array([list(r[0]) for r in seed], dtype=np.float64)
    spark = emb.sparkSession
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents.tolist())

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = np.asarray(bc.value, dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                d2 = np.round(d2, 8)  # kill last-ulp order sensitivity
                cid = np.argmin(d2, axis=1)  # ties → lowest cid
                out = pd.DataFrame({"cid": cid.astype(np.int64)})
                out["vec"] = list(pdf[vec_col])
                yield out

        assigned = emb.select(vec_col).mapInPandas(
            assign, f"cid long, vec array<double>"
        )
        # Centroid update honoring the module's own k≈√N contract
        # (VERDICT r3 #2): the per-dimension sums are computed exactly as
        # before — posexplode → map-side-combined groupBy(cid, pos) — but
        # they are re-assembled into ONE array row per cid on the
        # EXECUTORS (collect_list of dim structs under a cid-keyed agg),
        # so the driver collect is k rows, not k·dim. At k≈√N, N=10⁹,
        # dim=64 that is ~32k rows instead of ~2M per iteration.
        sums = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(
                F.sum("v").alias("s"),
                F.count("*").alias("n"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"],
                ).alias("sums"),
                F.first("n").alias("n"),  # identical across pos for a cid
            )
            .collect()  # bounded-metadata: k array rows (VERDICT r3 #2)
        )
        new = cents.copy()
        for r in sums:
            cid = int(r.cid)
            for pos, sv in enumerate(r.sums):
                new[cid, pos] = round(float(sv) / int(r.n), 6)
        cents = new
    return cents.tolist()


def ivf_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    query_ids: list[int],
    nprobe: int = 2,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_n: int = 8,
) -> DataFrame:
    """IVF ANN search: vectors carry their coarse cell id (one broadcast
    codebook pass); each query probes its `nprobe` nearest cells and
    ranks only those buckets by exact cosine — the candidate set shrinks
    by ~k/nprobe versus brute force while the shuffle stays keyed by the
    cell id. Rank ties break by (round(cos,6) desc, vec_id).

    Scale contract: the probe join is SALTED — corpus rows carry a
    deterministic `_salt` in [0, salt_n) (operators.skew.with_salt) and
    the tiny probe side fans out across all salts, so a hot cell spreads
    over salt_n reducers instead of melting one (the cid key alone has
    cardinality k and is inherently skewed). Train with k≈√N
    (ivf_default_k) so per-cell candidate sets stay O(√N)."""
    import numpy as np

    spark = emb.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast(C.tolist())

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CC = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            d2 = np.round(
                ((X[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2), 8
            )
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cid": np.argmin(d2, axis=1).astype(np.int64),
                }
            )
            out["vec"] = list(pdf[vec_col])
            yield out

    cells = emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cid long, vec array<double>"
    )
    # query side: (qid, probed cid) pairs — queries are a small id list,
    # their vectors come from the same table (no duplicate source)
    qvec = cells.where(F.col(id_col).isin([int(q) for q in query_ids]))

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CC = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # one matmul-shaped pass for the whole batch (no itertuples):
            # stable argsort on rounded d2 == (d2, cid) lexicographic order
            X = np.array([list(v) for v in pdf["vec"]], dtype=np.float64)
            d2 = np.round(((X[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2), 8)
            npb = min(nprobe, CC.shape[0])
            order = np.argsort(d2, axis=1, kind="stable")[:, :npb]
            out = pd.DataFrame(
                {
                    "qid": np.repeat(pdf[id_col].to_numpy(np.int64), npb),
                    "cid": order.ravel().astype(np.int64),
                }
            )
            out["qvec"] = [v for v in pdf["vec"] for _ in range(npb)]
            yield out

    qp = qvec.mapInPandas(probes, "qid long, cid long, qvec array<double>")
    # salted probe join: corpus side carries _salt, the (tiny) probe side
    # fans out across every salt value — key (cid, _salt) spreads a hot
    # cell over salt_n reducers (operators/skew.py machinery)
    from gdal_spark.operators.skew import with_salt

    cells_s = with_salt(cells, id_col, salt_n)
    salts = spark.range(salt_n).select(F.col("id").alias("_salt"))
    qp_s = qp.crossJoin(F.broadcast(salts))
    cand = qp_s.join(cells_s, ["cid", "_salt"]).where(
        F.col("qid") != F.col(id_col)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.array([list(v) for v in pdf["qvec"]], dtype=np.float64)
            X = np.array([list(v) for v in pdf["vec"]], dtype=np.float64)
            cos = (Q * X).sum(axis=1) / (
                np.linalg.norm(Q, axis=1) * np.linalg.norm(X, axis=1)
            )
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "vec_id": pdf[id_col].to_numpy(),
                    "cos": np.round(cos, 6),
                }
            )

    scored = cand.mapInPandas(score, "qid long, vec_id long, cos double")
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.dropDuplicates(["qid", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )


def semdedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup —
    k-means cluster the embedding space (train `centroids` with the
    shared deterministic ivf_train), compute pairwise cosine ONLY
    within each cluster, and mark every vector whose cosine to a
    LOWER-id cluster-mate reaches `threshold` as a drop (the paper
    keeps one representative per ε-ball; lowest-id is the deterministic
    pick). Returns (vec_id, cid, max_cos_lower, keep) — total over the
    corpus; max_cos_lower is NULL for a vector with no lower-id mate.

    Scale: the clustering IS the candidate filter — with k≈√N cells
    (ivf_default_k) the within-cell pairwise self-join costs
    O(Σ|cell|²) ≈ O(N^1.5) pair rows worst-case instead of O(N²), and
    the paper's observation is that semantic dups concentrate in
    cells. The assignment pass is map-side (broadcast codebook); the
    self-join exchanges the corpus ONCE on cid and both sides plus the
    `max_cell` hot-cell cap window share that exchange (the
    candidate_pairs discipline — a degenerate cell is dropped whole,
    its members default keep=true, audit via the cap like
    dropped_buckets). Pair cosine is computed on the PAIR ROW with
    sequential array folds (zip_with + aggregate — deterministic
    accumulation order, no explode of pairs × dim)."""
    import numpy as np

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64).tolist()
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CC = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            d2 = np.round(
                ((X[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2), 8
            )
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cid": np.argmin(d2, axis=1).astype(np.int64),
                }
            )
            out["vec"] = list(pdf[vec_col])
            yield out

    cells = emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cid long, vec array<double>"
    )
    if max_cell is not None:
        w = Window.partitionBy("cid")
        cells = (
            cells.withColumn("_cn", F.count("*").over(w))
            .where(F.col("_cn") <= max_cell)
            .drop("_cn")
        )
    # Three plan references follow (both self-join sides + the final
    # keep join) — persist so the assignment scan runs once; the cached
    # rows keep the cap window's hashpartitioning(cid), so neither
    # self-join side re-exchanges. Production materializes assignments
    # as a table between the two phases (the paper's protocol), which
    # replaces this cache.
    cells = cells.persist()
    a = cells.select(
        F.col(id_col).alias("_lo"), F.col("cid"), F.col("vec").alias("_va")
    )
    b = cells.select(
        F.col(id_col).alias("_hi"), F.col("cid"), F.col("vec").alias("_vb")
    )
    dot = (
        "aggregate(zip_with(_va, _vb, (x, y) -> x * y), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )
    na = (
        "sqrt(aggregate(transform(_va, x -> x * x), "
        "cast(0 as double), (acc, x) -> acc + x))"
    )
    nb = (
        "sqrt(aggregate(transform(_vb, x -> x * x), "
        "cast(0 as double), (acc, x) -> acc + x))"
    )
    mx = (
        a.join(b, "cid")
        .where(F.col("_lo") < F.col("_hi"))
        .selectExpr("_hi", f"{dot} / ({na} * {nb}) as _cos")
        .groupBy("_hi")
        .agg(F.round(F.max("_cos"), 6).alias("max_cos_lower"))
    )
    out = cells.join(
        mx.withColumnRenamed("_hi", id_col), id_col, "left"
    )
    return out.select(
        id_col,
        "cid",
        "max_cos_lower",
        F.coalesce(
            F.col("max_cos_lower") < F.lit(threshold), F.lit(True)
        ).alias("keep"),
    )


def prototype_prune(
    emb: DataFrame,
    centroids: list[list[float]],
    prune_frac: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022,
    arXiv:2206.14486 "Beyond neural scaling laws"): k-means cluster the
    embedding space (train `centroids` with the shared deterministic
    ivf_train), score every example by its cosine to its cluster
    prototype (the centroid), and prune the EASIEST `prune_frac` of
    each cluster — the most prototypical examples, i.e. highest
    cosine.  Per-cluster pruning preserves the corpus's cluster
    balance (the paper's protocol).  Returns
    (vec_id, cid, proto_cos, rnk, keep): rnk ranks within the cluster
    by descending ROUNDED cosine (ties → lowest id), and
    keep = rnk > floor(prune_frac * |cluster|).

    Scale: strictly cheaper than semdedup — no pairwise phase at all.
    Assignment is map-side (broadcast codebook, one Arrow pass); the
    prototype cosine is a broadcast k-row join + sequential array
    folds (zip_with + aggregate, JVM codegen); the per-cluster rank is
    the single exchange, on cid.  O(N·d) work, one shuffle, so the
    100 TB path is exactly this plan with the codebook trained on a
    sample.  Rank on the round-6 cosine with an explicit id tie-break
    keeps the keep set reproducible across engines and retries."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64).tolist()
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CC = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            d2 = np.round(
                ((X[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2), 8
            )
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cid": np.argmin(d2, axis=1).astype(np.int64),
                }
            )
            out["vec"] = list(pdf[vec_col])
            yield out

    cells = emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cid long, vec array<double>"
    )
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cid long, cvec array<double>",
    )
    dot = (
        "aggregate(zip_with(vec, cvec, (x, y) -> x * y), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )
    nx = (
        "sqrt(aggregate(transform(vec, x -> x * x), "
        "cast(0 as double), (acc, x) -> acc + x))"
    )
    nc = (
        "sqrt(aggregate(transform(cvec, x -> x * x), "
        "cast(0 as double), (acc, x) -> acc + x))"
    )
    scored = cells.join(F.broadcast(cents), "cid").selectExpr(
        id_col, "cid", f"round({dot} / ({nx} * {nc}), 6) as proto_cos"
    )
    w = Window.partitionBy("cid").orderBy(
        F.desc("proto_cos"), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("cid")))
        .select(
            id_col,
            "cid",
            "proto_cos",
            "rnk",
            (
                F.col("rnk")
                > F.floor(F.lit(float(prune_frac)) * F.col("_n"))
            ).alias("keep"),
        )
    )


def pq_train(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split dim into `m` subspaces and
    run one deterministic Lloyd's k-means PER SUBSPACE — all m trained in
    the SAME distributed pass (assignment rows carry a `sub` key, so one
    shuffle per iteration covers every subspace). Determinism contract
    matches ivf_train: init = the ksub lowest-id vectors' subvectors,
    distances rounded to 8 dp before argmin (ties -> lowest code),
    centroid updates rounded to 6 dp — bit-for-bit reproducible across
    partition orders and mirrorable in SQL.

    Returns codebooks[m][ksub][dsub]. Only the m*ksub codeword rows
    (bounded metadata) ever visit the driver; at 100 TB the corpus is
    touched `iters` map-side passes plus one (sub, code, pos) aggregate
    each — no all-pairs anything. PQ is the standard billion-vector
    compression: 64 float32 dims become m one-byte codes (16x-64x), and
    search scans codes with a tiny per-query lookup table (pq_topk).
    """
    import numpy as np

    # bounded-metadata: ksub seed vectors
    seed = (
        emb.orderBy(id_col).limit(ksub).select(vec_col).collect()  # bounded-metadata
    )
    X0 = np.array([list(r[0]) for r in seed], dtype=np.float64)
    dim = X0.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # books[s] : (ksub, dsub), init = subvectors of the seed rows
    books = [X0[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
    spark = emb.sparkSession
    for _ in range(iters):
        bc = spark.sparkContext.broadcast([b.tolist() for b in books])

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            B = [np.asarray(b, dtype=np.float64) for b in bc.value]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                outs = []
                for s, Bs in enumerate(B):
                    Xs = X[:, s * dsub : (s + 1) * dsub]
                    d2 = np.round(
                        ((Xs[:, None, :] - Bs[None, :, :]) ** 2).sum(axis=2), 8
                    )
                    code = np.argmin(d2, axis=1)  # ties -> lowest code
                    o = pd.DataFrame(
                        {
                            "sub": np.full(len(Xs), s, dtype=np.int64),
                            "code": code.astype(np.int64),
                        }
                    )
                    o["vec"] = list(Xs)
                    outs.append(o)
                yield pd.concat(outs, ignore_index=True)

        assigned = emb.select(vec_col).mapInPandas(
            assign, "sub long, code long, vec array<double>"
        )
        # per-(sub, code) mean, re-assembled executor-side to ONE array row
        # per codeword so the driver collect is m*ksub rows (same
        # bounded-collect shape as ivf_train's r3 #2 fix)
        sums = (
            assigned.select("sub", "code", F.posexplode("vec").alias("pos", "v"))
            .groupBy("sub", "code", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"],
                ).alias("sums"),
                F.first("n").alias("n"),
            )
            .collect()  # bounded-metadata: m*ksub array rows
        )
        new = [b.copy() for b in books]
        for r in sums:
            for pos, sv in enumerate(r.sums):
                new[int(r.sub)][int(r.code), pos] = round(
                    float(sv) / int(r.n), 6
                )
        books = new
    return [b.tolist() for b in books]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<long>) — each vector compressed to m codebook
    indices (nearest codeword per subspace, round-8 distances, ties ->
    lowest code). Pure map-side: broadcast codebooks, one Arrow pass,
    zero shuffle — the 100 TB encode is embarrassingly parallel."""
    import numpy as np

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = [np.asarray(b, dtype=np.float64) for b in bc.value]
        dsub = B[0].shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            codes = np.empty((len(X), len(B)), dtype=np.int64)
            for s, Bs in enumerate(B):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d2 = np.round(
                    ((Xs[:, None, :] - Bs[None, :, :]) ** 2).sum(axis=2), 8
                )
                codes[:, s] = np.argmin(d2, axis=1)
            out = pd.DataFrame({id_col: pdf[id_col].to_numpy(np.int64)})
            out["codes"] = list(codes)
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} long, codes array<long>"
    )


def pq_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate nearest neighbors (faiss-IndexPQ shape):
    queries stay exact, the corpus is scanned as codes, and the
    asymmetric distance adc(q, x) = sum_s LUT_q[s][code_s(x)] where
    LUT_q[s][c] = ||q_s - codeword_sc||^2 is a tiny per-query
    table built ONCE and broadcast. One corpus scan, partition-local
    top-k prune, then a global window re-rank over the (nq x k x
    n_partitions) survivors — the only shuffle is that candidate set,
    identical to cosine_topk's scale shape. Rank = (round(adc, 6) asc,
    vec_id asc); output adc is the rounded-6 value so ranking and values
    are SQL-mirrorable exactly."""
    import numpy as np

    spark = emb.sparkSession
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = B[0].shape[1]
    qrows = (
        emb.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, vec_col)
        .collect()  # bounded-metadata: len(query_ids) rows
    )
    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    # LUT[qi, s, c] = ||q_s - codeword_sc||^2 — UNROUNDED: the round-8
    # lattice is only for argmin tie stability; summing lattice values
    # puts round(adc, 6) on an exact .5 boundary ~1% of the time, where
    # numpy (half-even) and SQL (half-away) disagree. Off-lattice sums
    # hit the boundary with measure zero (same contract as IVF's cos).
    lut = np.stack(
        [
            (
                (Q[:, s * dsub : (s + 1) * dsub][:, None, :] - Bs[None, :, :])
                ** 2
            ).sum(axis=2)
            for s, Bs in enumerate(B)
        ],
        axis=1,
    )
    bc = spark.sparkContext.broadcast((qids, lut, [b.tolist() for b in B]))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, lut_, books = bc.value
        BB = [np.asarray(b, dtype=np.float64) for b in books]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            ids = pdf[id_col].to_numpy(np.int64)
            codes = np.empty((len(X), len(BB)), dtype=np.int64)
            for s, Bs in enumerate(BB):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d2 = np.round(
                    ((Xs[:, None, :] - Bs[None, :, :]) ** 2).sum(axis=2), 8
                )
                codes[:, s] = np.argmin(d2, axis=1)
            # adc[qi, row] = sum_s lut[qi, s, codes[row, s]]
            adc = np.zeros((len(qids_), len(X)), dtype=np.float64)
            for s in range(len(BB)):
                adc += lut_[:, s, :][:, codes[:, s]]
            mask = qids_[:, None] == ids[None, :]
            adc = np.where(mask, np.inf, adc)
            # prune key = ROUNDED adc (half-away, matching SQL/F.round)
            # + vec_id, the same lexicographic order the global window
            # ranks on — partition-local survivors are exactly the rows
            # the final rank would keep from this partition
            adc6 = np.where(
                np.isfinite(adc), np.floor(adc * 1e6 + 0.5) / 1e6, np.inf
            )
            kk = min(topk, adc.shape[1])
            outs = []
            for qi, qid in enumerate(qids_):
                order = np.lexsort((ids, adc6[qi]))[:kk]
                keep = order[np.isfinite(adc[qi][order])]
                outs.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(keep), qid, dtype=np.int64),
                            "vec_id": ids[keep],
                            "adc": adc[qi][keep],
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    cand = emb.select(id_col, vec_col).mapInPandas(
        scan, "qid long, vec_id long, adc double"
    )
    # rank on the ROUNDED value (JVM-side HALF_UP round, identical to
    # SQL round) with the vec_id tie-break, so rank and value are both
    # exactly SQL-mirrorable
    cand = cand.withColumn("adc", F.round("adc", 6))
    w = Window.partitionBy("qid").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("qid", "vec_id", "adc", "rank")
    )


def ivfpq_train(
    emb: DataFrame,
    k_coarse: int = 8,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """IVFPQ training (Jégou et al. 2011, the faiss IVFPQ layout):
    coarse k-means quantizer (ivf_train's determinism contract), then
    product-quantization codebooks trained on the RESIDUALS
    x - coarse_centroid(x) (pq_train's contract, init = the ksub
    lowest-id vectors' residual subvectors). Returns
    (coarse_centroids, codebooks). Driver traffic is k_coarse + m·ksub
    codeword rows; the corpus is touched one extra map pass (residual
    computation) beyond the two trainers."""
    import numpy as np

    coarse = ivf_train(emb, k=k_coarse, iters=iters,
                       id_col=id_col, vec_col=vec_col)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(coarse)

    def resid(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            d2 = np.round(
                ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 8
            )
            cid = np.argmin(d2, axis=1)
            out = pd.DataFrame({id_col: pdf[id_col].to_numpy(np.int64)})
            out[vec_col] = list(X - C[cid])
            yield out

    res = emb.select(id_col, vec_col).mapInPandas(
        resid, f"{id_col} long, {vec_col} array<double>"
    )
    books = pq_train(res, m=m, ksub=ksub, iters=iters,
                     id_col=id_col, vec_col=vec_col)
    return coarse, books


def ivfpq_topk(
    emb: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    nprobe: int = 2,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_n: int = 8,
) -> DataFrame:
    """IVFPQ/ADC search — the production billion-vector index: vectors
    carry (coarse cell, m residual codes) from ONE broadcast map pass;
    each query probes its nprobe nearest cells and scans ONLY those
    buckets' codes against a per-(query, probed-cell) residual lookup
    table (LUT[q][cell][s][c] = ||(q - c_cell)_s - codeword_sc||^2,
    UNROUNDED — the PQ off-lattice contract), so the exact-vector data
    never re-joins. The probe join is salted on (cid, _salt) exactly
    like ivf_topk (hot-cell skew guard); ranking is on round(adc, 6)
    with the vec_id tie-break, SQL-mirrorable on both sides."""
    import numpy as np

    spark = emb.sparkSession
    C = np.asarray(coarse, dtype=np.float64)
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = B[0].shape[1]
    bcc = spark.sparkContext.broadcast(
        (C.tolist(), [b.tolist() for b in B])
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CC, BB = bcc.value
        CC = np.asarray(CC, dtype=np.float64)
        BB = [np.asarray(b, dtype=np.float64) for b in BB]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            d2 = np.round(
                ((X[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2), 8
            )
            cid = np.argmin(d2, axis=1)
            R = X - CC[cid]
            codes = np.empty((len(X), len(BB)), dtype=np.int64)
            for s, Bs in enumerate(BB):
                Rs = R[:, s * dsub : (s + 1) * dsub]
                rd2 = np.round(
                    ((Rs[:, None, :] - Bs[None, :, :]) ** 2).sum(axis=2), 8
                )
                codes[:, s] = np.argmin(rd2, axis=1)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(np.int64),
                    "cid": cid.astype(np.int64),
                }
            )
            out["codes"] = list(codes)
            yield out

    cells = emb.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cid long, codes array<long>"
    )
    # query side (bounded): exact vectors, probe cells, residual LUTs
    qrows = (
        emb.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, vec_col)
        .collect()  # bounded-metadata: len(query_ids) rows
    )
    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qd2 = np.round(((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 8)
    npb = min(nprobe, C.shape[0])
    probe = np.argsort(qd2, axis=1, kind="stable")[:, :npb]
    # LUT rows: (qid, cid) -> m x ksub table, built driver-side
    # (nq x nprobe x m x ksub doubles — tiny), broadcast
    lut: dict[tuple[int, int], np.ndarray] = {}
    probe_rows = []
    for qi in range(len(qids)):
        for c in probe[qi]:
            qres = Q[qi] - C[int(c)]
            t = np.stack(
                [
                    (
                        (qres[s * dsub : (s + 1) * dsub][None, :] - Bs) ** 2
                    ).sum(axis=1)
                    for s, Bs in enumerate(B)
                ]
            )
            lut[(int(qids[qi]), int(c))] = t
            probe_rows.append((int(qids[qi]), int(c)))
    bcl = spark.sparkContext.broadcast(
        {k: v.tolist() for k, v in lut.items()}
    )
    qp = spark.createDataFrame(probe_rows, "qid long, cid long")
    from gdal_spark.operators.skew import with_salt

    cells_s = with_salt(cells, id_col, salt_n)
    salts = spark.range(salt_n).select(F.col("id").alias("_salt"))
    qp_s = qp.crossJoin(F.broadcast(salts))
    cand = F.broadcast(qp_s).join(cells_s, ["cid", "_salt"]).where(
        F.col("qid") != F.col(id_col)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        L = {k: np.asarray(v, dtype=np.float64)
             for k, v in bcl.value.items()}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            adc = np.empty(len(pdf), dtype=np.float64)
            qv = pdf["qid"].to_numpy(np.int64)
            cv = pdf["cid"].to_numpy(np.int64)
            codes = np.stack([np.asarray(c) for c in pdf["codes"]])
            for i in range(len(pdf)):
                t = L[(int(qv[i]), int(cv[i]))]
                adc[i] = sum(
                    t[s, int(codes[i, s])] for s in range(t.shape[0])
                )
            yield pd.DataFrame(
                {
                    "qid": qv,
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "adc": adc,
                }
            )

    scored = cand.select("qid", "cid", id_col, "codes").mapInPandas(
        score, "qid long, vec_id long, adc double"
    )
    scored = scored.dropDuplicates(["qid", "vec_id"]).withColumn(
        "adc", F.round("adc", 6)
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("qid", "vec_id", "adc", "rank")
    )


def embedding_gram(
    corpus: DataFrame,
    dim: int = 64,
    scale_bits: int = 20,
    vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """(i, j, gram_q, moment) upper triangle of the d×d second-moment
    (Gram) matrix of the embedding column — the scale primitive behind
    PCA / whitening / covariance-conditioned pruning over a 100 TB
    embedding table.

    Exactness: each component is quantized q = floor(v · 2^scale_bits
    + ½) — floor-half-up spelled out, NOT round(), because numpy rint
    ties-to-even while SQL round() ties away from zero; v · 2^b is a
    power-of-two scale and the +½ stays inside 53 bits, so both
    engines floor the IDENTICAL double. The Gram is then
    INTEGER arithmetic — int64 partial matrices, exact sums, identical
    bit-for-bit in DuckDB regardless of accumulation order. `moment`
    de-scales to float: gram_q / (n · 2^2b), two correctly-rounded
    double ops. Magnitude guard: |q| ≤ 2^b·|v|max, so n·(q_iq_j)max
    must stay < 2^63 — 500M rows of unit-normed 2^20-scaled vectors is
    within budget; larger corpora lower scale_bits.

    Scale shape: ONE Arrow pass (mapInPandas accumulates the
    partition's d×d int64 partial via one integer matmul per batch —
    O(d²) state, d(d+1)/2 rows out per partition), then ONE
    map-side-combined groupBy sum over P · d(d+1)/2 tiny rows. The
    corpus itself is never shuffled — same discipline as distinct_kmv."""
    if n is None:
        # bounded-metadata: one scalar action, map-side agg (callers
        # that already know |corpus| pass n= to skip the scan)
        n = corpus.count()
    scale = float(1 << scale_bits)
    iu, ju = np.triu_indices(dim)

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(m * scale + 0.5).astype(np.int64)
            g += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu, "j": ju, "partial": g[iu, ju]}
            )

    partials = corpus.select(vec_col).mapInPandas(
        part, "i int, j int, partial long"
    )
    denom = float(n) * scale * scale
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("partial").alias("gram_q"))
        .select(
            "i",
            "j",
            "gram_q",
            F.round(F.col("gram_q").cast("double") / F.lit(denom), 6).alias(
                "moment"
            ),
        )
    )


def pca_topk(
    corpus: DataFrame,
    dim: int = 64,
    k: int = 4,
    scale_bits: int = 20,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(eigenvalues[k], components[k, dim]) — top-k principal axes of
    the UNCENTERED second moment, from the distributed exact Gram.

    The eigendecomposition runs driver-side on the d×d matrix
    (bounded-metadata: d(d+1)/2 rows collected — O(dim²), corpus-size
    independent), which is how distributed PCA is actually shaped:
    the data-sized work (the Gram) is the cluster's, the O(d³) tail is
    free. Sign convention: each component's largest-|coord| entry is
    made positive, so results are comparable across runs/engines."""
    # bounded-metadata: d(d+1)/2 Gram rows, corpus-size independent
    n = corpus.count()  # bounded-metadata: counted ONCE, shared with
    # embedding_gram's denominator via n= (no second corpus scan)
    rows = embedding_gram(
        corpus, dim, scale_bits, vec_col, n=n
    ).collect()  # bounded-metadata: d(d+1)/2 rows
    g = np.zeros((dim, dim))
    for r in rows:
        g[r.i, r.j] = g[r.j, r.i] = r.gram_q
    g /= float(1 << scale_bits) ** 2 * max(1, n)
    w, v = np.linalg.eigh(g)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return w[order], comps
