"""Graph operators — GNM parity notes (SURVEY §1.3: gnm/gnmgraph.h
DijkstraShortestPath :173, ConnectedComponents :211).

Connected components lives in raster.polygonize.connected_components
(shared machinery). Here: single-source shortest paths as iterative
edge relaxation (distributed Bellman-Ford) — the DataFrame-join
re-expression of Dijkstra for a sparse edge table. Each round is one
join + groupBy-min; rounds ≤ graph diameter; AQE coalesces the tiny
frontier shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame, source: int, max_iters: int = 30
) -> DataFrame:
    """(node, dist) minimal distances from `source` over directed
    weighted edges (src, dst, w). Unreachable nodes are absent."""
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0.0)], "node long, dist double")
    for _ in range(max_iters):
        relaxed = (
            dist.alias("d")
            .join(edges.alias("e"), F.col("d.node") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("node"),
                (F.col("d.dist") + F.col("e.w")).alias("dist"),
            )
        )
        new = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # fixpoint: no node improved
        # localCheckpoint truncates the per-round lineage — without it
        # the plan tree doubles every iteration and the driver dies
        # compiling it long before any data problem appears
        new = new.localCheckpoint(eager=True)
        improved = (
            new.alias("n")
            .join(dist.alias("o"), "node", "left")
            .where(
                F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist"))
            )
            .count()
        )
        dist = new
        if improved == 0:
            break
    return dist


def shortest_path_with_route(
    edges: DataFrame, source: int, max_iters: int = 30
) -> DataFrame:
    """(node, dist, path array<long>) — minimal distances from `source`
    plus the realizing route, ties broken lexicographically on the path
    (deterministic, mirroring the multimap ordering the reference keeps
    for equal-cost paths, gnm/gnmgraph.cpp:259-261).  Same distributed
    Bellman-Ford shape as shortest_paths, the frontier carrying a
    bounded path-array column."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source, 0.0, [source])], "node long, dist double, path array<long>"
    )
    for _ in range(max_iters):
        relaxed = (
            dist.alias("d")
            .join(edges.alias("e"), F.col("d.node") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("node"),
                (F.col("d.dist") + F.col("e.w")).alias("dist"),
                F.concat(
                    F.col("d.path"), F.array(F.col("e.dst"))
                ).alias("path"),
            )
        )
        new = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min(F.struct("dist", "path")).alias("best"))
            .select("node", "best.dist", "best.path")
        )
        new = new.localCheckpoint(eager=True)  # lineage truncation
        improved = (
            new.alias("n")
            .join(dist.alias("o"), "node", "left")
            .where(
                F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist"))
            )
            .count()
        )
        dist = new
        if improved == 0:
            break
    return dist


def multi_source_shortest_paths(
    edges: DataFrame,
    sources: list[tuple[int, int]],
    max_iters: int = 30,
    excluded_edges: list[tuple[int, int, int]] | None = None,
    excluded_nodes: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """(sid, node, dist, path) — Bellman-Ford from MANY sources in ONE
    relaxation loop, each source id carrying its OWN exclusion set
    (sid-scoped removed edges / removed nodes, anti-joined against tiny
    broadcast tables each round).  This is the batched spur solver of
    VERDICT r4 next #7: all spur SSSPs of one Yen iteration share one
    frontier, so the job count per iteration is O(max_iters) instead of
    O(path_length · max_iters).  Ties break on min(struct(dist, path))
    — identical to shortest_path_with_route."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(s), int(n), 0.0, [int(n)]) for s, n in sources],
        "sid int, node long, dist double, path array<long>",
    )
    ee = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in (excluded_edges or [])]
        or [(-1, -1, -1)],
        "xsid int, xsrc long, xdst long",
    )
    en = spark.createDataFrame(
        [(int(a), int(b)) for a, b in (excluded_nodes or [])] or [(-1, -1)],
        "nsid int, xnode long",
    )
    for _ in range(max_iters):
        relaxed = (
            dist.alias("d")
            .join(edges.alias("e"), F.col("d.node") == F.col("e.src"))
            .select(
                F.col("d.sid").alias("sid"),
                F.col("e.src").alias("esrc"),
                F.col("e.dst").alias("node"),
                (F.col("d.dist") + F.col("e.w")).alias("dist"),
                F.concat(F.col("d.path"), F.array(F.col("e.dst"))).alias(
                    "path"
                ),
            )
            .join(
                F.broadcast(ee),
                (F.col("sid") == F.col("xsid"))
                & (F.col("esrc") == F.col("xsrc"))
                & (F.col("node") == F.col("xdst")),
                "left_anti",
            )
            .join(
                F.broadcast(en),
                (F.col("sid") == F.col("nsid"))
                & (
                    (F.col("esrc") == F.col("xnode"))
                    | (F.col("node") == F.col("xnode"))
                ),
                "left_anti",
            )
            .drop("esrc")
        )
        new = (
            dist.unionByName(relaxed)
            .groupBy("sid", "node")
            .agg(F.min(F.struct("dist", "path")).alias("best"))
            .select("sid", "node", "best.dist", "best.path")
        )
        new = new.localCheckpoint(eager=True)  # lineage truncation
        improved = (
            new.alias("n")
            .join(dist.alias("o"), ["sid", "node"], "left")
            .where(
                F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist"))
            )
            .count()
        )
        dist = new
        if improved == 0:
            break
    return dist


def k_shortest_paths(
    edges: DataFrame,
    source: int,
    target: int,
    k: int,
    max_iters: int = 30,
) -> list[tuple[float, list[int]]]:
    """Yen's K-shortest loopless paths (GNMGraph::KShortestPaths,
    gnm/gnmgraph.cpp:247-381): the best path from the distributed SSSP,
    then for every spur node of every accepted path, solve SSSP on the
    graph minus (a) the following edge of every accepted path sharing
    the root and (b) the root's interior nodes, keeping the K cheapest
    candidates.  Returns [(cost, [nodes])] sorted by (cost, path) —
    equal-cost paths ordered lexicographically, matching the
    reference's cost-keyed multimap.

    All spurs of one Yen iteration are BATCHED into one multi-source
    Bellman-Ford (sid column + sid-scoped exclusion anti-joins), so the
    Spark job count is O(K · max_iters), not O(K · L · max_iters)
    (VERDICT r4 next #7).  Driver state is the candidate paths plus
    their per-node cumulative costs — O(K · path length), bounded."""
    if k <= 0:
        return []
    base = multi_source_shortest_paths(
        edges, [(0, source)], max_iters
    )
    rows = base.where(
        F.col("node") == int(target)
    ).collect()  # bounded-metadata: one row (the target)
    if not rows:
        return []
    first_cost = float(rows[0]["dist"])
    first_path = list(rows[0]["path"])
    cum_rows = base.where(
        F.col("node").isin([int(n) for n in first_path])
    ).collect()  # bounded-metadata: path-length rows
    cum_map = {r["node"]: float(r["dist"]) for r in cum_rows}
    first_cum = [cum_map[n] for n in first_path]
    A: list[tuple[float, list[int], list[float]]] = [
        (first_cost, first_path, first_cum)
    ]
    B: list[tuple[float, list[int], list[float]]] = []

    for _ in range(k - 1):
        _, path_k, cum_k = A[-1]
        spurs: list[tuple[int, int]] = []
        spec: dict[int, tuple[int, list[int], float]] = {}
        excl_e: list[tuple[int, int, int]] = []
        excl_n: list[tuple[int, int]] = []
        for i in range(len(path_k) - 1):
            sid = i
            spur = path_k[i]
            root = path_k[: i + 1]
            spurs.append((sid, spur))
            spec[sid] = (i, root, cum_k[i])
            for _, p, _c in A:
                if len(p) > i + 1 and p[: i + 1] == root:
                    excl_e.append((sid, p[i], p[i + 1]))
            for n in set(root[:-1]):
                excl_n.append((sid, n))
        res = multi_source_shortest_paths(
            edges, spurs, max_iters, excl_e, excl_n
        )
        t_rows = res.where(
            F.col("node") == int(target)
        ).collect()  # bounded-metadata: ≤ |spurs| target rows
        by_sid = {r["sid"]: (float(r["dist"]), list(r["path"])) for r in t_rows}
        need = {
            (r["sid"], n) for r in t_rows for n in r["path"]
        }
        d_rows = res.where(
            F.concat_ws(":", F.col("sid"), F.col("node")).isin(
                [f"{int(s)}:{int(n)}" for s, n in need]
            )
            if need
            else F.lit(False)
        ).collect()  # bounded-metadata: Σ spur-path-length rows
        dmap = {(r["sid"], r["node"]): float(r["dist"]) for r in d_rows}
        for sid, (spur_cost, spur_path) in sorted(by_sid.items()):
            i, root, root_cost = spec[sid]
            cand_path = root[:-1] + spur_path
            cand_cum = cum_k[:i] + [
                root_cost + dmap[(sid, n)] for n in spur_path
            ]
            cand = (root_cost + spur_cost, cand_path, cand_cum)
            if all(cand_path != p for _, p, _c in A) and all(
                cand_path != p for _, p, _c in B
            ):
                B.append(cand)
        if not B:
            break
        B.sort(key=lambda cpc: (cpc[0], cpc[1]))
        A.append(B.pop(0))
    return [(c, p) for c, p, _ in A]


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    prec: int = 12,
) -> DataFrame:
    """PageRank (Brin & Page 1998) over a directed link graph
    (src, dst) — the classic link-based page-quality signal of a
    web-corpus curation pipeline (seed ranking / crawl prioritization;
    the reference's GNM family has no analog, SURVEY §1.3).  Parallel
    edges count with multiplicity; dangling-node mass is redistributed
    uniformly each iteration (the standard formulation):

        pr'(v) = (1-d)/N + d * (Σ_{u→v} pr(u)/outdeg(u) + dangling/N)

    Numeric contract: per-edge contributions and the rank vector are
    rounded to `prec` dp and accumulated as DECIMAL, so every sum is
    order-independent and the whole iteration is bit-reproducible in
    any engine that mirrors the same double ops (the DuckDB oracle
    unrolls the identical iterations).

    Scale (100 TB link graph): the edge table is joined to the rank
    vector once per iteration — one hash shuffle on src, one aggregate
    on dst, both map-side combined; N and the dangling mass are 1-row
    aggregates cross-joined broadcast; per-iteration state is the
    O(nodes) rank vector, localCheckpoint'd so the plan stays flat
    across iterations (same discipline as shortest_paths).  No driver
    collect anywhere.
    """
    dec = f"decimal(20,{prec})"
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n1 = nodes.agg(F.count("*").alias("_n"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ej = edges.join(outdeg, "src").persist()
    dangling = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    base = F.lit(1.0 - damping) / F.col("_n")
    pr = (
        nodes.crossJoin(F.broadcast(n1))
        .select(
            "node",
            F.round(F.lit(1.0) / F.col("_n"), prec).cast(dec).alias("pr"),
        )
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(iters):
            contrib = (
                pr.join(ej, pr.node == ej.src)
                .select(
                    "dst",
                    F.round(F.col("pr").cast("double") / F.col("od"), prec)
                    .cast(dec)
                    .alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            dm = (
                pr.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("pr"), F.lit(0)).alias("_m"))
            )
            pr = (
                nodes.join(
                    contrib.withColumnRenamed("dst", "node"), "node", "left"
                )
                .crossJoin(F.broadcast(n1))
                .crossJoin(F.broadcast(dm))
                .select(
                    "node",
                    F.round(
                        base
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("s"), F.lit(0)).cast("double")
                            + F.col("_m").cast("double") / F.col("_n")
                        ),
                        prec,
                    )
                    .cast(dec)
                    .alias("pr"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        nodes.unpersist()
        ej.unpersist()
        dangling.unpersist()
    return pr
