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


def k_shortest_paths(
    edges: DataFrame,
    source: int,
    target: int,
    k: int,
    max_iters: int = 30,
) -> list[tuple[float, list[int]]]:
    """Yen's K-shortest loopless paths (GNMGraph::KShortestPaths,
    gnm/gnmgraph.cpp:247-381): the best path from the distributed SSSP,
    then for every spur node of every accepted path, re-run SSSP on the
    graph minus (a) the following edge of every accepted path sharing
    the root and (b) the root's interior nodes, keeping the K cheapest
    candidates.  Returns [(cost, [nodes])] sorted by (cost, path) —
    equal-cost paths ordered lexicographically, matching the
    reference's cost-keyed multimap.

    Driver state is the candidate paths plus their per-node cumulative
    costs — O(K · path length), bounded.  Each spur SSSP is fully
    distributed; Yen's inherent O(K · |path|) SSSP invocations are the
    same loop the reference runs single-node."""
    if k <= 0:
        return []

    def sssp(filtered: DataFrame, src: int, need: "set[int]"):
        """dist+path per node, restricted to the rows we consume (the
        target and candidate-path nodes) — a bounded collect."""
        out = shortest_path_with_route(filtered, src, max_iters)
        rows = out.where(
            F.col("node").isin([int(n) for n in need])
        ).collect()  # bounded-metadata: |need| <= path-length rows
        return {r["node"]: (float(r["dist"]), list(r["path"])) for r in rows}

    res = sssp(edges, source, {target})
    if target not in res:
        return []
    first_cost, first_path = res[target]
    # re-fetch dists of the path's own nodes → cumulative costs
    res = sssp(edges, source, set(first_path))
    first_cum = [res[n][0] for n in first_path]
    # A entries: (cost, path, cumulative costs per node)
    A: list[tuple[float, list[int], list[float]]] = [
        (first_cost, first_path, first_cum)
    ]
    B: list[tuple[float, list[int], list[float]]] = []

    for _ in range(k - 1):
        _, path_k, cum_k = A[-1]
        for i in range(len(path_k) - 1):
            spur = path_k[i]
            root = path_k[: i + 1]
            root_cost = cum_k[i]
            removed_edges = set()
            for _, p, _c in A:
                if len(p) > i + 1 and p[: i + 1] == root:
                    removed_edges.add((p[i], p[i + 1]))
            root_interior = set(root[:-1])
            cond = ~F.concat_ws("|", F.col("src"), F.col("dst")).isin(
                [f"{a}|{b}" for a, b in removed_edges]
            )
            if root_interior:
                ri = [int(n) for n in root_interior]
                cond = cond & ~F.col("src").isin(ri) & ~F.col("dst").isin(ri)
            filtered = edges.where(cond)
            r1 = sssp(filtered, spur, {target})
            if target not in r1:
                continue
            spur_cost, spur_path = r1[target]
            r2 = sssp(filtered, spur, set(spur_path))
            cand_path = root[:-1] + spur_path
            cand_cum = cum_k[:i] + [
                root_cost + r2[n][0] for n in spur_path
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
