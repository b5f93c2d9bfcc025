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
