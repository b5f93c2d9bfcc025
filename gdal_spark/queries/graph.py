"""Graph operator queries — GNM parity (gnm/gnmgraph.h
ConnectedComponents:211, DijkstraShortestPath:173) with DuckDB
recursive-CTE oracles, upgrading the graph family from pytest-only to
oracle-backed evidence.

Fixtures derive deterministically from `orders`: chains of consecutive
URGENT order keys (connected components), and a weighted DAG over
order keys (shortest paths — recursion terminates because edges only
go to higher keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import tables

_CC_EDGES = """
    select o_orderkey as la, o_orderkey + 1 as lb
    from orders
    where o_orderpriority = '1-URGENT' and o_orderkey < 5000
"""

_SP_EDGES = """
    select o_orderkey as src,
           o_orderkey + (o_orderkey % 97) + 13 as dst,
           cast((o_orderkey % 5) + 1 as double) as w
    from orders where o_orderkey < 600
"""

_SP_SOURCE = 1


def _components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.polygonize import connected_components

    tables.register_views(spark, sf_dir)
    e = spark.sql(_CC_EDGES)
    return connected_components(e).select("label", "root").orderBy("label")


def _components_oracle() -> str:
    return f"""
    with recursive e0 as ({_CC_EDGES}),
    e as (select la, lb from e0 union select lb, la from e0),
    reach(node, r) as (
        select la, la from e
        union
        select e.lb, reach.r from reach join e on e.la = reach.node
    )
    select node as label, min(r) as root
    from reach group by node order by label
    """


def _shortest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.graph import shortest_paths

    tables.register_views(spark, sf_dir)
    e = spark.sql(_SP_EDGES)
    return (
        shortest_paths(e, _SP_SOURCE)
        .select("node", F.round("dist", 6).alias("dist"))
        .orderBy("node")
    )


def _shortest_oracle() -> str:
    return f"""
    with recursive e as ({_SP_EDGES}),
    walk(node, d) as (
        select cast({_SP_SOURCE} as bigint), cast(0.0 as double)
        union
        select e.dst, walk.d + e.w from walk join e on e.src = walk.node
    )
    select node, round(min(d), 6) as dist
    from walk group by node order by node
    """


QUERIES = {
    "graph_components": _components,
    "graph_shortest_paths": _shortest,
}

ORACLES = {
    "graph_components": _components_oracle(),
    "graph_shortest_paths": _shortest_oracle(),
}
