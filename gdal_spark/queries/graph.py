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


# --- PageRank over a deterministic doc link graph (web-scale link
# quality signal; Brin & Page 1998).  Each non-dangling doc links to
# (7*id+1) % N and (13*id+5) % N; docs with id % 10 == 0 emit no links
# (dangling).  N is data-driven (count of documents), so the same SQL
# is exact at every sf.  The oracle unrolls the identical
# decimal-rounded iterations (internal 12 dp, output 6 dp).

_PR_EDGES = """
    select doc_id as src,
           (doc_id * 7 + 1) % (select count(*) from documents) as dst
    from documents where doc_id % 10 != 0
    union all
    select doc_id as src,
           (doc_id * 13 + 5) % (select count(*) from documents) as dst
    from documents where doc_id % 10 != 0
"""

_PR_ITERS = 5


def _pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.graph import pagerank

    tables.register_views(spark, sf_dir)
    e = spark.sql(_PR_EDGES)
    out = pagerank(e, iters=_PR_ITERS)
    return out.select(
        "node", F.round(F.col("pr").cast("double"), 6).alias("pr")
    ).orderBy("node")


def _pagerank_oracle() -> str:
    steps = [
        f"""
    e0 as materialized ({_PR_EDGES}),
    nodes as materialized (
        select distinct node from (
            select src as node from e0
            union all select dst as node from e0)
    ),
    nn as (select cast(count(*) as double) as n from nodes),
    od as materialized (select src, count(*) as od from e0 group by 1),
    dang as (select node from nodes
             where node not in (select src from od)),
    p0 as (
        select node,
               cast(round(1e0 / (select n from nn), 12) as decimal(20,12))
                 as pr
        from nodes)"""
    ]
    for i in range(_PR_ITERS):
        steps.append(f"""
    c{i} as (
        select e0.dst as node,
               sum(cast(round(cast(p.pr as double) / od.od, 12)
                   as decimal(20,12))) as s
        from p{i} p join e0 on e0.src = p.node join od on od.src = e0.src
        group by 1
    ),
    dm{i} as (
        select coalesce(sum(pr), 0) as m from p{i}
        where node in (select node from dang)
    ),
    p{i + 1} as (
        select nodes.node,
               cast(round((1e0 - 0.85e0) / (select n from nn)
                   + 0.85e0 * (cast(coalesce(c.s, 0) as double)
                       + cast((select m from dm{i}) as double)
                         / (select n from nn)), 12)
                 as decimal(20,12)) as pr
        from nodes left join c{i} c using (node)
    )""")
    body = ",".join(steps)
    return f"""
    with {body}
    select node, round(cast(pr as double), 6) as pr
    from p{_PR_ITERS} order by node
    """


QUERIES["link_pagerank"] = _pagerank
ORACLES["link_pagerank"] = _pagerank_oracle()
