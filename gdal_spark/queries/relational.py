"""OGR-SQL-dialect parity layer (SURVEY §2.2, §2.4, §2.6, §2.7).

The reference's SQL engine (swq) supports exactly:
  WHERE ops  — OR AND NOT = <> >= <= < > LIKE ILIKE IS NULL IN BETWEEN
               + - * / % CONCAT SUBSTR HSTORE_GET_VALUE CAST
               (registry ogr/swq_op_registrar.cpp:28-61, enum
               ogr/ogr_swq.h:44-79, eval ogr/swq_op_general.cpp:380-1130)
  aggregates — whole-table AVG MIN MAX COUNT SUM STDDEV_POP STDDEV_SAMP
               COUNT(DISTINCT) — no GROUP BY in the dialect
               (ogr/ogr_swq.h:436-507, accumulation ogr/swq.cpp:324-560)
  DISTINCT   — single-column value list (ogr/swq.cpp:388-418)
  ORDER BY   — multi-key, NULLs first (ogr_gensql.cpp:2470-2600)
  LIMIT/OFFSET (ogr_gensql.cpp:605-655)
  UNION ALL  — chained selects (ogr/swq_parser.y:840)
  JOIN       — equi-join, LEFT-JOIN-take-first-match semantics even when
               written as inner JOIN (ogr_gensql.cpp:1507-1537)

Everything here is stock Catalyst (predicate pushdown, column pruning,
codegen — SURVEY §4); only the first-match join rule needs an explicit
dedup. LIKE is case-sensitive and ILIKE insensitive in Spark, DuckDB and
the reference alike (pinned by autotest/ogr/ogr_sql_test.py:329-376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark import tables


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    return spark.sql(sql)


# --- WHERE operator set (shared text: identical in Spark SQL & DuckDB) ---

WHERE_LIKE_SQL = """
    select p_partkey, p_name
    from part
    where p_name like '%old%'        -- case-SENSITIVE (matches 'cold …')
       or p_name ilike '%WIDGET%'    -- case-insensitive
    order by p_partkey
"""

WHERE_OPS_SQL = """
    select l_orderkey, l_linenumber,
           concat(l_returnflag, '/', l_linestatus) as flag_status,
           substr(l_returnflag, 1, 1) as rf1,
           cast(l_quantity as bigint) % 7 as qty_mod7,
           l_extendedprice * (1.0 - l_discount) as net_price
    from lineitem
    where l_returnflag in ('A', 'N')
      and l_quantity between 10 and 20
      and l_shipdate is not null
      and not (l_discount > 0.05 and l_tax > 0.05)
      and l_linestatus <> 'X'
    order by l_orderkey, l_linenumber
"""

# Spark CAST(double AS int) truncates toward zero — same as the
# reference's C-style cast (ogr/swq_op_general.cpp:1844-1900). DuckDB
# rounds, so its oracle spells the truncation out with trunc().
CAST_OPS_SQL = """
    select o_orderkey,
           cast(o_orderkey as smallint) as k_small,
           cast(o_orderkey as integer) as k_int,
           cast(o_orderkey as bigint) as k_big,
           cast(o_totalprice as integer) as price_int,
           cast(o_orderkey as varchar(20)) as k_str,
           cast(o_orderdate as date) as odate,
           cast(o_orderkey % 2 as boolean) as k_odd
    from orders
    where o_orderkey < 1000
    order by o_orderkey
"""

# HSTORE_GET_VALUE analog (ogr/ogr_swq.h:65): key lookup inside a string
# field. events.props holds a one-key JSON object; both engines run the
# same regexp_extract (pattern avoids backslash classes — Spark processes
# backslash escapes inside SQL string literals, DuckDB does not).
HSTORE_SQL = """
    select event_id,
           regexp_extract(props, '"k": *([0-9]+)', 1) as k_val
    from events
    where event_id < 500
    order by event_id
"""

DISTINCT_SQL = """
    select distinct o_orderpriority
    from orders
    order by o_orderpriority
"""

ORDERBY_LIMIT_SQL = """
    select o_orderkey, o_custkey, o_totalprice
    from orders
    order by o_totalprice desc, o_orderkey asc
    limit 50 offset 10
"""

UNION_ALL_SQL = """
    select c_name as name, c_acctbal as acctbal, 'customer' as src
    from customer where c_acctbal > 9900
    union all
    select s_name as name, s_acctbal as acctbal, 'supplier' as src
    from supplier where s_acctbal > 9900
"""

SUMMARY_SQL = """
    select count(*) as cnt,
           count(distinct l_returnflag) as cnt_distinct_rf,
           round(sum(l_quantity), 4) as sum_qty,
           round(avg(l_extendedprice), 4) as avg_price,
           min(l_shipdate) as min_ship,
           max(l_shipdate) as max_ship,
           round(stddev_pop(l_discount), 8) as stddev_pop_disc,
           round(stddev_samp(l_discount), 8) as stddev_samp_disc
    from lineitem
"""

# MIN/MAX on strings are lexicographic and AVG over datetime is average
# unix time in the reference (ogr_gensql.cpp:1104-1170) — same in Spark
# and DuckDB; avg-of-timestamp expressed portably via epoch seconds.
SUMMARY_MINMAX_STR_SQL = """
    select min(p_name) as min_name, max(p_name) as max_name,
           min(p_brand) as min_brand, max(p_brand) as max_brand,
           count(distinct p_type) as cnt_types
    from part
"""


def _join_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR SQL JOIN: for each primary row take the FIRST matching
    secondary row only (ogr_gensql.cpp:1507-1537 — the per-row attribute
    filter returns the first feature in FID order). Primary=customer,
    secondary=orders on custkey; 'first' = lowest o_orderkey (scan
    order). Unmatched customers keep NULLs (LEFT semantics even when
    written JOIN)."""
    tables.register_views(spark, sf_dir)
    orders = spark.table("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    first_order = (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    cust = spark.table("customer").select("c_custkey", "c_name", "c_acctbal")
    j = cust.join(
        F.broadcast(first_order), cust.c_custkey == first_order.o_custkey, "left"
    )
    return j.select("c_custkey", "c_name", "o_orderkey", "o_totalprice").orderBy(
        "c_custkey"
    )


JOIN_FIRST_MATCH_ORACLE = """
    with first_order as (
        select o_custkey, o_orderkey, o_totalprice
        from (
            select o_custkey, o_orderkey, o_totalprice,
                   row_number() over (partition by o_custkey
                                      order by o_orderkey) as rn
            from orders
        ) where rn = 1
    )
    select c_custkey, c_name, o_orderkey, o_totalprice
    from customer left join first_order on c_custkey = o_custkey
    order by c_custkey
"""


def _groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: GROUP BY aggregation (the OGR dialect lacks it;
    its SQLITE dialect gets it from SQLite — ogrsqliteexecutesql.cpp:461).
    Partial aggregation (map-side combine) makes this shuffle-light at
    100 TB: only (group, partial-state) rows move."""
    tables.register_views(spark, sf_dir)
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


GROUPBY_ORACLE = """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) as sum_qty,
           round(avg(l_extendedprice), 4) as avg_price,
           count(*) as cnt
    from lineitem
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus
"""


# --- composite gate query: the whole trivial-relational family in ONE entry
# (VERDICT r2 'Next round' #2: 76 queries compete for 50 driver slots; the
# six single-operator checks below stay registered for the local replica,
# this composite carries their driver-gate evidence). Normalized to a
# common (part, k1, k2, v) schema so one hash covers WHERE ops, LIKE/ILIKE,
# CAST targets, HSTORE_GET_VALUE, DISTINCT, ORDER BY/LIMIT/OFFSET and
# UNION ALL — each sub-block is the same operator text as its standalone
# query (ogr/swq_op_registrar.cpp:28-61, swq_parser.y:840).

RELATIONAL_SUITE_SQL = """
    with w_ops as (
        select cast(l_orderkey * 10 + l_linenumber as bigint) as k1,
               concat(l_returnflag, '/', l_linestatus, '|',
                      substr(l_returnflag, 1, 1), '|',
                      cast(cast(l_quantity as bigint) % 7 as varchar(8))) as k2,
               cast(l_extendedprice * (1.0 - l_discount) as double) as v
        from lineitem
        where l_returnflag in ('A', 'N')
          and l_quantity between 10 and 20
          and l_shipdate is not null
          and not (l_discount > 0.05 and l_tax > 0.05)
          and l_linestatus <> 'X'
    ),
    w_like as (
        select cast(p_partkey as bigint) as k1, p_name as k2,
               cast(0.0 as double) as v
        from part
        where p_name like '%old%' or p_name ilike '%WIDGET%'
    ),
    c_ops as (
        select cast(o_orderkey as bigint) as k1,
               concat(cast(cast(o_orderkey as smallint) as varchar(8)), '|',
                      cast(cast(o_orderkey as integer) as varchar(12)), '|',
                      cast(o_orderkey as varchar(20)), '|',
                      cast(cast(o_orderdate as date) as varchar(10)), '|',
                      cast(cast(o_orderkey % 2 as boolean) as varchar(5))) as k2,
               cast(cast(o_totalprice as integer) as double) as v
        from orders where o_orderkey < 1000
    ),
    h_get as (
        select cast(event_id as bigint) as k1,
               regexp_extract(props, '"k": *([0-9]+)', 1) as k2,
               cast(0.0 as double) as v
        from events where event_id < 500
    ),
    d_vals as (
        select distinct cast(0 as bigint) as k1, o_orderpriority as k2,
               cast(0.0 as double) as v
        from orders
    ),
    o_lim as (
        select cast(o_orderkey as bigint) as k1,
               cast(o_custkey as varchar(20)) as k2,
               cast(o_totalprice as double) as v
        from orders
        order by o_totalprice desc, o_orderkey asc
        limit 50 offset 10
    ),
    u_all as (
        select cast(0 as bigint) as k1, concat(name, '/', src) as k2,
               cast(acctbal as double) as v
        from (
            select c_name as name, c_acctbal as acctbal, 'customer' as src
            from customer where c_acctbal > 9900
            union all
            select s_name as name, s_acctbal as acctbal, 'supplier' as src
            from supplier where s_acctbal > 9900
        ) as u
    )
    select 'where_ops' as part, k1, k2, v from w_ops
    union all select 'where_like' as part, k1, k2, v from w_like
    union all select 'cast_ops' as part, k1, k2, v from c_ops
    union all select 'hstore_get' as part, k1, k2, v from h_get
    union all select 'distinct' as part, k1, k2, v from d_vals
    union all select 'orderby_limit_offset' as part, k1, k2, v from o_lim
    union all select 'union_all' as part, k1, k2, v from u_all
"""


def _q(sql: str):
    return lambda spark, sf_dir: _sql(spark, sf_dir, sql)


QUERIES = {
    "relational_suite": _q(RELATIONAL_SUITE_SQL),
    "where_like": _q(WHERE_LIKE_SQL),
    "where_ops": _q(WHERE_OPS_SQL),
    "cast_ops": _q(CAST_OPS_SQL),
    "hstore_get": _q(HSTORE_SQL),
    "distinct_vals": _q(DISTINCT_SQL),
    "orderby_limit_offset": _q(ORDERBY_LIMIT_SQL),
    "union_all": _q(UNION_ALL_SQL),
    "summary_aggregates": _q(SUMMARY_SQL),
    "summary_minmax_str": _q(SUMMARY_MINMAX_STR_SQL),
    "join_first_match": _join_first_match,
    "groupby_agg": _groupby_agg,
}

ORACLES = {
    # Spark CAST(double AS int) truncates; DuckDB rounds — spell it out
    "relational_suite": RELATIONAL_SUITE_SQL.replace(
        "cast(cast(o_totalprice as integer) as double)",
        "cast(cast(trunc(o_totalprice) as integer) as double)",
    ),
    "where_like": WHERE_LIKE_SQL,
    "where_ops": WHERE_OPS_SQL,
    "cast_ops": CAST_OPS_SQL.replace(
        "cast(o_totalprice as integer)", "cast(trunc(o_totalprice) as integer)"
    ),
    "hstore_get": HSTORE_SQL,
    "distinct_vals": DISTINCT_SQL,
    "orderby_limit_offset": ORDERBY_LIMIT_SQL,
    "union_all": UNION_ALL_SQL,
    "summary_aggregates": SUMMARY_SQL,
    "summary_minmax_str": SUMMARY_MINMAX_STR_SQL,
    "join_first_match": JOIN_FIRST_MATCH_ORACLE,
    "groupby_agg": GROUPBY_ORACLE,
}


# --- gdal vector concat (OGRUnionLayer, apps/gdalalg_vector_concat.cpp) ---

def _concat_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-layer union with merged schema (union field strategy:
    missing fields NULL-padded) + source-layer provenance column —
    unionByName(allowMissingColumns) is the OGRUnionLayer analog
    (ogr/ogrsf_frmts/generic/ogrunionlayer.cpp:510-518)."""
    tables.register_views(spark, sf_dir)
    cust = (
        spark.table("customer")
        .selectExpr(
            "c_custkey as key",
            "c_name as name",
            "c_acctbal as acctbal",
            "c_mktsegment as mktsegment",
        )
        .withColumn("source_layer", F.lit("customer"))
    )
    supp = (
        spark.table("supplier")
        .selectExpr(
            "s_suppkey as key", "s_name as name", "s_acctbal as acctbal"
        )
        .withColumn("source_layer", F.lit("supplier"))
    )
    return cust.unionByName(supp, allowMissingColumns=True).where(
        "acctbal > 9000"
    )


CONCAT_ORACLE = """
    select * from (
        select c_custkey as key, c_name as name, c_acctbal as acctbal,
               c_mktsegment as mktsegment, 'customer' as source_layer
        from customer
        union all
        select s_suppkey as key, s_name as name, s_acctbal as acctbal,
               null as mktsegment, 'supplier' as source_layer
        from supplier
    ) where acctbal > 9000
"""

QUERIES["concat_layers"] = _concat_layers
ORACLES["concat_layers"] = CONCAT_ORACLE


# --- gdal vector partition (apps/gdalalg_vector_partition.cpp) ---

def _partition_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned dataset writer + checkpoint manifest: write
    pages partitioned by lang, return the (lang, n_rows) manifest (the
    per-partition lineage/metrics contract, minus run-specific fields so
    the result is deterministic)."""
    import tempfile

    from gdal_spark.operators import checkpoint as CP

    tables.register_views(spark, sf_dir)
    pages = spark.sql("select url, text, lang from pages")
    out = tempfile.mkdtemp(prefix="gdal_spark_partition_")
    CP.write_partitioned(pages, out, ["lang"])
    m = CP.read_manifest(spark, out)
    return m.select("lang", "n_rows").orderBy("lang")


PARTITION_WRITE_ORACLE = """
    select lang, count(*) as n_rows
    from documents
    group by lang
    order by lang
"""

QUERIES["partition_write_manifest"] = _partition_write
ORACLES["partition_write_manifest"] = PARTITION_WRITE_ORACLE


def _partition_write_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vector partition --feature-limit splits (VERDICT r4 next #5,
    apps/gdalalg_vector_partition.cpp:158): pages partitioned by lang,
    each partition split into numbered parts of <= 100 features; the
    manifest carries (lang, part_seq, n_rows)."""
    import tempfile

    from gdal_spark.operators import checkpoint as CP

    tables.register_views(spark, sf_dir)
    pages = spark.sql("select url, text, lang from pages")
    out = tempfile.mkdtemp(prefix="gdal_spark_partsplit_")
    CP.write_vector_partitioned(
        pages, out, ["lang"], order_col="url", feature_limit=100
    )
    m = CP.read_manifest(spark, out)
    return m.select("lang", "part_seq", "n_rows").orderBy("lang", "part_seq")


# split sizes depend only on per-lang counts: part k of n rows holds
# min(100, n - 100k) — enumerable in SQL without knowing the order key
PARTITION_SPLITS_ORACLE = """
with c as (select lang, count(*) as n from documents group by lang),
s as (
  select lang, cast(i as int) as part_seq,
         cast(least(100, n - i * 100) as bigint) as n_rows
  from c cross join (select unnest(range(0,
       (select cast(ceil(max(n) / 100.0) as bigint) from c))) as i)
  where i * 100 < n
)
select lang, part_seq, n_rows from s order by lang, part_seq
"""

QUERIES["partition_write_splits"] = _partition_write_splits
ORACLES["partition_write_splits"] = PARTITION_SPLITS_ORACLE


# --- column exclusion (OGR 'SELECT * EXCLUDE (...)', swq_parser.y:76-77) ---

SELECT_EXCEPT_SQL = """
    select * except (o_orderpriority, o_orderdate)
    from orders
    where o_orderkey < 200
    order by o_orderkey
"""

QUERIES["select_except_cols"] = _q(SELECT_EXCEPT_SQL)
ORACLES["select_except_cols"] = SELECT_EXCEPT_SQL.replace(
    "except (", "exclude ("
)
