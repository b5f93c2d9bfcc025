"""OGR SQL semantic pins transcribed from the reference's autotest
expectations (SURVEY §5) — the behaviors that are easy to get subtly
wrong in a re-implementation."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def t(spark):
    spark.createDataFrame(
        [
            (1, "Liechtenstein", 100.0),
            (2, "liechtenstein", 200.0),
            (3, None, 300.0),
            (4, "Austria", None),
        ],
        "fid long, name string, val double",
    ).createOrReplaceTempView("semt")
    return spark


def test_like_case_sensitive_ilike_not(t):
    """ogr_sql_test.py:329-376: LIKE is case-sensitive (GDAL >= 3.1
    default), ILIKE insensitive."""
    q = lambda e: {r.fid for r in t.sql(f"select fid from semt where {e}").collect()}  # noqa: E731
    assert q("name like 'Liech%'") == {1}
    assert q("name like 'LIECH%'") == set()
    assert q("name ilike 'LIECH%'") == {1, 2}
    # wildcards: % multi, _ single (any char — matches both casings here)
    assert q("name like '_iechtenstein'") == {1, 2}
    assert q("name like 'Liechtenstei_'") == {1}


def test_null_propagation_in_comparisons(t):
    """swq_op_general.cpp:381-440: comparisons with NULL are not true."""
    q = lambda e: {r.fid for r in t.sql(f"select fid from semt where {e}").collect()}  # noqa: E731
    assert q("name = name") == {1, 2, 4}          # NULL = NULL is not true
    assert q("val > 0") == {1, 2, 3}
    assert q("not (val > 0)") == set() | set()    # NULL excluded from NOT too
    assert q("name is null") == {3}
    assert q("val is not null") == {1, 2, 3}


def test_distinct_includes_null_once(t):
    rows = t.sql(
        "select distinct name from semt order by name asc nulls first"
    ).collect()
    assert [r.name for r in rows] == [
        None, "Austria", "Liechtenstein", "liechtenstein"
    ]


def test_order_by_nulls_first_default_asc(t):
    """OGR comparator puts NULLs first (ogr_gensql.cpp:2470-2600);
    Spark's asc default is nulls-first — parity for free."""
    rows = t.sql("select fid from semt order by name asc").collect()
    assert rows[0].fid == 3


def test_summary_on_empty_selection(t):
    r = t.sql(
        "select count(*) as c, min(val) as mn, max(val) as mx "
        "from semt where fid > 100"
    ).collect()[0]
    assert r.c == 0 and r.mn is None and r.mx is None


def test_min_max_lexicographic_on_strings(t):
    """ogr_gensql.cpp:1134-1170: MIN/MAX on strings compare
    lexicographically (byte order — capitals before lowercase)."""
    r = t.sql("select min(name) as mn, max(name) as mx from semt").collect()[0]
    assert r.mn == "Austria"
    assert r.mx == "liechtenstein"


def test_cast_double_to_int_truncates(t):
    """swq CAST to integer is a C-style truncating cast."""
    r = t.sql(
        "select cast(299.99 as integer) as a, cast(-1.7 as integer) as b"
    ).collect()[0]
    assert r.a == 299 and r.b == -1


def test_first_match_join_one_row_per_primary(spark):
    """ogr_gensql.cpp:1507-1537: secondary matches beyond the first are
    ignored — primary row count is preserved."""
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, pv string"
    ).createOrReplaceTempView("prim")
    spark.createDataFrame(
        [(1, "x1"), (1, "x2"), (1, "x3")], "k long, sv string"
    ).createOrReplaceTempView("sec")
    rows = spark.sql(
        """
        select p.k, p.pv, s.sv from prim p
        left join (
            select * from (
                select k, sv, row_number() over (partition by k order by sv) rn
                from sec
            ) where rn = 1
        ) s on p.k = s.k
        order by p.k
        """
    ).collect()
    assert len(rows) == 2                      # not 4 (plain join would be)
    assert rows[0].sv == "x1"                  # first in scan order
    assert rows[1].sv is None                  # unmatched → NULLs
