"""Spatial join: strategy equivalence + semantics pinned to the
reference's filter/refine contract (ogrlayer.cpp:3981-4048, 5361)."""

import numpy as np

from gdal_spark import tables
from gdal_spark.operators.spatial_join import (
    broadcast_pip_join,
    cell_pip_join,
    polygon_cell_cover,
)
from tests.conftest import SF_SMOKE


def test_strategies_identical(spark):
    gp = tables.geo_pages(spark, SF_SMOKE).selectExpr("url", "lat", "lon")
    polys = tables.polygons_local()
    a = broadcast_pip_join(gp, polys).select("url", "polygon_id")
    b = cell_pip_join(gp, polys).select("url", "polygon_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_left_join_keeps_unmatched(spark):
    gp = tables.geo_pages(spark, SF_SMOKE).selectExpr("url", "lat", "lon")
    polys = tables.polygons_local()
    inner = broadcast_pip_join(gp, polys)
    left = broadcast_pip_join(gp, polys, how="left")
    n_pages = gp.count()
    matched_pages = inner.select("url").distinct().count()
    assert left.where("polygon_id is null").count() == n_pages - matched_pages
    assert left.count() == inner.count() + (n_pages - matched_pages)


def test_multi_match_duplicates_rows(spark):
    # 25 polygons over 20 cities → 5 cities have two concentric octagons;
    # pages near those centers must match both (Intersection semantics:
    # one output row per overlapping pair, ogrlayer.cpp:5361).
    gp = tables.geo_pages(spark, SF_SMOKE).selectExpr("url", "lat", "lon")
    j = broadcast_pip_join(gp, tables.polygons_local())
    dup = j.groupBy("url").count().where("count > 1").count()
    assert dup > 0


def test_cover_contains_polygon_tiles(spark):
    polys = tables.polygons_local()[:3]
    cover = polygon_cell_cover(polys, 7)
    assert len(cover) >= 3
    ids = {pid for _, pid in cover}
    assert ids == {p["polygon_id"] for p in polys}


def test_pip_matches_sql_oracle_rowcount(spark):
    # engine vs pure-SQL ray-cast evaluated by Spark itself — an
    # in-process replica of the DuckDB oracle check
    from gdal_spark import portable

    tables.register_views(spark, SF_SMOKE)
    oracle = spark.sql(portable.pip_join_sql("spark"))
    gp = tables.geo_pages(spark, SF_SMOKE).selectExpr("url", "lat", "lon")
    eng = broadcast_pip_join(gp, tables.polygons_local()).select("url", "polygon_id")
    assert eng.exceptAll(oracle).count() == 0
    assert oracle.exceptAll(eng).count() == 0


def test_cell_pip_join_shuffled_matches_broadcast(spark):
    """The no-broadcast shuffle strategy returns identical rows to the
    broadcast R-tree strategy."""
    from gdal_spark import tables
    from gdal_spark.operators.spatial_join import (
        broadcast_pip_join,
        cell_pip_join_shuffled,
    )

    gp = tables.geo_pages(spark, "/root/testdata/sf0.001").selectExpr(
        "url", "lat", "lon"
    )
    pdf = tables.polygons_df(spark, "/root/testdata/sf0.001")
    got = {
        (r.url, r.polygon_id)
        for r in cell_pip_join_shuffled(gp, pdf).select("url", "polygon_id").collect()
    }
    want = {
        (r.url, r.polygon_id)
        for r in broadcast_pip_join(gp, tables.polygons_local())
        .select("url", "polygon_id")
        .collect()
    }
    assert got == want and len(got) > 0


def test_shuffled_join_plan_is_shuffle_join(spark):
    from gdal_spark import tables
    from gdal_spark.operators.spatial_join import cell_pip_join_shuffled

    gp = tables.geo_pages(spark, "/root/testdata/sf0.001").selectExpr(
        "url", "lat", "lon"
    )
    pdf = tables.polygons_df(spark, "/root/testdata/sf0.001")
    plan = (
        cell_pip_join_shuffled(gp, pdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan  # genuinely shuffles — no broadcast path


def test_hex_join_matches_broadcast_and_is_pythonless(spark):
    """hex_pip_join (north-rule H3-keyed strategy) returns identical
    rows to the R-tree broadcast join, and its plan contains no Python
    evaluation at all (cube-round keying + parity refine are codegen)."""
    from gdal_spark.operators.spatial_join import hex_pip_join

    gp = tables.geo_pages(spark, SF_SMOKE).selectExpr("url", "lat", "lon")
    polys = tables.polygons_local()
    a = broadcast_pip_join(gp, polys).select("url", "polygon_id")
    h = hex_pip_join(gp, polys).select("url", "polygon_id")
    assert a.exceptAll(h).count() == 0
    assert h.exceptAll(a).count() == 0
    plan = h._sc._jvm.PythonSQLUtils.explainString(
        h._jdf.queryExecution(), "formatted"
    )
    # no Python EVALUATION nodes (the ExistingRDD scan of the local
    # fixture cover/edges mentions applySchemaToPythonRDD — that's
    # driver-side test materialization, not a per-row Python stage)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in plan


def test_hex_cover_contains_every_inside_point_cell(spark):
    """The ±2 cover margin provably holds: every page that the exact
    join puts inside polygon P carries a hex cell present in P's
    cover rows."""
    from gdal_spark import portable
    from gdal_spark.operators.spatial_join import polygon_hex_cover

    gp = tables.geo_pages(spark, SF_SMOKE).selectExpr("url", "lat", "lon")
    polys = tables.polygons_local()
    inside = broadcast_pip_join(gp, polys).select("url", "lat", "lon", "polygon_id")
    inside.createOrReplaceTempView("_hexcov_pts")
    keyed = spark.sql(
        portable.hex_cells_sql(
            "select * from _hexcov_pts", 100000.0,
            cols=("url", "polygon_id"),
        )
    ).collect()
    cover = {t[:3] for t in polygon_hex_cover(polys, 100000.0)}
    missing = [
        r for r in keyed
        if (int(r.hex_q), int(r.hex_r), int(r.polygon_id)) not in cover
    ]
    assert missing == []
