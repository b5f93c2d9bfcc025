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
    assert "'POLYGON'" in out
    assert "select fid," in out


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
