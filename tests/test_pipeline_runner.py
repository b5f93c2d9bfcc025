"""`gdal pipeline` runner (gdal_spark/pipeline.py) — step parity with
the directly-composed operators, tee/materialize semantics, and the
parser's step validation (apps/gdalalg_abstract_pipeline.cpp,
gdalalg_tee.cpp, gdalalg_materialize.cpp)."""

import os

import pytest
from pyspark.sql import functions as F

from gdal_spark import pipeline as P
from gdal_spark import tables
from tests.conftest import SF_SMOKE


def test_parse_pipeline_separators_and_errors(spark):
    steps = P.parse_pipeline("read t ! filter --where 'a > 1' | limit 5")
    assert [s[0] for s in steps] == ["read", "filter", "limit"]
    assert steps[1] == ["filter", "--where", "a > 1"]
    with pytest.raises(ValueError):
        P.parse_pipeline("read t ! ! limit 5")
    with pytest.raises(ValueError):
        P.parse_pipeline("read t !")
    with pytest.raises(ValueError):
        P.run_vector_pipeline(spark, "filter --where 'a>1'")


def test_vector_chain_matches_direct_ops(spark):
    out = P.run_vector_pipeline(
        spark,
        "read geo_pages ! make-point --x lon --y lat "
        "! filter --bbox -10.03,35.02,20.01,55.04 "
        "! select --fields url,lang,city_id ! sort --by city_id,url "
        "! limit 50",
        sf_dir=SF_SMOKE,
    )
    direct = (
        tables.geo_pages(spark, SF_SMOKE)
        .where(
            "lon >= -10.03 and lon <= 20.01 "
            "and lat >= 35.02 and lat <= 55.04"
        )
        .select("url", "lang", "city_id")
        .orderBy("city_id", "url")
        .limit(50)
    )
    assert out.columns == ["url", "lang", "city_id"]
    assert out.collect() == direct.collect()


def test_vector_sql_and_sort_desc(spark):
    out = P.run_vector_pipeline(
        spark,
        'read nation ! sql "SELECT n_name, n_regionkey FROM input '
        'WHERE n_regionkey <= 1" ! sort --by -n_name ! limit 3',
        sf_dir=SF_SMOKE,
    )
    rows = [r.n_name for r in out.collect()]
    assert rows == sorted(rows, reverse=True) and len(rows) == 3


def test_geometry_steps_chain(spark):
    polys = tables.polygons_df(spark, SF_SMOKE)
    out = P.run_vector_pipeline(
        spark,
        "filter --where 'polygon_id < 5' ! geom set-type --multi "
        "! simplify --tolerance 0.0001 --preserve-topology "
        "! make-valid ! select --exclude minx,miny,maxx,maxy",
        input_df=polys,
    )
    got = out.collect()
    assert len(got) == 5
    assert out.columns == ["polygon_id", "polygon_name", "geometry"]
    for r in got:
        assert bytes(r.geometry)  # non-null WKB survived the chain


def test_clip_keeps_and_clips(spark):
    polys = tables.polygons_df(spark, SF_SMOKE)
    row = polys.orderBy("polygon_id").first()
    cx = (row.minx + row.maxx) / 2.0
    bbox = f"{cx},{row.miny - 1},{row.maxx + 1},{row.maxy + 1}"
    out = P.run_vector_pipeline(
        spark,
        f"filter --where 'polygon_id = {row.polygon_id}' "
        f"! clip --bbox {bbox}",
        input_df=polys,
    ).withColumn("a", F.expr("st_area(geometry)"))
    full = (
        polys.where(F.col("polygon_id") == row.polygon_id)
        .withColumn("a", F.expr("st_area(geometry)"))
        .first()
        .a
    )
    clipped = out.first().a
    # right half of a convex polygon: strictly smaller, non-empty
    assert 0.0 < clipped < full
    # a bbox fully outside drops the feature
    empty = P.run_vector_pipeline(
        spark,
        f"filter --where 'polygon_id = {row.polygon_id}' "
        f"! clip --bbox {row.maxx + 5},{row.maxy + 5},"
        f"{row.maxx + 6},{row.maxy + 6}",
        input_df=polys,
    )
    assert empty.count() == 0


def test_tee_and_materialize(spark, tmp_path):
    side = str(tmp_path / "tee_out")
    mat = str(tmp_path / "mat")
    out = P.run_vector_pipeline(
        spark,
        f"read nation ! filter --where 'n_regionkey = 0' ! tee {side} "
        f"! materialize {mat} ! select --fields n_name ! sort --by n_name",
        sf_dir=SF_SMOKE,
    )
    names = [r.n_name for r in out.collect()]
    teed = sorted(
        r.n_name for r in spark.read.parquet(side).collect()
    )
    assert names == teed and len(names) == 5
    # materialize cut the plan: downstream reads the checkpoint files
    assert os.path.isdir(mat)
    files = out.inputFiles()
    assert files and all(mat in f for f in files)


def test_write_partitioned_manifest(spark, tmp_path):
    dst = str(tmp_path / "out")
    P.run_vector_pipeline(
        spark,
        f"read nation ! write {dst} --partition-by n_regionkey",
        sf_dir=SF_SMOKE,
    )
    man = spark.read.parquet(os.path.join(dst, "_manifest"))
    assert man.count() == 5  # one row per region partition


def test_raster_chain_matches_direct_ops(spark):
    from gdal_spark.raster import model, ops

    out = P.run_raster_pipeline(
        spark,
        "read grad100 ! translate --srcwin 10,10,50,40 --bands 1 "
        "! scale --dst-min 0 --dst-max 100 ! select --bands 1",
    )
    direct = ops.scale_minmax(
        ops.translate(
            model.synth_blocks(spark, model.grad100_spec()),
            (10, 10, 50, 40),
            bands=[1],
        ),
        0.0,
        100.0,
    )
    a = {
        (r["band"], r["bx"], r["by"]): bytes(r["buf"])
        for r in out.collect()
    }
    b = {
        (r["band"], r["bx"], r["by"]): bytes(r["buf"])
        for r in direct.collect()
    }
    assert a == b and a


def test_raster_focal_and_calc_steps(spark):
    out = P.run_raster_pipeline(
        spark, "read plane ! slope ! calc --expr 'b1 * 2'"
    )
    assert out.count() > 0
    with pytest.raises(ValueError):
        P.run_raster_pipeline(spark, "read plane ! warp-me-harder")


def test_json_pipeline_entry(spark):
    out = P.run_pipeline_json(
        spark,
        {"pipeline": "read nation ! limit 4", "type": "vector"},
        sf_dir=SF_SMOKE,
    )
    assert out.count() == 4


def test_pipeline_filter_pushes_to_scan(spark):
    """The chain is a lazy Catalyst plan: a mid-chain filter/select
    reaches the parquet scan as PushedFilters + a pruned ReadSchema."""
    out = P.run_vector_pipeline(
        spark,
        "read lineitem ! filter --where 'l_quantity > 40' "
        "! select --fields l_orderkey,l_quantity ! limit 10",
        sf_dir=SF_SMOKE,
    )
    ex = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "GreaterThan(l_quantity,40.0)" in ex
    assert "l_orderkey" in ex.split("ReadSchema")[1].splitlines()[0]


def test_raster_to_vector_steps(spark, tmp_path):
    """Mixed raster→vector pipeline steps (apps/gdalalg_pipeline.cpp
    registers polygonize/footprint/contour/as_features as pipeline
    members): parity with the directly-composed operators."""
    from gdal_spark.raster import model, ops
    from gdal_spark.raster.contour import contour_polylines, contour_segments

    out = P.run_raster_pipeline(
        spark, "read checker ! polygonize --band 1"
    )
    direct_w = (
        model.synth_blocks(spark, model.checker_spec())
        .agg(F.max(F.col("x0") + F.col("width")))
        .first()[0]
    )  # bounded-metadata: raster width
    from gdal_spark.raster.polygonize import polygonize

    direct = polygonize(
        model.synth_blocks(spark, model.checker_spec()), int(direct_w), band=1
    )
    assert sorted(
        (r["value"], r["n_pixels"]) for r in out.collect()
    ) == sorted((r["value"], r["n_pixels"]) for r in direct.collect())

    cont = P.run_raster_pipeline(
        spark,
        "read plane ! contour --levels 20,40 ! materialize "
        + str(tmp_path / "cont"),
    )
    g = model.synth_blocks(spark, model.plane_spec())
    w = int(
        g.agg(F.max(F.col("x0") + F.col("width"))).first()[0]
    )  # bounded-metadata
    h = int(
        g.agg(F.max(F.col("y0") + F.col("height"))).first()[0]
    )  # bounded-metadata
    dc = contour_polylines(contour_segments(g, [20.0, 40.0], w, h))
    assert cont.count() == dc.count() > 0

    feats = P.run_raster_pipeline(
        spark, "read grad100 ! select --bands 1 ! as-features ! tee "
        + str(tmp_path / "feat")
    )
    assert feats.where("x = 3 and y = 4").count() == 1
