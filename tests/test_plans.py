"""Physical-plan guards — the scale contract (SURVEY §4).

These pin the optimizer behaviors the 100 TB design relies on: filter
pushdown into the parquet scan, column pruning, broadcast joins for
small dims, partial (map-side) aggregation, range partitioning for
spatial clustering, and zero row-at-a-time Python in relational paths.
"""

import pytest
from pyspark.sql import functions as F

from gdal_spark import tables
from gdal_spark.queries import knn, relational, spatial

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_filter_pushdown_and_pruning(spark):
    tables.register_views(spark, SF)
    df = spark.table("lineitem").where("l_quantity > 40").select(
        "l_orderkey", "l_quantity"
    )
    ex = _explain(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in ex
    # column pruning: scan reads only the 2 referenced columns
    assert "l_extendedprice" not in ex.split("ReadSchema")[1].splitlines()[0]


def test_broadcast_join_for_small_dim(spark):
    df = relational.QUERIES["join_first_match"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_partial_aggregation(spark):
    df = relational.QUERIES["groupby_agg"](spark, SF)
    p = _plan(df)
    assert "partial_sum" in p  # map-side combine before the shuffle


def test_whole_stage_codegen_no_python(spark):
    df = relational.QUERIES["where_ops"](spark, SF)
    df.collect()  # AQE finalizes the physical plan only on execution
    p = _plan(df)
    assert "*(1)" in p  # '*' marks WholeStageCodegen spans in toString
    assert "EvalPython" not in p


def test_knn_broadcast(spark):
    df = knn.QUERIES["knn_centers"](spark, SF)
    p = _plan(df)
    assert "Broadcast" in p  # 25-row target layer broadcast, not shuffled


def test_spatial_sort_range_partitioning(spark):
    df = spatial.QUERIES["spatial_sort_morton"](spark, SF)
    assert "rangepartitioning(morton" in _plan(df).lower()


def test_pip_join_single_narrow_stage(spark):
    """The flagship join is ONE mapInPandas over the point table — no
    Exchange (shuffle) anywhere in the plan."""
    from gdal_spark.operators.spatial_join import broadcast_pip_join

    gp = tables.geo_pages(spark, SF).selectExpr("url", "lat", "lon")
    df = broadcast_pip_join(gp, tables.polygons_local())
    p = _plan(df)
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_no_rowwise_python_udfs_registered():
    """Lint: the engine registers no row-at-a-time Python UDFs — every
    Python entry point is pandas_udf / mapInPandas / applyInPandas
    (SURVEY §7.3 'no per-row Python')."""
    import pathlib
    import re

    root = pathlib.Path("/root/repo/gdal_spark")
    bad = []
    for f in root.rglob("*.py"):
        src = f.read_text()
        # F.udf( / @udf( — the non-vectorized API
        if re.search(r"(?<![a-z_])udf\(", src.replace("pandas_udf(", "")):
            bad.append(str(f))
    assert not bad, f"row-wise udf( found in {bad}"


def test_no_unbounded_driver_collects():
    """Lint: `.collect()` inside the engine (gdal_spark/, excluding the
    queries/ harness layer) is allowed only for bounded metadata — each
    site must carry a `# bounded-metadata:` annotation stating the bound.
    Row-data collects (geometries, pixels, documents) are scale-killers
    and must use broadcast / cover-shuffle / cogroup instead."""
    import pathlib

    root = pathlib.Path("/root/repo/gdal_spark")
    bad = []
    for f in root.rglob("*.py"):
        if "queries" in f.parts:
            continue
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if ".collect()" in line and "bounded-metadata" not in line:
                bad.append(f"{f}:{i}")
    assert not bad, f"unannotated .collect() found: {bad}"


def test_no_duplicate_toplevel_defs_in_query_modules():
    """Integrity guard (VERDICT r2 'What's wrong' #1): an accidental paste once
    duplicated ~330 lines of queries/raster.py; later definitions silently win.
    Assert every top-level `def` name is defined exactly once per query module."""
    import ast
    import collections
    import pathlib

    root = pathlib.Path("/root/repo/gdal_spark/queries")
    for f in root.glob("*.py"):
        tree = ast.parse(f.read_text())
        counts = collections.Counter(
            node.name for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
        dupes = {n: c for n, c in counts.items() if c > 1}
        assert not dupes, f"{f.name}: duplicate top-level defs {dupes}"
