"""Benchmark harness — prints ONE JSON line per run.

Headline metric (BASELINE.json): spatial-join + tile-assignment
throughput in pages/sec, plus per-query wall times at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Scaling-efficiency evidence (north rule, sandbox proxy): run
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare pages_per_sec (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gdal_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="gdal_spark_bench", master=f"local[{cpus}]")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # multiplier: replicate pages so the spatial-join benchmark has
    # enough rows to measure throughput meaningfully (documents at
    # sf0.1 is only 5000 rows)
    times: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 4)
        _ = n

    # headline: flagship spatial join + tile assignment throughput over an
    # amplified pages table (pages replicated with salted urls so geocodes
    # differ). Input (url, lat, lon) is materialized and cached first so
    # the timed region measures exactly the metric: tile math (Catalyst)
    # + PIP join (broadcast R-tree + ray-cast Arrow kernel).
    from gdal_spark import portable, tables
    from gdal_spark.operators.spatial_join import broadcast_pip_join, sql_pip_join

    amplify = int(os.environ.get("GDAL_SPARK_BENCH_AMPLIFY", "128"))
    tables.register_views(spark, sf_dir)
    base = (
        spark.sql(
            f"""
            select concat(url, '#', rep.r) as url,
                   {portable.geocode_cols('spark', "concat(url, '#', rep.r)")}
            from pages
            cross join (select explode(sequence(1, {amplify})) as r) rep
            """
        )
        .select("url", "lat", "lon")
        .repartition(cpus)
        .persist()
    )
    n_pages = base.count()
    polys = tables.polygons_local()

    def timed(make_df):
        t0 = time.time()
        rows = make_df().count()
        return rows, time.time() - t0

    def arrow_path():
        tiled = base.selectExpr(
            "url", "lat", "lon", *portable.tile_cols_list("lat", "lon", 12)
        )
        return broadcast_pip_join(tiled, polys)

    def sql_path():
        tiled = base.selectExpr(
            "url", "lat", "lon", *portable.tile_cols_list("lat", "lon", 12)
        )
        return sql_pip_join(tiled, polys, key_cols=("url", "tile_x", "tile_y"))

    # warm (python workers / codegen), then measure
    timed(arrow_path)
    out_rows, dt = timed(arrow_path)
    _, dt_sql = timed(sql_path)
    pages_per_sec = n_pages / dt

    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assign_throughput",
                "value": round(pages_per_sec, 1),
                "unit": "pages/sec",
                "queries": times,
                "sf": sf_dir,
                "cpus": cpus,
                "n_pages": n_pages,
                "join_rows": out_rows,
                "join_sec": round(dt, 3),
                "sql_join_sec": round(dt_sql, 3),
                "sql_pages_per_sec": round(n_pages / dt_sql, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
