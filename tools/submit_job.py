"""Cluster-launch entry point: the job a user ships with

    spark-submit --py-files dist/gdal_spark.zip tools/submit_job.py \
        <sf_dir> [zoom]

Self-contained on purpose — it imports the engine ONLY through the
--py-files payload (no repo-path assumption), runs the flagship
spatial-join + tile-assignment over the pages table, and prints one
JSON result line.  This is the `spark-submit --py-files` contract from
SURVEY.md §7 / the north rule, exercised end-to-end by
tests/test_submit.py from a foreign working directory.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    zoom = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    # Engine imports resolve from the --py-files zip on the executors
    # AND the driver; nothing here touches the repo checkout.
    from gdal_spark import portable, tables
    from gdal_spark.operators.spatial_join import broadcast_pip_join

    spark = SparkSession.builder.appName("gdal_spark_submit").getOrCreate()
    try:
        pages = tables.geo_pages(spark, sf_dir).selectExpr(
            "url",
            "lat",
            "lon",
            *portable.tile_cols_list("lat", "lon", zoom),
        )
        joined = broadcast_pip_join(pages, tables.polygons_local())
        n = joined.count()
        print(
            "SUBMIT_RESULT "
            + json.dumps({"rows": n, "sf": sf_dir, "zoom": zoom})
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
