"""Line-of-sight over the block table — alg/los.cpp
(GDALIsLineOfSightVisible) re-expressed on the distributed point
interpolator: sample the DEM along the observer→target segment with the
cogrouped block gather (resample.interpolate_at_points — no raster
collect), then compare each ground sample against the straight sight
line between the endpoint elevations.

The full viewshed (alg/viewshed/viewshed.cpp) stays out of scope
(SURVEY §2 note): its per-pixel ray dependency chain is the one GDAL
algorithm with no shuffle-free decomposition; point-to-point LOS is the
API the reference exposes for programmatic use (gdal raster
line-of-sight util) and distributes cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.resample import interpolate_at_points


def los_profile(
    blocks: DataFrame,
    observer: tuple[float, float, float],
    target: tuple[float, float, float],
    n_samples: int = 64,
    band: int = 1,
) -> DataFrame:
    """(sid, t, lon, lat, ground, sightline, blocked) along the segment.

    observer/target: (lon, lat, height-above-ground). The sight line runs
    from ground(observer)+h_obs to ground(target)+h_tgt; a sample is
    `blocked` when the terrain rises strictly above the line between the
    endpoints (exclusive — endpoints can't block themselves, matching
    GDALIsLineOfSightVisible's interior test)."""
    spark = blocks.sparkSession
    olon, olat, oh = observer
    tlon, tlat, th = target
    pts = spark.range(n_samples).select(
        F.col("id").cast("string").alias("sid"),
        (F.col("id") / F.lit(n_samples - 1)).alias("t"),
    ).select(
        "sid",
        "t",
        (F.lit(olon) + F.col("t") * F.lit(tlon - olon)).alias("lon"),
        (F.lit(olat) + F.col("t") * F.lit(tlat - olat)).alias("lat"),
    )
    ground = interpolate_at_points(
        blocks, pts, band=band, method="bilinear", id_col="sid"
    ).withColumnRenamed("value", "ground")
    prof = pts.join(ground, "sid")
    ends = prof.agg(
        F.min_by("ground", "t").alias("g0"), F.max_by("ground", "t").alias("g1")
    )
    out = prof.crossJoin(F.broadcast(ends)).select(
        F.col("sid").cast("long").alias("sid"),
        "t",
        "lon",
        "lat",
        "ground",
        (
            F.col("g0")
            + F.lit(oh)
            + F.col("t") * (F.col("g1") + F.lit(th) - F.col("g0") - F.lit(oh))
        ).alias("sightline"),
    )
    return out.withColumn(
        "blocked",
        (F.col("ground") > F.col("sightline"))
        & (F.col("t") > 0)
        & (F.col("t") < 1),
    )


def is_visible(
    blocks: DataFrame,
    observer: tuple[float, float, float],
    target: tuple[float, float, float],
    n_samples: int = 64,
    band: int = 1,
) -> bool:
    """GDALIsLineOfSightVisible boolean form."""
    prof = los_profile(blocks, observer, target, n_samples, band)
    # bounded-metadata: single aggregate row
    n_blocked = prof.agg(
        F.sum(F.col("blocked").cast("int")).alias("nb")
    ).collect()[0].nb  # bounded-metadata
    return int(n_blocked or 0) == 0
