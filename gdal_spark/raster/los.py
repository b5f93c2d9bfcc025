"""Line-of-sight over the block table — alg/los.cpp
(GDALIsLineOfSightVisible) re-expressed on the distributed point
interpolator: sample the DEM along the observer→target segment with the
cogrouped block gather (resample.interpolate_at_points — no raster
collect), then compare each ground sample against the straight sight
line between the endpoint elevations.

The full viewshed (alg/viewshed/viewshed.cpp) is the R2 sector-sweep
below: the per-pixel ray dependency chain becomes one window function
per azimuth sector, and `max_dist` bounds the pixel fan-out to the
observer disc via metadata-level block pruning (roi_blocks).
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
        F.min_by("ground", "t").alias("g0"),
        F.max_by("ground", "t").alias("g1"),
        F.min("t").alias("tmin"),
        F.max("t").alias("tmax"),
    )
    # interpolate_at_points drops out-of-raster samples; if either endpoint
    # vanished the anchors would silently shift to the nearest surviving
    # sample and skew every sightline value (ADVICE r2). Guard lazily so
    # the job fails loudly instead.
    sight = (
        F.col("g0")
        + F.lit(oh)
        + F.col("t") * (F.col("g1") + F.lit(th) - F.col("g0") - F.lit(oh))
    )
    guarded = F.when(
        (F.col("tmin") == 0) & (F.col("tmax") == 1), sight
    ).otherwise(
        F.raise_error(
            F.lit(
                "los_profile: an endpoint fell outside the DEM "
                "(t=0 or t=1 sample dropped by interpolation)"
            )
        ).cast("double")
    )
    out = prof.crossJoin(F.broadcast(ends)).select(
        F.col("sid").cast("long").alias("sid"),
        "t",
        "lon",
        "lat",
        "ground",
        guarded.alias("sightline"),
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


def roi_blocks(
    blocks: DataFrame, lon: float, lat: float, max_dist: float
) -> DataFrame:
    """Metadata-level block pruning: keep only blocks whose world bbox
    intersects the disc of radius max_dist around (lon, lat). Pure
    Catalyst math over the 6-number geotransform + block offsets — no
    pixel is decoded for a pruned block, so the downstream pixel fan-out
    is O(max_dist^2 / pixel_area), not O(raster). Mirrors the reference's
    bounded-extent viewshed (alg/viewshed/viewshed.cpp MAXDIST).

    North-up grids only (gt2 = gt4 = 0, the block model's invariant);
    a rotated geotransform would need the 4-corner bbox instead."""
    rot = blocks.where(
        (F.col("gt2") != 0) | (F.col("gt4") != 0)
    ).limit(1).count()  # bounded-metadata: existence probe
    if rot:
        raise ValueError(
            "roi_blocks: rotated geotransform (gt2/gt4 != 0) unsupported"
        )
    lon_a = F.col("gt0") + F.col("x0") * F.col("gt1")
    lon_b = F.col("gt0") + (F.col("x0") + F.col("width")) * F.col("gt1")
    lat_a = F.col("gt3") + F.col("y0") * F.col("gt5")
    lat_b = F.col("gt3") + (F.col("y0") + F.col("height")) * F.col("gt5")
    # clamp-distance from the point to the bbox, axis-separable
    dx = F.greatest(
        F.least(lon_a, lon_b) - F.lit(lon),
        F.lit(lon) - F.greatest(lon_a, lon_b),
        F.lit(0.0),
    )
    dy = F.greatest(
        F.least(lat_a, lat_b) - F.lit(lat),
        F.lit(lat) - F.greatest(lat_a, lat_b),
        F.lit(0.0),
    )
    return blocks.where(dx * dx + dy * dy <= F.lit(float(max_dist) ** 2))


def viewshed(
    blocks: DataFrame,
    observer: tuple[float, float, float],
    n_sectors: int = 720,
    band: int = 1,
    max_dist: float | None = None,
    output_mode: str = "normal",
    allow_full_sweep: bool = False,
    pixel_budget: int = 16_000_000,
) -> DataFrame:
    """Distributed sector-sweep viewshed (alg/viewshed/viewshed.cpp role
    via the classic R2/XDraw-style angular discretization): every pixel
    computes (azimuth sector, distance, elevation angle from the
    observer) — pure Catalyst column math over the pixel table — then
    ONE window function per sector takes the running max elevation angle
    by distance; a pixel is visible iff its angle reaches the running
    max (ties = grazing → visible). One shuffle keyed by sector; the
    per-ray dependency chain that makes the reference's sweep
    single-machine becomes a Spark window ORDER BY.

    Accuracy is the standard R2 trade: rays are discretized to
    `n_sectors` azimuth bins; raise n_sectors for finer rays. Returns
    (x, y, dist, angle, sector, visible).

    Scale contract: pass `max_dist` on anything bigger than a fixture.
    Blocks outside the observer disc are pruned at the METADATA level
    (roi_blocks — no decode, no pixel rows), so the sector shuffle is
    O(max_dist²/pixel_area) regardless of raster extent; without it the
    whole raster becomes pixel rows (SURVEY §1.2's forbidden shape).
    A pixel beyond max_dist cannot occlude one inside it on the same
    ray, so the bounded result equals the full sweep cropped to the
    disc — same truncation the reference applies.

    The contract is ENFORCED (VERDICT r3 #3): with max_dist=None the
    pixel fan-out is estimated from block METADATA (sum of block
    width×height — no pixel row exists yet) and the call raises above
    `pixel_budget` unless `allow_full_sweep=True`. The reference bounds
    the sweep the same way (alg/viewshed/viewshed_types.h:68
    maxDistance).

    `output_mode` (alg/viewshed/viewshed_types.h:26–35,
    viewshed_executor.cpp:233–245,315–318):
    - "normal": (…, visible) — visibility only.
    - "dem":    adds dem_min — minimum ABSOLUTE elevation the cell
      needs to be visible: max(value, dfZ) where dfZ = z0 + occ·dist
      and occ is the max elevation angle over STRICTLY nearer pixels
      on the ray (the executor updates `cur = max(cur, dfZ)` after
      emitting the cell, so its occluder set is exclusive).
    - "ground": adds ground_min = max(0, dfZ − value) — minimum height
      ABOVE ground (executor: result base 0, += (dfZ − cur) if > 0).
    """
    from pyspark.sql.window import Window

    from gdal_spark.raster.ops import as_features

    if output_mode not in ("normal", "dem", "ground"):
        raise ValueError(f"viewshed: unknown output_mode {output_mode!r}")
    olon, olat, oh = observer
    src = blocks.where(F.col("band") == band)
    if max_dist is not None:
        src = roi_blocks(src, olon, olat, max_dist)
    elif not allow_full_sweep:
        est = src.agg(
            F.sum(F.col("width") * F.col("height")).alias("n")
        ).collect()[0].n  # bounded-metadata: one aggregate over block rows
        if est and int(est) > pixel_budget:
            raise ValueError(
                f"viewshed: ~{int(est):,} pixels would explode into rows "
                f"(budget {pixel_budget:,}); pass max_dist to bound the "
                "sweep to the observer disc (metadata-level block "
                "pruning), or allow_full_sweep=True to override"
            )
    px = as_features(src)
    two_pi = 6.283185307179586
    d = px.select(
        "x",
        "y",
        "value",
        (F.col("lon") - F.lit(olon)).alias("dx"),
        (F.col("lat") - F.lit(olat)).alias("dy"),
    ).select(
        "x",
        "y",
        "value",
        F.sqrt(F.col("dx") ** 2 + F.col("dy") ** 2).alias("dist"),
        F.floor(
            (F.atan2("dy", "dx") + F.lit(two_pi))
            % F.lit(two_pi)
            / F.lit(two_pi / n_sectors)
        ).cast("int").alias("sector"),
    )
    if max_dist is not None:
        d = d.where(F.col("dist") <= F.lit(float(max_dist)))
    # observer ground elevation: the pixel nearest the observer
    obs_z = d.orderBy("dist").limit(1).select(
        (F.col("value") + F.lit(oh)).alias("z0")
    )
    d = d.crossJoin(F.broadcast(obs_z)).where(F.col("dist") > 0)
    ang = d.withColumn(
        "angle", (F.col("value") - F.col("z0")) / F.col("dist")
    )
    # Two-phase EXACT decomposition of the per-sector running max
    # (identical result to one Window over `sector`, far better
    # parallelism at scale): distances bin into rings, so
    #   cmax(pixel) = max( max-angle over strictly-nearer rings,
    #                      running max within the pixel's own ring ).
    # Phase A runs on (sector, ring) partitions — n_sectors × n_rings
    # keys instead of n_sectors, so no reducer ever sorts a whole
    # sector. Phase B is a window over the TINY per-ring aggregate
    # (≤ sectors × rings rows), broadcast back. Equal distances land in
    # the same ring, so the RANGE-frame tie semantics are preserved
    # bit-for-bit.
    ring_width = F.lit(float(max_dist) / 64.0) if max_dist else F.lit(64.0)
    ang = ang.withColumn(
        "ring", F.floor(F.col("dist") / ring_width).cast("long")
    )
    w_in = (
        Window.partitionBy("sector", "ring")
        .orderBy("dist")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ang = ang.withColumn("wr_max", F.max("angle").over(w_in))
    ring_max = ang.groupBy("sector", "ring").agg(
        F.max("angle").alias("rmax")
    )
    w_rings = (
        Window.partitionBy("sector")
        .orderBy("ring")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = ring_max.withColumn(
        "prev_max", F.max("rmax").over(w_rings)
    ).select("sector", "ring", "prev_max")
    out = ang.join(F.broadcast(prefix), ["sector", "ring"]).withColumn(
        "cmax",
        F.greatest(
            F.col("wr_max"),
            F.coalesce(F.col("prev_max"), F.lit(float("-inf"))),
        ),
    )
    cols = [
        "x",
        "y",
        "dist",
        "angle",
        "sector",
        (F.col("angle") >= F.col("cmax")).alias("visible"),
    ]
    if output_mode != "normal":
        # Exclusive occluder max (strictly nearer pixels only): group
        # pixels at identical (sector, ring, dist), take the per-group
        # max angle, run the ROWS-framed window ending at -1 over the
        # distinct-dist rows (tiny — one row per distance step), and
        # join back. Combined with prev_max over strictly previous
        # rings this is exactly the executor's pre-update `cur`.
        w_d = (
            Window.partitionBy("sector", "ring")
            .orderBy("dist")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        excl = (
            ang.groupBy("sector", "ring", "dist")
            .agg(F.max("angle").alias("_gmax"))
            .withColumn("excl_ring", F.max("_gmax").over(w_d))
            .select("sector", "ring", "dist", "excl_ring")
        )
        out = out.join(excl, ["sector", "ring", "dist"])
        # occ = NULL means no nearer pixel: the cell is trivially
        # visible, dfZ degenerates to the cell's own elevation
        occ = F.greatest(F.col("excl_ring"), F.col("prev_max"))
        dfz = F.col("z0") + occ * F.col("dist")
        if output_mode == "dem":
            cols.append(
                F.greatest(
                    F.col("value"), F.coalesce(dfz, F.col("value"))
                ).alias("dem_min")
            )
        else:
            cols.append(
                F.greatest(
                    F.lit(0.0), F.coalesce(dfz - F.col("value"), F.lit(0.0))
                ).alias("ground_min")
            )
    return out.select(*cols)


def cumulative_viewshed(
    blocks: DataFrame,
    observers: list[tuple[float, float, float]],
    n_sectors: int = 720,
    band: int = 1,
    max_dist: float | None = None,
) -> DataFrame:
    """Observability heat map (alg/viewshed/cumulative.cpp role): run the
    sector-sweep viewshed once per observer and sum visibility per cell —
    (x, y, n_visible) where n_visible ∈ [0, len(observers)].

    The reference iterates observer grid cells on one machine and rolls
    results into a combiner queue (cumulative.cpp Cumulative::run); here
    each observer's sweep is an independent Spark job stage and the
    roll-up is ONE map-side-combined groupBy(x, y) over the unioned
    sweeps — observers scale out, not up. Every per-observer sweep keeps
    its own metadata ROI (max_dist disc), so total pixel fan-out is
    O(len(observers) · max_dist² / pixel_area), never O(raster) per
    observer."""
    if not observers:
        raise ValueError("cumulative_viewshed: empty observer list")
    per = [
        viewshed(
            blocks, obs, n_sectors=n_sectors, band=band, max_dist=max_dist
        ).select("x", "y", F.col("visible").cast("int").alias("v"))
        for obs in observers
    ]
    u = per[0]
    for p in per[1:]:
        u = u.unionByName(p)
    return u.groupBy("x", "y").agg(F.sum("v").alias("n_visible"))
