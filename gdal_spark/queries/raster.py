"""Raster queries (SURVEY §2.9-2.10) over the analytic block fixture
`grad100` (value(x,y,band) = (x*7 + y*13 + band*17) % 256, 100×100×3,
blocked 32×32, georeferenced over New York ±2°).

Because the fixture is analytic, DuckDB reconstructs any pixel from
(x, y, band) with generate_series — giving true SQL oracles for
checksum, statistics, translate windows, as-features and zonal stats.
Tile pyramid and focal/DEM outputs are pinned by pytest goldens
(rows-only here): their resampling math has no SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import tables
from gdal_spark.raster import focal as RF
from gdal_spark.raster import model, ops
from gdal_spark.raster import tile as RT

W = H = 100
BANDS = 3

PIXELS_CTE = f"""
  select x.x as x, y.y as y, b.band as band,
         cast(({model.VALUE_SQL.format(x='x.x', y='y.y', band='b.band')})
              as double) as value
  from (select unnest(range({W})) as x) x
  cross join (select unnest(range({H})) as y) y
  cross join (select unnest(range(1, {BANDS + 1})) as band) b
"""


def _blocks(spark: SparkSession):
    return model.synth_blocks(spark, model.grad100_spec())


def _checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.checksum(_blocks(spark), width=W).withColumn(
        "dataset", F.lit("grad100")
    )


CHECKSUM_ORACLE = f"""
    with px as ({PIXELS_CTE})
    select 'grad100' as dataset, band,
           sum(cast(value as bigint) %
               (case (y * {W} + x) % 11
                  when 0 then 7 when 1 then 11 when 2 then 13 when 3 then 17
                  when 4 then 19 when 5 then 23 when 6 then 29 when 7 then 31
                  when 8 then 37 when 9 then 41 else 43 end)) % 65536
             as checksum
    from px group by band
"""


def _band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = ops.band_stats(_blocks(spark))
    return s.select(
        "dataset",
        "band",
        "cnt",
        "vmin",
        "vmax",
        "vsum",
        F.round("mean", 6).alias("mean"),
        F.round("stddev_pop", 6).alias("stddev_pop"),
    )


BAND_STATS_ORACLE = f"""
    with px as ({PIXELS_CTE})
    select 'grad100' as dataset, band,
           count(*) as cnt,
           min(value) as vmin,
           max(value) as vmax,
           sum(value) as vsum,
           round(avg(value), 6) as mean,
           round(stddev_pop(value), 6) as stddev_pop
    from px group by band
"""


SRCWIN = (10, 20, 50, 40)  # x, y, w, h


def _translate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ops.translate(
        _blocks(spark), SRCWIN, ot="int32", scale=(2.0, 1.0), bands=[1, 2]
    )
    s = ops.band_stats(t)
    return s.select(
        "band", "cnt", "vmin", "vmax", "vsum", F.round("mean", 6).alias("mean")
    )


TRANSLATE_ORACLE = f"""
    with px as ({PIXELS_CTE}),
    win as (
        select band, floor(value * 2.0 + 1.0 + 0.5) as v
        from px
        where band in (1, 2)
          and x >= {SRCWIN[0]} and x < {SRCWIN[0] + SRCWIN[2]}
          and y >= {SRCWIN[1]} and y < {SRCWIN[1] + SRCWIN[3]}
    )
    select band, count(*) as cnt, min(v) as vmin, max(v) as vmax,
           sum(v) as vsum, round(avg(v), 6) as mean
    from win group by band
"""


def _as_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = ops.as_features(_blocks(spark))
    return f.where("band = 1 and x < 8 and y < 8").select(
        "x",
        "y",
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        "value",
    )


def _gt() -> tuple[float, ...]:
    return model.grad100_spec().gt


def _as_features_oracle() -> str:
    gt = _gt()
    return f"""
    with px as ({PIXELS_CTE})
    select x, y,
           round({gt[0]!r} + (x + 0.5) * {gt[1]!r}, 6) as lon,
           round({gt[3]!r} + (y + 0.5) * {gt[5]!r}, 6) as lat,
           value
    from px where band = 1 and x < 8 and y < 8
"""


def _norm_diff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    nd = ops.pixel_function(
        _blocks(spark).where("band in (1, 2)"), "norm_diff"
    )
    s = ops.band_stats(nd)
    return s.select(
        "cnt",
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
        F.round("mean", 6).alias("mean"),
    )


NORM_DIFF_ORACLE = f"""
    with px as ({PIXELS_CTE}),
    wide as (
        select x, y,
               max(case when band = 1 then value end) as v1,
               max(case when band = 2 then value end) as v2
        from px where band in (1, 2) group by x, y
    ),
    nd as (
        select case when v1 + v2 = 0 then 0.0
                    else (v1 - v2) / (v1 + v2) end as v
        from wide
    )
    select count(*) as cnt,
           round(min(v), 6) as vmin,
           round(max(v), 6) as vmax,
           round(avg(v), 6) as mean
    from nd
"""


def _zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # zones: the two layer-A octagons centered on New York (city 0):
    # polygon 0 (r=0.35) and polygon 20 (r=0.35) are identical; use
    # polygon 0 and the bigger layer-B octagon 0 as distinct zones.
    zones = [
        (0, tables.polygon_rings_local(0)[:-1]),
        (1, tables.polygon_b_ring_local(0)),
    ]
    z = ops.zonal_stats(_blocks(spark), zones, band=1)
    return z.select(
        "zone_id", "cnt", "vsum", F.round("mean", 6).alias("mean"),
        "vmin", "vmax",
    )


def _zonal_hits_prefix() -> str:
    """Shared oracle CTE chain: pixel centers × zone edges → crossing
    parity (`hits` with zone_id, lon, lat, value, crossings)."""
    gt = _gt()
    octa = tables.polygon_rings_local(0)[:-1]
    octb = tables.polygon_b_ring_local(0)

    def edges_sql(zone_id: int, ring) -> str:
        rows = []
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            rows.append(
                f"select {zone_id} as zone_id, cast({x1!r} as double) as x1, "
                f"cast({y1!r} as double) as y1, cast({x2!r} as double) as x2, "
                f"cast({y2!r} as double) as y2"
            )
        return " union all ".join(rows)

    return f"""
    with px as ({PIXELS_CTE}),
    pts as (
        select value,
               {gt[0]!r} + (x + 0.5) * {gt[1]!r} as lon,
               {gt[3]!r} + (y + 0.5) * {gt[5]!r} as lat
        from px where band = 1
    ),
    e as ({edges_sql(0, octa)} union all {edges_sql(1, octb)}),
    hits as (
        select e.zone_id, p.lon, p.lat, p.value,
               sum(case when ((e.y1 > p.lat) <> (e.y2 > p.lat))
                         and (p.lon < (e.x2 - e.x1) * (p.lat - e.y1)
                                      / (e.y2 - e.y1) + e.x1)
                    then 1 else 0 end) as crossings
        from pts p join e on true
        group by e.zone_id, p.lon, p.lat, p.value
    )"""


def _zonal_oracle() -> str:
    return _zonal_hits_prefix() + """
    select zone_id, count(*) as cnt, sum(value) as vsum,
           round(avg(value), 6) as mean,
           min(value) as vmin, max(value) as vmax
    from hits where crossings % 2 = 1
    group by zone_id
"""


def _tile_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ pyramid z8→z6 of grad100 band 1 (rows-only; pinned by
    tests/test_tiles.py goldens + pyramid invariants)."""
    blocks = _blocks(spark).where("band = 1")
    t = RT.tile_pyramid(blocks, z_base=8, z_min=6, resampling="bilinear")
    return t.select("band", "z", "tile_x", "tile_y", "checksum")


def _hillshade_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEM hillshade block checksums (rows-only; analytic-plane goldens
    in tests/test_focal.py)."""
    blocks = model.synth_blocks(spark, model.plane_spec())
    hs = RF.focal(blocks, "hillshade")
    return ops.checksum(hs, width=60).select("dataset", "band", "checksum")


QUERIES = {
    "raster_checksum": _checksum,
    "raster_band_stats": _band_stats,
    "raster_translate_stats": _translate_stats,
    "raster_as_features": _as_features,
    "raster_norm_diff_stats": _norm_diff_stats,
    "raster_zonal_stats": _zonal,
    "raster_tile_pyramid": _tile_checksums,
    "raster_hillshade": _hillshade_checksums,
}

ORACLES = {
    "raster_checksum": CHECKSUM_ORACLE,
    "raster_band_stats": BAND_STATS_ORACLE,
    "raster_translate_stats": TRANSLATE_ORACLE,
    "raster_as_features": _as_features_oracle(),
    "raster_norm_diff_stats": NORM_DIFF_ORACLE,
    "raster_zonal_stats": _zonal_oracle(),
}


# --- gridding (points → raster) and rasterize (vector → raster) ---

from gdal_spark import portable  # noqa: E402
from gdal_spark.raster.grid import IDW_SMOOTH, CellGrid, grid_points, rasterize  # noqa: E402

# grid over the HOTTEST city of the skewed geocode (city 19, Jakarta —
# ~10% of pages) so the gridding aggregates see real point density
_CLAT, _CLON = portable.CITIES[19]
GRID = dict(minx=_CLON - 2.0, miny=_CLAT - 2.0, ncols=40, nrows=40, cell=0.1)
GRID_RADIUS = 0.25


def _grid_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW/average/nearest/data-metrics gridding of page points near NY
    (value = text length)."""
    g = CellGrid(
        GRID["minx"],
        GRID["miny"],
        GRID["minx"] + GRID["ncols"] * GRID["cell"],
        GRID["miny"] + GRID["nrows"] * GRID["cell"],
        GRID["ncols"],
        GRID["nrows"],
    )
    pts = (
        tables.geo_pages(spark, sf_dir)
        .selectExpr("lon", "lat", "cast(length(text) as double) as value")
        .where(
            f"lon >= {g.minx - GRID_RADIUS} and lon <= {g.maxx + GRID_RADIUS} "
            f"and lat >= {g.miny - GRID_RADIUS} and lat <= {g.maxy + GRID_RADIUS}"
        )
    )
    out = grid_points(pts, g, GRID_RADIUS)
    return out.select(
        "col",
        "row",
        "n",
        "vmin",
        "vmax",
        F.round("mean", 6).alias("mean"),
        F.round("idw", 6).alias("idw"),
        "nearest",
    )


def _grid_idw_oracle() -> str:
    from gdal_spark import portable as P

    g = GRID
    return f"""
    with pts as (
        select lon, lat, cast(length(text) as double) as value
        from ({P.geo_pages_cte('duckdb')})
    ),
    cells as (
        select c.col, r.row,
               {g['minx']!r} + (c.col + 0.5) * {g['cell']!r} as cx,
               {g['miny']!r} + (r.row + 0.5) * {g['cell']!r} as cy
        from (select unnest(range({g['ncols']})) as col) c
        cross join (select unnest(range({g['nrows']})) as row) r
    ),
    contrib as (
        select cells.col, cells.row, pts.value as v,
               (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat) as d2
        from cells join pts
          on (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat)
             <= {GRID_RADIUS * GRID_RADIUS!r}
    )
    select col, row, count(*) as n, min(v) as vmin, max(v) as vmax,
           round(avg(v), 6) as mean,
           round(sum(v / (d2 + {IDW_SMOOTH!r})) / sum(1.0 / (d2 + {IDW_SMOOTH!r})), 6)
             as idw,
           arg_min(v, d2) as nearest
    from contrib group by col, row
"""


def _rasterize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn layer-A octagons into the grad100 grid; pixel count per
    burned id (max-id merge where polygons overlap)."""
    polys = [
        (i, tables.polygon_rings_local(i)[:-1]) for i in range(25)
    ]
    burned = rasterize(_blocks(spark), polys)
    f = ops.as_features(burned)
    return (
        f.where("value >= 0")
        .groupBy(F.col("value").cast("long").alias("polygon_id"))
        .agg(F.count("*").alias("npixels"))
    )


def _rasterize_oracle() -> str:
    gt = _gt()
    octs = []
    for i in range(25):
        ring = tables.polygon_rings_local(i)[:-1]
        n = len(ring)
        for k in range(n):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % n]
            octs.append(
                f"select {i} as pid, cast({x1!r} as double) as x1, "
                f"cast({y1!r} as double) as y1, cast({x2!r} as double) as x2, "
                f"cast({y2!r} as double) as y2"
            )
    edges = " union all ".join(octs)
    return f"""
    with px as (
        select x.x as x, y.y as y,
               {gt[0]!r} + (x.x + 0.5) * {gt[1]!r} as lon,
               {gt[3]!r} + (y.y + 0.5) * {gt[5]!r} as lat
        from (select unnest(range({W})) as x) x
        cross join (select unnest(range({H})) as y) y
    ),
    e as ({edges}),
    hits as (
        select e.pid, p.x, p.y,
               sum(case when ((e.y1 > p.lat) <> (e.y2 > p.lat))
                         and (p.lon < (e.x2 - e.x1) * (p.lat - e.y1)
                                      / (e.y2 - e.y1) + e.x1)
                    then 1 else 0 end) as crossings
        from px p join e on true
        group by e.pid, p.x, p.y
    ),
    burned as (
        select x, y, max(pid) as polygon_id
        from hits where crossings % 2 = 1
        group by x, y
    )
    select polygon_id, count(*) as npixels
    from burned group by polygon_id
"""


QUERIES.update(
    {
        "vector_grid_idw": _grid_idw,
        "rasterize_counts": _rasterize_counts,
    }
)
ORACLES.update(
    {
        "vector_grid_idw": _grid_idw_oracle(),
        "rasterize_counts": _rasterize_oracle(),
    }
)


# --- point interpolation (InterpolateAtPoint / gdallocationinfo) ---

from gdal_spark.portable import hash64  # noqa: E402
from gdal_spark.raster.resample import interpolate_at_points  # noqa: E402


def _sample_points_sql(dialect: str) -> str:
    """500 deterministic probe points inside the grad100 extent (margin
    0.2° so no edge-clamp path): derived from document urls."""
    gt = _gt()
    h = hash64("url", dialect)
    u1 = f"(cast(({h}) % 100000 as double) / 100000.0)"
    u2 = f"(cast((({h}) // 271) % 100000 as double) / 100000.0)" if dialect == "duckdb" else \
         f"(cast((({h}) div 271) % 100000 as double) / 100000.0)"
    minx, w = gt[0] + 0.2, 100 * gt[1] - 0.4
    maxy, hgt = gt[3] - 0.2, 100 * (-gt[5]) - 0.4
    return (
        f"select url, ({minx!r} + {u1} * {w!r}) as lon, "
        f"({maxy!r} - {u2} * {hgt!r}) as lat "
        f"from ({{pages}}) p"
    )


def _point_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark import portable as P

    tables.register_views(spark, sf_dir)
    pts_sql = _sample_points_sql("spark").format(pages=P.pages_cte("spark"))
    pts = spark.sql(pts_sql).withColumnRenamed("url", "pid")
    out = interpolate_at_points(
        _blocks(spark), pts, band=1, method="bilinear", id_col="pid"
    )
    return out.select("pid", F.round("value", 6).alias("value"))


def _point_sample_oracle() -> str:
    from gdal_spark import portable as P

    gt = _gt()
    pts = _sample_points_sql("duckdb").format(pages=P.pages_cte("duckdb"))
    val = model.VALUE_SQL
    # mirror resample.sample(..., 'bilinear') exactly: clamp, floor,
    # neighbor fetch via the analytic formula, same multiply order
    return f"""
    with pts as ({pts}),
    s as (
        select url as pid,
               least(greatest((lon - {gt[0]!r}) / {gt[1]!r} - 0.5, 0), 99) as sx,
               least(greatest((lat - {gt[3]!r}) / {gt[5]!r} - 0.5, 0), 99) as sy
        from pts
    ),
    g as (
        select pid, sx, sy,
               cast(floor(sx) as bigint) as x0, cast(floor(sy) as bigint) as y0,
               least(cast(floor(sx) as bigint) + 1, 99) as x1,
               least(cast(floor(sy) as bigint) + 1, 99) as y1,
               sx - floor(sx) as wx, sy - floor(sy) as wy
        from s
    )
    select pid,
           round(
             cast({val.format(x='x0', y='y0', band='1')} as double) * (1 - wx) * (1 - wy)
           + cast({val.format(x='x1', y='y0', band='1')} as double) * wx * (1 - wy)
           + cast({val.format(x='x0', y='y1', band='1')} as double) * (1 - wx) * wy
           + cast({val.format(x='x1', y='y1', band='1')} as double) * wx * wy, 6)
             as value
    from g
"""


QUERIES["raster_point_sample"] = _point_sample
ORACLES["raster_point_sample"] = _point_sample_oracle()


# --- polygonize / sieve / contour (rows-only; pytest-golden pinned) ---

from gdal_spark.raster.contour import contour_segments  # noqa: E402
from gdal_spark.raster.polygonize import polygonize, sieve  # noqa: E402


def _polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected same-value plateau regions (per-block CCL + seam-edge
    merge via distributed connected components); rows-only check —
    region semantics pinned by tests/test_polygonize.py."""
    blocks = model.synth_blocks(spark, model.plateau_spec())
    return polygonize(blocks, width_full=48).orderBy("region_id")


def _sieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    blocks = model.synth_blocks(spark, model.plateau_spec())
    return sieve(blocks, width_full=48, threshold=70).orderBy("region_id")


def _contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour segments of the analytic plane,
    aggregated per level (rows-only; endpoint exactness pinned by
    tests/test_polygonize.py)."""
    blocks = model.synth_blocks(spark, model.plane_spec())
    segs = contour_segments(blocks, levels=[30.0, 60.0, 120.0], width=60, height=60)
    return segs.groupBy("level").agg(
        F.count("*").alias("n_segments"),
        F.round(F.min("x1"), 6).alias("min_x"),
        F.round(F.max("x1"), 6).alias("max_x"),
    )


QUERIES.update(
    {
        "raster_polygonize": _polygonize,
        "raster_sieve": _sieve,
        "raster_contour": _contour,
    }
)


# --- zonal mode / minority / unique ---

def _zonal_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    zones = [
        (0, tables.polygon_rings_local(0)[:-1]),
        (1, tables.polygon_b_ring_local(0)),
    ]
    return ops.zonal_mode_minority(_blocks(spark), zones, band=1)


def _zonal_mode_oracle() -> str:
    return _zonal_hits_prefix() + """,
    h as (
        select zone_id, value, count(*) as n
        from hits where crossings % 2 = 1
        group by zone_id, value
    ),
    m as (
        select zone_id, value as mode
        from h qualify row_number() over (partition by zone_id
                                          order by n desc, value asc) = 1
    ),
    mi as (
        select zone_id, value as minority
        from h qualify row_number() over (partition by zone_id
                                          order by n asc, value asc) = 1
    ),
    u as (select zone_id, count(*) as unique_values from h group by zone_id)
    select m.zone_id, m.mode, mi.minority, u.unique_values
    from m join mi on m.zone_id = mi.zone_id
    join u on m.zone_id = u.zone_id
    """


QUERIES["raster_zonal_mode"] = _zonal_mode
ORACLES["raster_zonal_mode"] = _zonal_mode_oracle()


# --- reproject / resize (gdal raster reproject, GDALWarp affine path) ---

from gdal_spark.raster.resample import reproject_grid  # noqa: E402


def _reproject_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grad100 band 1 resampled NEAREST onto a half-offset 50×50 grid at
    2× the pixel size; per-band stats. Nearest on the analytic fixture is
    exactly SQL-reconstructible: dst pixel (X,Y) samples src pixel
    (round(sx), round(sy))."""
    src = model.grad100_spec()
    dst = model.GridSpec(
        "grad50",
        50,
        50,
        (src.gt[0] + 0.02, 0.08, 0.0, src.gt[3] - 0.02, 0.0, -0.08),
        block=32,
        bands=1,
    )
    out = reproject_grid(
        model.synth_blocks(spark, src).where("band = 1"), dst, "nearest", band=1
    )
    s = ops.band_stats(out)
    return s.select("band", "cnt", "vmin", "vmax", "vsum")


def _reproject_oracle() -> str:
    # dst grid: gt0+0.02, px 0.08; src: gt0, px 0.04 →
    # sx = ((gt0+0.02 + (X+0.5)*0.08) - gt0)/0.04 - 0.5 = 2X + 1
    # sy likewise = 2Y + 1 → exact integers: nearest = value(2X+1, 2Y+1)
    val = model.VALUE_SQL.format(x="(2 * x.x + 1)", y="(2 * y.y + 1)", band="1")
    return f"""
    with px as (
        select cast(({val}) as double) as v
        from (select unnest(range(50)) as x) x
        cross join (select unnest(range(50)) as y) y
    )
    select 1 as band, count(*) as cnt, min(v) as vmin, max(v) as vmax,
           sum(v) as vsum
    from px
"""


QUERIES["raster_reproject_stats"] = _reproject_stats
ORACLES["raster_reproject_stats"] = _reproject_oracle()
