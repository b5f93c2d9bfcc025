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
           cast(sum(cast(value as bigint) %
               (case (y * {W} + x) % 11
                  when 0 then 7 when 1 then 11 when 2 then 13 when 3 then 17
                  when 4 then 19 when 5 then 23 when 6 then 29 when 7 then 31
                  when 8 then 37 when 9 then 41 else 43 end)) % 65536
                as bigint)
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


def _tile_checksums_geodetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WorldCRS84Quad pyramid z8→z6 of grad100 band 1 — the geodetic
    tiling scheme (gcore/tilematrixset.cpp:175-215, VERDICT r4 missing
    #1); oracle = independent inline plate-carree golden."""
    blocks = _blocks(spark).where("band = 1")
    t = RT.tile_pyramid(
        blocks, z_base=8, z_min=6, resampling="bilinear",
        scheme="WorldCRS84Quad",
    )
    return t.select("band", "z", "tile_x", "tile_y", "checksum")


def _tile_checksums_raster_scheme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--tiling-scheme raster pyramid of a 600×400 gradient: tiles in
    source pixel space, base zoom = exact pixel slices
    (gcore/tilematrixset.cpp:560-600 createRaster)."""
    spec = _grad600_spec()
    blocks = model.synth_blocks(spark, spec).where("band = 1")
    t = RT.raster_scheme_tiles(blocks, spec.width, spec.height)
    return t.select("band", "z", "tile_x", "tile_y", "checksum")


def _grad600_spec() -> model.GridSpec:
    """600×400 value-grid fixture — big enough that the raster scheme
    has 3 zoom levels (z2: 3×2 tiles, z1: 2×1, z0: 1×1)."""
    return model.GridSpec(
        "grad600", 600, 400, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        block=128, bands=1,
    )


def _tile_pyramid_geodetic_oracle() -> str:
    """Independent golden: plate-carree warp per tile + 2x2 average
    reductions, all formulas inline (floor-convention tile cover, no
    cellindex imports)."""
    spec = model.grad100_spec()
    gsrc = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    minx, miny, maxx, maxy = spec.extent()
    z = 8
    size = 180.0 / (2 ** z)  # tile span in degrees (top-origin XYZ grid)

    def ll_tile(lon, lat):
        return (
            int(np.floor((lon + 180.0) / size)),
            int(np.floor((90.0 - lat) / size)),
        )

    tx0, ty0 = ll_tile(minx, maxy)
    tx1, ty1 = ll_tile(maxx, miny)
    tiles: dict[tuple[int, int, int], np.ndarray] = {}
    for ty in range(ty0, ty1 + 1):
        for tx in range(tx0, tx1 + 1):
            res = size / 256.0
            lon = (-180.0 + tx * size) + (np.arange(256) + 0.5) * res
            lat = (90.0 - ty * size) - (np.arange(256) + 0.5) * res
            LON = np.repeat(lon[None, :], 256, 0)
            LAT = np.repeat(lat[:, None], 256, 1)
            sx = (LON - spec.gt[0]) / spec.gt[1] - 0.5
            sy = (LAT - spec.gt[3]) / spec.gt[5] - 0.5
            fx = np.clip(sx, 0, 99)
            fy = np.clip(sy, 0, 99)
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            x1 = np.minimum(x0 + 1, 99)
            y1 = np.minimum(y0 + 1, 99)
            wx = fx - x0
            wy = fy - y0
            v = (
                gsrc[y0, x0] * (1 - wx) * (1 - wy)
                + gsrc[y0, x1] * wx * (1 - wy)
                + gsrc[y1, x0] * (1 - wx) * wy
                + gsrc[y1, x1] * wx * wy
            )
            valid = (sx >= -0.5) & (sx <= 99.5) & (sy >= -0.5) & (sy <= 99.5)
            tiles[(z, tx, ty)] = np.clip(
                np.floor(np.where(valid, v, 0.0) + 0.5), 0, 255
            ).astype(np.uint8)
    for zz in (7, 6):
        parents: dict[tuple[int, int, int], np.ndarray] = {}
        children = {k: v for k, v in tiles.items() if k[0] == zz + 1}
        for (pz, ptx, pty) in {(zz, k[1] // 2, k[2] // 2) for k in children}:
            big = np.zeros((512, 512))
            for dy in range(2):
                for dx in range(2):
                    c = children.get((zz + 1, 2 * ptx + dx, 2 * pty + dy))
                    if c is not None:
                        big[dy*256:(dy+1)*256, dx*256:(dx+1)*256] = c
            red = big.reshape(256, 2, 256, 2).mean(axis=(1, 3))
            parents[(pz, ptx, pty)] = np.clip(
                np.floor(red + 0.5), 0, 255
            ).astype(np.uint8)
        tiles.update(parents)
    rows = [
        (1, zz, tx, ty, _ref_checksum_arr(arr))
        for (zz, tx, ty), arr in sorted(tiles.items())
    ]
    return _values_sql(rows, ["band", "z", "tile_x", "tile_y", "checksum"])


def _tile_pyramid_raster_scheme_oracle() -> str:
    """Independent golden for the pixel-space scheme: pad the source to
    tile multiples, slice, then 2x2-average down."""
    spec = _grad600_spec()
    g = model.value_grid(0, 0, spec.width, spec.height, 1).astype(np.float64)
    n_levels = 3  # 600x400 @ 256px tiles: z2 full-res, z1, z0
    z = n_levels - 1
    tiles: dict[tuple[int, int, int], np.ndarray] = {}
    nx = -(-spec.width // 256)
    ny = -(-spec.height // 256)
    pad = np.zeros((ny * 256, nx * 256))
    pad[: spec.height, : spec.width] = g
    for ty in range(ny):
        for tx in range(nx):
            tiles[(z, tx, ty)] = (
                pad[ty*256:(ty+1)*256, tx*256:(tx+1)*256].astype(np.uint8)
            )
    for zz in range(z - 1, -1, -1):
        parents: dict[tuple[int, int, int], np.ndarray] = {}
        children = {k: v for k, v in tiles.items() if k[0] == zz + 1}
        for (pz, ptx, pty) in {(zz, k[1] // 2, k[2] // 2) for k in children}:
            big = np.zeros((512, 512))
            for dy in range(2):
                for dx in range(2):
                    c = children.get((zz + 1, 2 * ptx + dx, 2 * pty + dy))
                    if c is not None:
                        big[dy*256:(dy+1)*256, dx*256:(dx+1)*256] = c
            red = big.reshape(256, 2, 256, 2).mean(axis=(1, 3))
            parents[(pz, ptx, pty)] = np.clip(
                np.floor(red + 0.5), 0, 255
            ).astype(np.uint8)
        tiles.update(parents)
    rows = [
        (1, zz, tx, ty, _ref_checksum_arr(arr))
        for (zz, tx, ty), arr in sorted(tiles.items())
    ]
    return _values_sql(rows, ["band", "z", "tile_x", "tile_y", "checksum"])


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
    "raster_tile_pyramid_geodetic": _tile_checksums_geodetic,
    "raster_tile_raster_scheme": _tile_checksums_raster_scheme,
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
    # stats over the crossing-point SET (both endpoints) — independent of
    # the saddle pairing convention, so the oracle needs no case table
    return segs.groupBy("level").agg(
        F.count("*").alias("n_segments"),
        F.round(F.min(F.least("x1", "x2")), 6).alias("min_x"),
        F.round(F.max(F.greatest("x1", "x2")), 6).alias("max_x"),
        F.round(F.sum(F.col("x1") + F.col("x2")), 4).alias("sum_x"),
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


# --- golden-literal oracles for the kernel queries ---------------------------
# The remaining queries' semantics aren't SQL-expressible (CCL, warp,
# stencils), so their oracles are literal golden tables computed at
# oracle-build time by INDEPENDENT single-machine numpy implementations
# (BFS flood fill vs the distributed min-label CCL; whole-array Horn vs
# the halo-exchange stencil; whole-raster warp vs the block-cover
# shuffle). The driver's value-hash compare then pins the distributed
# machinery against a second implementation, not against itself.

import numpy as np  # noqa: E402


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    def lit(v):
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"select * from (values {body}) as t({', '.join(cols)})"


def _flood_regions(a: np.ndarray) -> list[tuple]:
    """Independent CCL: BFS flood fill, region_id = min global pixel
    index (matches the distributed labeling convention by definition of
    the id, not by shared code)."""
    h, w = a.shape
    seen = np.zeros(a.shape, dtype=bool)
    out = []
    for sy in range(h):
        for sx in range(w):
            if seen[sy, sx]:
                continue
            val = a[sy, sx]
            stack = [(sy, sx)]
            seen[sy, sx] = True
            pix = []
            while stack:
                y, x = stack.pop()
                pix.append((y, x))
                for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] \
                            and a[ny, nx] == val:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            rid = min(y * w + x for y, x in pix)
            xs = [x for _, x in pix]
            ys = [y for y, _ in pix]
            out.append(
                (rid, float(val), len(pix), min(xs), min(ys), max(xs), max(ys))
            )
    return sorted(out)


def _polygonize_oracle() -> str:
    rows = _flood_regions(model.plateau_values(0, 0, 48, 48).astype(np.float64))
    return _values_sql(
        rows,
        ["region_id", "value", "n_pixels", "minx", "miny", "maxx", "maxy"],
    )


def _sieve_oracle(threshold: int = 70) -> str:
    rows = [
        (rid, val, n, n > threshold)
        for rid, val, n, *_ in _flood_regions(
            model.plateau_values(0, 0, 48, 48).astype(np.float64)
        )
    ]
    return _values_sql(rows, ["region_id", "value", "n_pixels", "keep"])


def _ref_checksum_arr(arr: np.ndarray) -> int:
    primes = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], np.int64)
    v = (
        np.floor(arr.astype(np.float64) + 0.5).astype(np.int64)
        if arr.dtype.kind == "f"
        else arr.astype(np.int64)
    ).ravel()
    idx = np.arange(v.size)
    return int((v % primes[idx % 11]).sum() & 0xFFFF)


def _hillshade_oracle() -> str:
    """Whole-array Horn hillshade (edge replicate) — no halo machinery."""
    z = model.plane_values(0, 0, 60, 60).astype(np.float64)
    pad = np.pad(z, 1, mode="edge")
    a, b, c = pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:]
    d, f = pad[1:-1, :-2], pad[1:-1, 2:]
    g, hh, i = pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
    dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / 8.0
    azr = np.radians(360.0 - 315.0 + 90.0)
    altr = np.radians(45.0)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    shade = np.clip(
        1.0
        + 254.0
        * (
            np.sin(altr) * np.cos(slope)
            + np.cos(altr) * np.sin(slope) * np.cos(azr - aspect)
        ),
        1.0,
        255.0,
    )
    cs = _ref_checksum_arr(shade)
    return _values_sql(
        [("plane60_hillshade", 1, cs)], ["dataset", "band", "checksum"]
    )


def _tile_pyramid_oracle() -> str:
    """Whole-raster warp per tile + 2x2 average reductions, INDEPENDENT
    of the engine: web-mercator forward/inverse and the bilinear gather
    are written inline from the published spherical-mercator formulas
    (no cellindex.tile / resample imports), vs the engine's cover-shuffle
    + mosaic machinery."""
    R = 6378137.0
    SHIFT = np.pi * R

    def ll_to_m(lon, lat):
        x = np.radians(lon) * R
        y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
        return x, y

    def m_to_ll(x, y):
        return np.degrees(x / R), np.degrees(np.arctan(np.sinh(y / R)))

    def ll_to_tile(lon, lat, z):
        size = 2.0 * SHIFT / (2**z)
        x, y = ll_to_m(np.asarray(lon), np.asarray(lat))
        return (
            np.floor((x + SHIFT) / size).astype(np.int64),
            np.floor((SHIFT - y) / size).astype(np.int64),
        )

    def bil(g, sx, sy):
        h, w = g.shape
        fx = np.clip(sx, 0, w - 1)
        fy = np.clip(sy, 0, h - 1)
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        wx = fx - x0
        wy = fy - y0
        return (
            g[y0, x0] * (1 - wx) * (1 - wy)
            + g[y0, x1] * wx * (1 - wy)
            + g[y1, x0] * (1 - wx) * wy
            + g[y1, x1] * wx * wy
        )

    spec = model.grad100_spec()
    gsrc = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    minx, miny, maxx, maxy = spec.extent()
    z = 8
    tx0, ty0 = ll_to_tile([minx], [maxy], z)
    tx1, ty1 = ll_to_tile([maxx], [miny], z)
    tiles: dict[tuple[int, int, int], np.ndarray] = {}
    for ty in range(int(ty0[0]), int(ty1[0]) + 1):
        for tx in range(int(tx0[0]), int(tx1[0]) + 1):
            size = 2.0 * SHIFT / (2**z)
            bminx = -SHIFT + tx * size
            bmaxy = SHIFT - ty * size
            res = size / 256.0
            pxs = bminx + (np.arange(256) + 0.5) * res
            pys = bmaxy - (np.arange(256) + 0.5) * res
            lon, lat = m_to_ll(
                np.repeat(pxs[None, :], 256, 0), np.repeat(pys[:, None], 256, 1)
            )
            sx = (lon - spec.gt[0]) / spec.gt[1] - 0.5
            sy = (lat - spec.gt[3]) / spec.gt[5] - 0.5
            v = bil(gsrc, sx, sy)
            valid = (sx >= -0.5) & (sx <= 99.5) & (sy >= -0.5) & (sy <= 99.5)
            arr = np.clip(
                np.floor(np.where(valid, v, 0.0) + 0.5), 0, 255
            ).astype(np.uint8)
            tiles[(z, tx, ty)] = arr
    # overview zooms via 2x2 average of up-to-4 children
    for zz in (7, 6):
        parents: dict[tuple[int, int, int], np.ndarray] = {}
        children = {k: v for k, v in tiles.items() if k[0] == zz + 1}
        pkeys = {(zz, k[1] // 2, k[2] // 2) for k in children}
        for (pz, ptx, pty) in pkeys:
            big = np.zeros((512, 512))
            for dy in range(2):
                for dx in range(2):
                    c = children.get((zz + 1, 2 * ptx + dx, 2 * pty + dy))
                    if c is not None:
                        big[dy*256:(dy+1)*256, dx*256:(dx+1)*256] = c
            red = big.reshape(256, 2, 256, 2).mean(axis=(1, 3))
            parents[(pz, ptx, pty)] = np.clip(
                np.floor(red + 0.5), 0, 255
            ).astype(np.uint8)
        tiles.update(parents)
    rows = [
        (1, zz, tx, ty, _ref_checksum_arr(arr))
        for (zz, tx, ty), arr in sorted(tiles.items())
    ]
    return _values_sql(rows, ["band", "z", "tile_x", "tile_y", "checksum"])


    """Whole-raster bilinear warp per tile + 2x2 average reductions —
    no cover shuffle / mosaic-assembly machinery."""
    from gdal_spark.cellindex.tile import (
        lonlat_to_tile,
        meters_to_lonlat,
        resolution,
        tile_bounds_3857,
    )
    from gdal_spark.raster.resample import sample

    spec = model.grad100_spec()
    gsrc = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    minx, miny, maxx, maxy = spec.extent()
    z = 8
    tx0, ty0 = lonlat_to_tile(np.array([minx]), np.array([maxy]), z)
    tx1, ty1 = lonlat_to_tile(np.array([maxx]), np.array([miny]), z)
    tiles: dict[tuple[int, int, int], np.ndarray] = {}
    for ty in range(int(ty0[0]), int(ty1[0]) + 1):
        for tx in range(int(tx0[0]), int(tx1[0]) + 1):
            bminx, bminy, bmaxx, bmaxy = tile_bounds_3857(
                np.array([tx]), np.array([ty]), z
            )
            res = resolution(z)
            pxs = bminx[0] + (np.arange(256) + 0.5) * res
            pys = bmaxy[0] - (np.arange(256) + 0.5) * res
            lon, lat = meters_to_lonlat(
                np.repeat(pxs[None, :], 256, 0), np.repeat(pys[:, None], 256, 1)
            )
            sx = (lon - spec.gt[0]) / spec.gt[1] - 0.5
            sy = (lat - spec.gt[3]) / spec.gt[5] - 0.5
            v = sample(gsrc, sx, sy, "bilinear")
            valid = (sx >= -0.5) & (sx <= 99.5) & (sy >= -0.5) & (sy <= 99.5)
            arr = np.clip(
                np.floor(np.where(valid, v, 0.0) + 0.5), 0, 255
            ).astype(np.uint8)
            tiles[(z, tx, ty)] = arr
    # overview zooms via 2x2 average of up-to-4 children
    for zz in (7, 6):
        parents: dict[tuple[int, int, int], np.ndarray] = {}
        children = {k: v for k, v in tiles.items() if k[0] == zz + 1}
        pkeys = {(zz, k[1] // 2, k[2] // 2) for k in children}
        for (pz, ptx, pty) in pkeys:
            big = np.zeros((512, 512))
            for dy in range(2):
                for dx in range(2):
                    c = children.get((zz + 1, 2 * ptx + dx, 2 * pty + dy))
                    if c is not None:
                        big[dy*256:(dy+1)*256, dx*256:(dx+1)*256] = c
            red = big.reshape(256, 2, 256, 2).mean(axis=(1, 3))
            parents[(pz, ptx, pty)] = np.clip(
                np.floor(red + 0.5), 0, 255
            ).astype(np.uint8)
        tiles.update(parents)
    rows = [
        (1, zz, tx, ty, _ref_checksum_arr(arr))
        for (zz, tx, ty), arr in sorted(tiles.items())
    ]
    return _values_sql(rows, ["band", "z", "tile_x", "tile_y", "checksum"])


ORACLES.update(
    {
        "raster_polygonize": _polygonize_oracle(),
        "raster_sieve": _sieve_oracle(),
        "raster_hillshade": _hillshade_oracle(),
        "raster_tile_pyramid": _tile_pyramid_oracle(),
        "raster_tile_pyramid_geodetic": _tile_pyramid_geodetic_oracle(),
        "raster_tile_raster_scheme": _tile_pyramid_raster_scheme_oracle(),
    }
)


def _contour_oracle() -> str:
    """Whole-array marching squares golden, INDEPENDENT of the engine:
    no case table, no engine imports — a contour crosses a cell edge iff
    its two corner pixels straddle the level, the crossing point is the
    inline linear interpolation, and per-level stats are taken over the
    crossing-point SET (2 per normal cell, 4 per saddle), which every
    correct marching-squares implementation must produce regardless of
    its saddle pairing convention (alg/marching_squares/square.h)."""
    z = model.plane_values(0, 0, 60, 60).astype(np.float64)
    levels = [30.0, 60.0, 120.0]
    rows = []
    tl = z[:-1, :-1]
    tr = z[:-1, 1:]
    bl = z[1:, :-1]
    br = z[1:, 1:]
    ys, xs = np.mgrid[0 : z.shape[0] - 1, 0 : z.shape[1] - 1]
    for level in levels:
        a, b, c, d = tl >= level, tr >= level, br >= level, bl >= level

        def t_of(va, vb):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (level - va) / (vb - va)
            return np.clip(t, 0.0, 1.0)

        cross_x = []
        # top edge: TL vs TR straddle -> x = cx + t
        m = a != b
        cross_x.append(xs[m] + t_of(tl, tr)[m])
        # bottom edge: BL vs BR
        m = d != c
        cross_x.append(xs[m] + t_of(bl, br)[m])
        # left edge: TL vs BL -> x = cx
        m = a != d
        cross_x.append(xs[m].astype(np.float64))
        # right edge: TR vs BR -> x = cx + 1
        m = b != c
        cross_x.append(xs[m] + 1.0)
        allx = np.concatenate(cross_x)
        rows.append(
            (
                level,
                int(len(allx) // 2),
                round(float(allx.min()), 6),
                round(float(allx.max()), 6),
                round(float(allx.sum()), 4),
            )
        )
    return _values_sql(
        rows, ["level", "n_segments", "min_x", "max_x", "sum_x"]
    )


ORACLES["raster_contour"] = _contour_oracle()


# --- full warp kernel family (alg/gdalwarper.h:35-67, dispatch ---------------
# alg/gdalwarpkernel.cpp:170-196): area kernels average/sum/rms/min/max/
# med/q1/q3/mode on an aligned 2x downsample (every dst pixel reduces an
# exact 2x2 source window -> pure-SQL oracle), and the pointwise
# cubicspline/lanczos kernels on a quarter-offset grid (constant
# fractional phase 0.75 -> literal-weight oracle, weights derived from
# the published B-spline / windowed-sinc formulas with math.sin,
# independent of the numpy engine path).

from gdal_spark.raster.resample import AREA_METHODS as _AREA_KERNELS  # noqa: E402


def _int_src_spec() -> model.GridSpec:
    # binary-exact geotransform so kernel phases are exact (0.25/0.75)
    return model.GridSpec(
        "g100i", 100, 100, (0.0, 1.0, 0.0, 100.0, 0.0, -1.0), block=32, bands=1
    )


def _warp_area_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.resample import reproject_grid as _rg

    src = _int_src_spec()
    dst = model.GridSpec(
        "g50a", 50, 50, (0.0, 2.0, 0.0, 100.0, 0.0, -2.0), block=32, bands=1
    )
    blocks = model.synth_blocks(spark, src).where("band = 1")
    out = None
    for m in _AREA_KERNELS:
        o = _rg(blocks, dst, m, band=1)
        f = ops.as_features(o).select(
            F.lit(m).alias("kernel"),
            "x",
            "y",
            F.round("value", 6).alias("value"),
        )
        out = f if out is None else out.unionByName(f)
    return out


def _warp_area_oracle() -> str:
    def val(dx, dy):
        return (
            "cast(("
            + model.VALUE_SQL.format(
                x=f"(2 * x.x + {dx})", y=f"(2 * y.y + {dy})", band="1"
            )
            + ") as double)"
        )

    a, b, c, d = val(0, 0), val(1, 0), val(0, 1), val(1, 1)
    return f"""
    with q as (
      select x.x, y.y, {a} as a, {b} as b, {c} as c, {d} as d
      from (select unnest(range(50)) as x) x
      cross join (select unnest(range(50)) as y) y
    ),
    s as (
      select x, y, a, b, c, d,
             least(a, b, c, d) as v1,
             least(greatest(a, b), greatest(a, c), greatest(a, d),
                   greatest(b, c), greatest(b, d), greatest(c, d)) as v2,
             greatest(least(a, b), least(a, c), least(a, d),
                      least(b, c), least(b, d), least(c, d)) as v3,
             greatest(a, b, c, d) as v4
      from q
    ),
    k as (
      select x, y,
             (a + b + c + d) / 4.0 as average,
             (a + b + c + d) as vsum,
             sqrt((a * a + b * b + c * c + d * d) / 4.0) as rms,
             v1 as vmin, v4 as vmax,
             (v2 + v3) / 2.0 as med,
             v1 + 0.75 * (v2 - v1) as q1,
             v3 + 0.25 * (v4 - v3) as q3,
             case when v1 = v2 and v2 = v3 then v1
                  when v2 = v3 and v3 = v4 then v2
                  when v1 = v2 then v1
                  when v2 = v3 then v2
                  when v3 = v4 then v3
                  else v1 end as vmode
      from s
    )
    select kernel, x, y, round(v, 6) as value from (
      select 'average' as kernel, x, y, average as v from k
      union all select 'sum', x, y, vsum from k
      union all select 'rms', x, y, rms from k
      union all select 'min', x, y, vmin from k
      union all select 'max', x, y, vmax from k
      union all select 'med', x, y, med from k
      union all select 'q1', x, y, q1 from k
      union all select 'q3', x, y, q3 from k
      union all select 'mode', x, y, vmode from k
    )
    """


QUERIES["raster_warp_area_kernels"] = _warp_area_kernels
ORACLES["raster_warp_area_kernels"] = _warp_area_oracle()


def _warp_spline_lanczos(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.resample import reproject_grid as _rg

    src = _int_src_spec()
    dst = model.GridSpec(
        "g50s", 50, 50, (0.25, 2.0, 0.0, 99.75, 0.0, -2.0), block=32, bands=1
    )
    blocks = model.synth_blocks(spark, src).where("band = 1")
    out = None
    for m in ("cubicspline", "lanczos"):
        o = _rg(blocks, dst, m, band=1)
        f = (
            ops.as_features(o)
            .where("x between 1 and 48 and y between 1 and 48")
            .select(
                F.lit(m).alias("kernel"),
                "x",
                "y",
                F.round("value", 6).alias("value"),
            )
        )
        out = f if out is None else out.unionByName(f)
    return out


def _spline_w075() -> list[tuple[int, float]]:
    # cubic B-spline weights at phase t = 0.75, offsets -1..2:
    # w(|t - i|) with w(x) = (4 - 6x^2 + 3x^3)/6 for x<1, (2-x)^3/6 for x<2
    out = []
    for i in (-1, 0, 1, 2):
        x = abs(0.75 - i)
        w = (4 - 6 * x * x + 3 * x**3) / 6 if x < 1 else (2 - x) ** 3 / 6
        out.append((i, w))
    return out


def _lanczos_w075() -> list[tuple[int, float]]:
    import math

    r = 3
    ws = []
    for i in range(-r + 1, r + 1):
        x = 0.75 - i
        ws.append(
            (
                i,
                r
                * math.sin(math.pi * x)
                * math.sin(math.pi * x / r)
                / (math.pi**2 * x**2),
            )
        )
    tot = ws[0][1]
    for _, w in ws[1:]:
        tot = tot + w
    return [(i, w / tot) for i, w in ws]


def _sep_kernel_sql(name: str, weights: list[tuple[int, float]]) -> str:
    def val(dx, dy):
        return (
            "cast(("
            + model.VALUE_SQL.format(
                x=f"(2 * x.x + {dx})", y=f"(2 * y.y + {dy})", band="1"
            )
            + ") as double)"
        )

    # mirror the engine's separable accumulation order exactly:
    # out = sum_j wj * (sum_i wi * v(x0+i, y0+j)), left-assoc
    rows = []
    for j, wj in weights:
        inner = " + ".join(f"{wi!r} * {val(i, j)}" for i, wi in weights)
        rows.append(f"{wj!r} * ({inner})")
    expr = " + ".join(rows)
    return f"""
      select '{name}' as kernel, x.x as x, y.y as y,
             round({expr}, 6) as value
      from (select unnest(range(1, 49)) as x) x
      cross join (select unnest(range(1, 49)) as y) y
    """


def _warp_spline_oracle() -> str:
    return (
        _sep_kernel_sql("cubicspline", _spline_w075())
        + " union all "
        + _sep_kernel_sql("lanczos", _lanczos_w075())
    )


QUERIES["raster_warp_spline_lanczos"] = _warp_spline_lanczos
ORACLES["raster_warp_spline_lanczos"] = _warp_spline_oracle()


# --- arbitrary-CRS reprojection: UTM zone 18N (alg/gdaltransformer.cpp:96 ---
# chain analog; ogr/ogrct.cpp:665). Engine path: Krüger-series transverse
# mercator (geometry/proj.py) inside the reproject cover shuffle. Oracle:
# golden literal computed with the INDEPENDENT Snyder 1987 series
# (Working Manual eqs. 8-17..8-25 inverse) — two different published
# formulations agreeing through NEAREST quantization (src px 0.04° ≈
# 4.4 km vs inter-series delta < 1 mm).

_UTM_DST = (340000.0, 8000.0, 0.0, 4680000.0, 0.0, -8000.0)
_UTM_W = _UTM_H = 40


def _reproject_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    from gdal_spark.geometry.proj import tm_forward, tm_inverse
    from gdal_spark.raster.resample import reproject_grid as _rg

    src = model.grad100_spec()
    dst = model.GridSpec(
        "utm18", _UTM_W, _UTM_H, _UTM_DST, block=32, bands=1
    )
    out = _rg(
        model.synth_blocks(spark, src).where("band = 1"),
        dst,
        "nearest",
        band=1,
        world_to_dst=functools.partial(tm_forward, lon0=-75.0),
        dst_to_world=functools.partial(tm_inverse, lon0=-75.0),
    )
    return ops.as_features(out).select("x", "y", "value")


def _snyder_tm_inverse(E, N, lon0):
    """Snyder 1987 TM inverse (eqs. 8-17..8-25), WGS84 — independent of
    the engine's Krüger series."""
    import numpy as np

    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    x = np.asarray(E, dtype=np.float64) - 500000.0
    M = np.asarray(N, dtype=np.float64) / k0
    mu = M / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    C1 = ep2 * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = a / np.sqrt(1 - e2 * np.sin(phi1) ** 2)
    R1 = a * (1 - e2) / (1 - e2 * np.sin(phi1) ** 2) ** 1.5
    D = x / (N1 * k0)
    phi = phi1 - (N1 * np.tan(phi1) / R1) * (
        D**2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2)
        * D**6
        / 720
    )
    lam = (
        D
        - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2)
        * D**5
        / 120
    ) / np.cos(phi1)
    return np.degrees(lam) + lon0, np.degrees(phi)


def _reproject_utm_oracle() -> str:
    import numpy as np

    src = model.grad100_spec()
    g = src.gt
    ys, xs = np.mgrid[0:_UTM_H, 0:_UTM_W]
    E = _UTM_DST[0] + (xs + 0.5) * _UTM_DST[1]
    N = _UTM_DST[3] + (ys + 0.5) * _UTM_DST[5]
    lon, lat = _snyder_tm_inverse(E, N, -75.0)
    sx = (lon - g[0]) / g[1] - 0.5
    sy = (lat - g[3]) / g[5] - 0.5
    ix = np.round(np.clip(sx, 0, 99)).astype(np.int64)
    iy = np.round(np.clip(sy, 0, 99)).astype(np.int64)
    val = ((ix * 7 + iy * 13 + 1 * 17) % 256).astype(np.float64)
    inb = (sx >= -0.5) & (sx <= 99.5) & (sy >= -0.5) & (sy <= 99.5)
    val = np.where(inb, val, 0.0)
    rows = [
        (int(x), int(y), float(v))
        for x, y, v in zip(xs.ravel(), ys.ravel(), val.ravel())
    ]
    return _values_sql(rows, ["x", "y", "value"]) + """
    """


QUERIES["raster_reproject_utm"] = _reproject_utm
ORACLES["raster_reproject_utm"] = _reproject_utm_oracle()


# --- Lambert conformal conic warp (VERDICT r2 missing #4) --------------------
# PROJ's second workhorse after TM; the reference reaches it through the
# PROJ pipeline (alg/gdaltransformer.cpp:96 GenImgProj chain). Engine:
# Snyder 2SP with ITERATIVE latitude inversion (geometry/proj.py
# lcc_inverse); oracle: the same projection with the SERIES latitude
# recovery (Snyder eq. 3-5 in conformal latitude) — an independent
# inversion path, so agreement is evidence, not tautology.

# parallels bracketing grad100's lat span (38.7..42.7), origin at NY
_LCC_PAR = (39.0, 42.0, 40.0, -74.0)  # lat1, lat2, lat0, lon0
_LCC_DST = (-163000.0, 8000.0, 0.0, 157000.0, 0.0, -8000.0)
_LCC_W = _LCC_H = 40


def _reproject_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    from gdal_spark.geometry.proj import lcc_forward, lcc_inverse
    from gdal_spark.raster.resample import reproject_grid as _rg

    src = model.grad100_spec()
    dst = model.GridSpec("lcc", _LCC_W, _LCC_H, _LCC_DST, block=32, bands=1)
    la1, la2, la0, lo0 = _LCC_PAR
    out = _rg(
        model.synth_blocks(spark, src).where("band = 1"),
        dst,
        "nearest",
        band=1,
        world_to_dst=functools.partial(
            lcc_forward, lat1=la1, lat2=la2, lat0=la0, lon0=lo0
        ),
        dst_to_world=functools.partial(
            lcc_inverse, lat1=la1, lat2=la2, lat0=la0, lon0=lo0
        ),
    )
    return ops.as_features(out).select("x", "y", "value")


def _snyder_lcc_inverse_series(x, y, lat1, lat2, lat0, lon0):
    """Snyder LCC inverse with SERIES latitude recovery (eqs. 15-8..15-11
    then 3-5: φ = χ + c2 sin2χ + c4 sin4χ + ... in conformal latitude) —
    independent of the engine's fixed-point iteration."""
    import numpy as np

    a = 6378137.0
    f = 1 / 298.257223563
    e = np.sqrt(f * (2 - f))

    def m(p):
        return np.cos(p) / np.sqrt(1 - (e * np.sin(p)) ** 2)

    def t(p):
        es = e * np.sin(p)
        return np.tan(np.pi / 4 - p / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    Fc = m(p1) / (n * t(p1) ** n)
    rho0 = a * Fc * t(p0) ** n
    xp = np.asarray(x, np.float64)
    yp = rho0 - np.asarray(y, np.float64)
    rho = np.sign(n) * np.hypot(xp, yp)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    tt = (rho / (a * Fc)) ** (1 / n)
    chi = np.pi / 2 - 2 * np.arctan(tt)
    e2 = e * e
    phi = (
        chi
        + (e2 / 2 + 5 * e2**2 / 24 + e2**3 / 12 + 13 * e2**4 / 360)
        * np.sin(2 * chi)
        + (7 * e2**2 / 48 + 29 * e2**3 / 240 + 811 * e2**4 / 11520)
        * np.sin(4 * chi)
        + (7 * e2**3 / 120 + 81 * e2**4 / 1120) * np.sin(6 * chi)
        + (4279 * e2**4 / 161280) * np.sin(8 * chi)
    )
    return np.degrees(theta / n) + lon0, np.degrees(phi)


def _reproject_lcc_oracle() -> str:
    import numpy as np

    src = model.grad100_spec()
    g = src.gt
    ys, xs = np.mgrid[0:_LCC_H, 0:_LCC_W]
    E = _LCC_DST[0] + (xs + 0.5) * _LCC_DST[1]
    N = _LCC_DST[3] + (ys + 0.5) * _LCC_DST[5]
    lon, lat = _snyder_lcc_inverse_series(E, N, *_LCC_PAR)
    sx = (lon - g[0]) / g[1] - 0.5
    sy = (lat - g[3]) / g[5] - 0.5
    ix = np.round(np.clip(sx, 0, 99)).astype(np.int64)
    iy = np.round(np.clip(sy, 0, 99)).astype(np.int64)
    val = ((ix * 7 + iy * 13 + 1 * 17) % 256).astype(np.float64)
    inb = (sx >= -0.5) & (sx <= 99.5) & (sy >= -0.5) & (sy <= 99.5)
    val = np.where(inb, val, 0.0)
    rows = [
        (int(x), int(y), float(v))
        for x, y, v in zip(xs.ravel(), ys.ravel(), val.ravel())
    ]
    return _values_sql(rows, ["x", "y", "value"])


QUERIES["raster_reproject_lcc"] = _reproject_lcc
ORACLES["raster_reproject_lcc"] = _reproject_lcc_oracle()


# --- expression dialect + completed pixel-function registry ------------------
# raster_calc_expression: free-form muparser-analog expression
# (apps/gdalalg_raster_calc.cpp:904-911) parsed by gdal_spark.raster.calc
# (no python eval), evaluated per block; oracle = the SAME arithmetic
# written directly in SQL over the analytic band formulas.
# raster_pixel_functions: 8 of the newly-completed registry names
# (frmts/vrt/pixelfunctions.cpp:4370-4457) on a 30x30 window, per-pixel
# rows, SQL oracle (integer-exact fixtures).

_CALC_EXPR = "(b1 + 2*b2 + b3) % 256 + where(b1 > b2, 1, 0) + sqrt(b1)"


def _calc_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.calc import calc

    out = calc(_blocks(spark), _CALC_EXPR)
    return (
        ops.as_features(out)
        .where("x < 40 and y < 40")
        .select("x", "y", F.round("value", 6).alias("value"))
    )


def _calc_expression_oracle() -> str:
    def val(b):
        return (
            "cast(("
            + model.VALUE_SQL.format(x="x.x", y="y.y", band=str(b))
            + ") as double)"
        )

    v1, v2, v3 = val(1), val(2), val(3)
    return f"""
    select x.x as x, y.y as y,
           round(({v1} + 2 * {v2} + {v3}) % 256
                 + (case when {v1} > {v2} then 1 else 0 end)
                 + sqrt({v1}), 6) as value
    from (select unnest(range(40)) as x) x
    cross join (select unnest(range(40)) as y) y
    """


QUERIES["raster_calc_expression"] = _calc_expression
ORACLES["raster_calc_expression"] = _calc_expression_oracle()


_PF_CASES = [
    ("median", {}),
    ("argmin", {}),
    ("argmax", {}),
    ("mode", {}),
    ("quantile", {"q": 0.25}),
    ("pow", {"power": 2.0}),
    ("scale", {"scale": 2.0, "offset": 1.0}),
    ("interpolate_linear", {"t": 0.25, "t0": 0.0, "t1": 1.0}),
]


def _pixel_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    blocks = _blocks(spark)
    for name, params in _PF_CASES:
        o = ops.pixel_function(blocks, name, params)
        f = (
            ops.as_features(o)
            .where("x < 30 and y < 30")
            .select(
                F.lit(name).alias("func"),
                "x",
                "y",
                F.round("value", 6).alias("value"),
            )
        )
        out = f if out is None else out.unionByName(f)
    return out


def _pixel_functions_oracle() -> str:
    def val(b):
        return (
            "cast(("
            + model.VALUE_SQL.format(x="x.x", y="y.y", band=str(b))
            + ") as double)"
        )

    v1, v2, v3 = val(1), val(2), val(3)
    return f"""
    with q as (
      select x.x as x, y.y as y, {v1} as v1, {v2} as v2, {v3} as v3
      from (select unnest(range(30)) as x) x
      cross join (select unnest(range(30)) as y) y
    ),
    s as (
      select x, y, v1, v2, v3,
             least(v1, v2, v3) as s1,
             v1 + v2 + v3 - least(v1, v2, v3) - greatest(v1, v2, v3) as s2,
             greatest(v1, v2, v3) as s3
      from q
    )
    select func, x, y, round(v, 6) as value from (
      select 'median' as func, x, y, s2 as v from s
      union all
      select 'argmin', x, y,
             case when v1 <= v2 and v1 <= v3 then 1.0
                  when v2 <= v3 then 2.0 else 3.0 end from s
      union all
      select 'argmax', x, y,
             case when v1 >= v2 and v1 >= v3 then 1.0
                  when v2 >= v3 then 2.0 else 3.0 end from s
      union all
      select 'mode', x, y,
             case when s1 = s2 then s1 when s2 = s3 then s2 else s1 end
      from s
      union all
      select 'quantile', x, y, s1 + 0.5 * (s2 - s1) from s
      union all
      select 'pow', x, y, v1 * v1 from s
      union all
      select 'scale', x, y, v1 * 2.0 + 1.0 from s
      union all
      select 'interpolate_linear', x, y, v1 + (v2 - v1) * 0.25 from s
    )
    """


QUERIES["raster_pixel_functions"] = _pixel_functions
ORACLES["raster_pixel_functions"] = _pixel_functions_oracle()


# --- zonal inclusion modes + weighted stats + argmin/argmax ------------------
# (alg/zonal.cpp:2079-2110). Fixture zones are axis-aligned rects with
# FRACTIONAL-pixel edges, so DEFAULT / ALL_TOUCHED membership and the
# exact coverage fraction are interval arithmetic in SQL, while the
# engine computes them geometrically (ray-cast + Sutherland-Hodgman
# pixel clips) in world coordinates — two independent constructions.

_ZONES_PX = [
    # zone_id, x0, x1, y0, y1 (pixel units, never .0/.5 edges)
    (1, 10.3, 25.7, 40.2, 55.8),
    (2, 60.25, 80.75, 10.6, 30.4),
    (3, 5.45, 9.55, 70.25, 90.75),
]


def _zonal_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from gdal_spark.raster.ops import zonal_stats_ext

    g = _gt()
    zones = []
    for zid, x0, x1, y0, y1 in _ZONES_PX:
        wx0, wx1 = g[0] + x0 * g[1], g[0] + x1 * g[1]
        wy0, wy1 = g[3] + y0 * g[5], g[3] + y1 * g[5]
        ring = np.array(
            [[wx0, wy0], [wx1, wy0], [wx1, wy1], [wx0, wy1]], dtype=np.float64
        )
        zones.append((zid, ring))
    out = None
    for mode in ("default", "all_touched", "fractional"):
        s = zonal_stats_ext(_blocks(spark), zones, band=1, inclusion=mode)
        s = s.select(
            F.lit(mode).alias("mode"),
            "zone_id",
            F.round("cnt", 4).alias("cnt"),
            F.round("vsum", 4).alias("vsum"),
            F.round("mean", 4).alias("mean"),
            "vmin",
            "vmax",
            "argmin_x",
            "argmin_y",
            "argmax_x",
            "argmax_y",
        )
        out = s if out is None else out.unionByName(s)
    return out


def _zonal_ext_oracle() -> str:
    val = model.VALUE_SQL.format(x="x.x", y="y.y", band="1")
    zvals = ",\n      ".join(
        f"({zid}, {x0!r}, {x1!r}, {y0!r}, {y1!r})"
        for zid, x0, x1, y0, y1 in _ZONES_PX
    )
    return f"""
    with px as (
      select x.x as x, y.y as y, cast(({val}) as double) as v
      from (select unnest(range(100)) as x) x
      cross join (select unnest(range(100)) as y) y
    ),
    z(zone_id, zx0, zx1, zy0, zy1) as (values
      {zvals}
    ),
    m(mode) as (values ('default'), ('all_touched'), ('fractional')),
    w as (
      select m.mode, z.zone_id, p.x, p.y, p.v,
        case m.mode
          when 'default' then
            case when p.x + 0.5 > z.zx0 and p.x + 0.5 < z.zx1
                  and p.y + 0.5 > z.zy0 and p.y + 0.5 < z.zy1
                 then 1.0 else 0.0 end
          when 'all_touched' then
            case when p.x + 1 > z.zx0 and p.x < z.zx1
                  and p.y + 1 > z.zy0 and p.y < z.zy1
                 then 1.0 else 0.0 end
          else
            greatest(0.0, least(p.x + 1.0, z.zx1) - greatest(cast(p.x as double), z.zx0))
            * greatest(0.0, least(p.y + 1.0, z.zy1) - greatest(cast(p.y as double), z.zy0))
        end as wgt
      from px p cross join z cross join m
    ),
    inc as (select * from w where wgt > 0),
    agg as (
      select mode, zone_id,
             round(sum(wgt), 4) as cnt,
             round(sum(wgt * v), 4) as vsum,
             round(sum(wgt * v) / sum(wgt), 4) as mean,
             min(v) as vmin, max(v) as vmax
      from inc group by mode, zone_id
    ),
    amin as (
      select mode, zone_id, x as argmin_x, y as argmin_y
      from (select *, row_number() over (partition by mode, zone_id
                                         order by v, y, x) as rn from inc)
      where rn = 1
    ),
    amax as (
      select mode, zone_id, x as argmax_x, y as argmax_y
      from (select *, row_number() over (partition by mode, zone_id
                                         order by v desc, y, x) as rn from inc)
      where rn = 1
    )
    select a.mode, a.zone_id, a.cnt, a.vsum, a.mean, a.vmin, a.vmax,
           n.argmin_x, n.argmin_y, x.argmax_x, x.argmax_y
    from agg a
    join amin n on n.mode = a.mode and n.zone_id = a.zone_id
    join amax x on x.mode = a.mode and x.zone_id = a.zone_id
    """


QUERIES["raster_zonal_ext"] = _zonal_ext
ORACLES["raster_zonal_ext"] = _zonal_ext_oracle()


# --- footprint (apps/gdal_footprint_lib.cpp) --------------------------------
# Valid-data mask outline via binarize -> distributed CCL -> per-region
# ring tracing. Fixture: 16x16 data/nodata checkerboard -> five separate
# data regions whose ids (min global pixel index), pixel counts and
# traced areas are knowable in closed form -> exact SQL oracle; traced
# polygon area must equal the pixel count exactly.

from gdal_spark.raster.polygonize import footprint  # noqa: E402


def _footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.geometry.kernels import polygon_area
    from gdal_spark.geometry.wkb import parse_wkb

    blocks = model.synth_blocks(spark, model.checker_spec())
    fp = footprint(blocks, width=48, height=48, band=1, nodata=0.0)

    import pandas as pd

    wkb_area = F.pandas_udf(
        lambda s: pd.Series(
            [float(polygon_area(parse_wkb(bytes(b))[1])) for b in s]
        ),
        "double",
    )

    return fp.select(
        "region_id",
        "n_pixels",
        F.round(wkb_area("wkb"), 6).alias("area"),
    ).orderBy("region_id")


def _footprint_oracle() -> str:
    # data tiles (tx, ty) with (tx+ty) even; region id = 16*ty*48 + 16*tx
    rows = []
    for ty in range(3):
        for tx in range(3):
            if (tx + ty) % 2 == 0:
                rows.append((16 * ty * 48 + 16 * tx, 256, 256.0))
    return _values_sql(rows, ["region_id", "n_pixels", "area"])


QUERIES["raster_footprint"] = _footprint
ORACLES["raster_footprint"] = _footprint_oracle()


# --- gridding variants: invdistnn + full data metrics ------------------------
# (alg/gdalgrid.h:60, 67-87). Same point set and cell grid as
# vector_grid_idw; the SQL oracle reproduces the window-capped IDW via
# row_number() and the pairwise metric via a rn-keyed self-join.


def _grid_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.grid import grid_data_metrics, grid_points_nn

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
    nn = grid_points_nn(pts, g, GRID_RADIUS, n_neighbors=4)
    dm = grid_data_metrics(pts, g, GRID_RADIUS)
    return nn.join(dm, ["col", "row"]).select(
        "col",
        "row",
        "n_used",
        F.round("idwnn", 6).alias("idwnn"),
        "cnt",
        "minimum",
        "maximum",
        "vrange",
        F.round("average_distance", 6).alias("avg_dist"),
        F.round("average_distance_pts", 6).alias("avg_dist_pts"),
    )


def _grid_variants_oracle() -> str:
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
        select cells.col, cells.row, pts.value as v, lon, lat,
               (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat) as d2
        from cells join pts
          on (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat)
             <= {GRID_RADIUS * GRID_RADIUS!r}
    ),
    ranked as (
        select *, row_number() over (partition by col, row
                                     order by d2, v) as rn
        from contrib
    ),
    nn as (
        select col, row, count(*) as n_used,
               round(sum(v / (d2 + {IDW_SMOOTH!r}))
                     / sum(1.0 / (d2 + {IDW_SMOOTH!r})), 6) as idwnn
        from ranked where rn <= 4 group by col, row
    ),
    dm as (
        select col, row, count(*) as cnt,
               min(v) as minimum, max(v) as maximum,
               max(v) - min(v) as vrange,
               round(avg(sqrt(d2)), 6) as avg_dist
        from contrib group by col, row
    ),
    adp as (
        select a.col, a.row,
               round(coalesce(avg(sqrt((a.lon - b.lon) * (a.lon - b.lon)
                              + (a.lat - b.lat) * (a.lat - b.lat))), 0.0), 6)
                 as avg_dist_pts
        from ranked a left join ranked b
          on a.col = b.col and a.row = b.row and a.rn < b.rn
        group by a.col, a.row
    )
    select nn.col, nn.row, nn.n_used, nn.idwnn, dm.cnt, dm.minimum,
           dm.maximum, dm.vrange, dm.avg_dist, adp.avg_dist_pts
    from nn
    join dm on dm.col = nn.col and dm.row = nn.row
    join adp on adp.col = nn.col and adp.row = nn.row
    """


QUERIES["vector_grid_variants"] = _grid_variants
ORACLES["vector_grid_variants"] = _grid_variants_oracle()


# --- contour polyline stitching (alg/contour.cpp:332 segment merger) --------
# The plane fixture's contours are straight 3-4-5 lines, so the stitched
# polyline's endpoint coordinates and total length are closed-form; the
# segment count comes from the same INDEPENDENT edge-straddle counting
# as the raster_contour oracle (no engine imports).


def _contour_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.contour import contour_polylines

    blocks = model.synth_blocks(spark, model.plane_spec())
    segs = contour_segments(
        blocks, levels=[30.0, 60.0, 120.0], width=60, height=60
    )
    lines = contour_polylines(segs)
    return lines.groupBy("level").agg(
        F.count("*").alias("n_lines"),
        F.max("n_points").alias("n_points"),
        F.max(F.col("closed").cast("int")).alias("closed"),
        F.round(F.max("length"), 6).alias("length"),
    )


def _contour_lines_oracle() -> str:
    z = model.plane_values(0, 0, 60, 60).astype(np.float64)
    tl, tr = z[:-1, :-1], z[:-1, 1:]
    bl, br = z[1:, :-1], z[1:, 1:]
    rows = []
    for level, length in ((30.0, 12.5), (60.0, 25.0), (120.0, 50.0)):
        a, b, c, d = tl >= level, tr >= level, br >= level, bl >= level
        crossings = (
            int((a != b).sum())
            + int((d != c).sum())
            + int((a != d).sum())
            + int((b != c).sum())
        )
        n_segments = crossings // 2
        rows.append((level, 1, n_segments + 1, 0, length))
    return _values_sql(
        rows, ["level", "n_lines", "n_points", "closed", "length"]
    )


QUERIES["raster_contour_lines"] = _contour_lines
ORACLES["raster_contour_lines"] = _contour_lines_oracle()


# --- line-of-sight (alg/los.cpp) + MAXDIST proximity (gdalproximity.cpp) ----
# LOS: the plane DEM makes bilinear ground values analytic (linear field
# -> exact), so the full profile incl. the sight line is pure SQL.
# Proximity: per-pixel min distance to the value==0 target set with the
# MAXDIST nodata contract; SQL computes the same min over the full
# target set.

_LOS_OBS = (5.5, -30.5, 10.0)
_LOS_TGT = (50.5, -10.5, 5.0)
_LOS_N = 41


def _los_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.los import los_profile

    blocks = model.synth_blocks(spark, model.plane_spec())
    prof = los_profile(blocks, _LOS_OBS, _LOS_TGT, n_samples=_LOS_N)
    return prof.select(
        "sid",
        F.round("t", 6).alias("t"),
        F.round("ground", 6).alias("ground"),
        F.round("sightline", 6).alias("sightline"),
        "blocked",
    )


def _los_oracle() -> str:
    olon, olat, oh = _LOS_OBS
    tlon, tlat, th = _LOS_TGT
    n = _LOS_N
    return f"""
    with s as (
        select sid, cast(sid as double) / {n - 1} as t
        from (select unnest(range({n})) as sid)
    ),
    p as (
        select sid, t,
               {olon!r} + t * {tlon - olon!r} as lon,
               {olat!r} + t * {tlat - olat!r} as lat
        from s
    ),
    g as (
        select sid, t,
               3.0 * (lon - 0.5) + 4.0 * (-lat - 0.5) as ground
        from p
    ),
    ends as (
        select
          (select ground from g where sid = 0) as g0,
          (select ground from g where sid = {n - 1}) as g1
    )
    select sid, round(t, 6) as t, round(ground, 6) as ground,
           round(g0 + {oh!r} + t * (g1 + {th!r} - g0 - {oh!r}), 6)
             as sightline,
           (ground > g0 + {oh!r} + t * (g1 + {th!r} - g0 - {oh!r}))
             and t > 0 and t < 1 as blocked
    from g cross join ends
    """


QUERIES["raster_los_profile"] = _los_query
ORACLES["raster_los_profile"] = _los_oracle()


_PROX_MAXD = 15.0


def _proximity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.resample import proximity_maxdist

    out = proximity_maxdist(_blocks(spark), 0.0, _PROX_MAXD, band=1)
    f = ops.as_features(out)
    return f.where("x < 30 and y < 30").select(
        "x", "y", F.round("value", 6).alias("dist")
    )


def _proximity_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    t as (select x as tx, y as ty from px where band = 1 and value = 0),
    d as (
        select p.x, p.y,
               min(sqrt(cast((p.x - t.tx) * (p.x - t.tx)
                   + (p.y - t.ty) * (p.y - t.ty) as double))) as dmin
        from px p cross join t
        where p.band = 1 and p.x < 30 and p.y < 30
        group by p.x, p.y
    )
    select x, y,
           round(case when dmin <= {_PROX_MAXD!r} then dmin else -1.0 end, 6)
             as dist
    from d
    """


QUERIES["raster_proximity"] = _proximity_query
ORACLES["raster_proximity"] = _proximity_oracle()


# --- viewshed (alg/viewshed/viewshed.cpp, R2 sector-sweep distributed) ------
# The per-ray dependency chain becomes ONE window function per azimuth
# sector (running max elevation angle by distance). The oracle states
# the same discretization in SQL: atan2 sector bins + RANGE-framed
# window cummax — DuckDB executes the identical math over the analytic
# pixel values.

# observer OFF the half-pixel lattice: symmetric placements put the
# diagonal pixels exactly on sector boundaries, where a 1-ulp JVM vs
# libm atan2 difference flips the bin
_VS_OBS = (_gt()[0] + 20.37 * _gt()[1], _gt()[3] + 50.23 * _gt()[5], 25.0)
_VS_SECTORS = 128
# Disc covering the whole x<60,y<60 crop from the observer (farthest crop
# pixel is ~65 world units away); blocks outside are pruned at metadata
# level before any pixel row exists. A pixel beyond the disc cannot occlude
# one inside it (occluders are nearer on the ray), so the cropped result is
# identical to the unbounded sweep.
_VS_MAXD = 70.0


def _viewshed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.los import viewshed

    vs = viewshed(
        _blocks(spark),
        _VS_OBS,
        n_sectors=_VS_SECTORS,
        band=1,
        max_dist=_VS_MAXD,
    )
    return vs.where("x < 60 and y < 60").select(
        "x", "y", "sector", "visible"
    )


def _viewshed_oracle() -> str:
    g = _gt()
    olon, olat, oh = _VS_OBS
    two_pi = 6.283185307179586
    return f"""
    with px as ({PIXELS_CTE}),
    d as (
        select x, y, value,
               ({g[0]!r} + (x + 0.5) * {g[1]!r}) - {olon!r} as dx,
               ({g[3]!r} + (y + 0.5) * {g[5]!r}) - {olat!r} as dy
        from px where band = 1
    ),
    s as (
        select x, y, value,
               sqrt(dx * dx + dy * dy) as dist,
               cast(floor(((atan2(dy, dx) + {two_pi!r}) % {two_pi!r})
                          / {two_pi / _VS_SECTORS!r}) as int) as sector
        from d
    ),
    z as (
        select value + {oh!r} as z0 from s order by dist limit 1
    ),
    a as (
        select x, y, dist, sector, (value - z.z0) / dist as angle
        from s cross join z
        where dist > 0 and dist <= {_VS_MAXD!r}
    ),
    v as (
        -- window over the FULL (disc-bounded) pixel set, mirroring the
        -- engine's order: occlusion is decided before the x/y crop
        select x, y, sector,
               angle >= max(angle) over (
                   partition by sector order by dist
                   range between unbounded preceding and current row
               ) as visible
        from a
    )
    select x, y, sector, visible
    from v
    where x < 60 and y < 60
    """


QUERIES["raster_viewshed"] = _viewshed_query
ORACLES["raster_viewshed"] = _viewshed_oracle()


# --- viewshed output modes + cumulative (VERDICT r3 #4) ---------------------
# DEM / Ground modes (alg/viewshed/viewshed_types.h:26-35,
# viewshed_executor.cpp:233-245,315-318): dfZ = z0 + occ·dist with occ =
# EXCLUSIVE per-sector running-max elevation angle (strictly nearer
# pixels only — the executor updates cur AFTER emitting the cell);
# dem_min = max(value, dfZ), ground_min = max(0, dfZ − value). The
# oracle mirrors the exclusive max with a distinct-distance CTE and a
# ROWS … 1 PRECEDING window — bit-the-same grouping because both engines
# compute dist with one correctly-rounded sqrt over identical inputs.


def _viewshed_modes_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.los import viewshed

    common = dict(
        n_sectors=_VS_SECTORS, band=1, max_dist=_VS_MAXD
    )
    dem = viewshed(_blocks(spark), _VS_OBS, output_mode="dem", **common)
    gnd = viewshed(_blocks(spark), _VS_OBS, output_mode="ground", **common)
    d = dem.select(
        "x", "y", "visible", F.round("dem_min", 6).alias("dem_min")
    )
    g = gnd.select("x", "y", F.round("ground_min", 6).alias("ground_min"))
    return (
        d.join(g, ["x", "y"])
        .where("x < 60 and y < 60")
        .select("x", "y", "visible", "dem_min", "ground_min")
    )


def _viewshed_modes_oracle() -> str:
    g = _gt()
    olon, olat, oh = _VS_OBS
    two_pi = 6.283185307179586
    return f"""
    with px as ({PIXELS_CTE}),
    d as (
        select x, y, value,
               ({g[0]!r} + (x + 0.5) * {g[1]!r}) - {olon!r} as dx,
               ({g[3]!r} + (y + 0.5) * {g[5]!r}) - {olat!r} as dy
        from px where band = 1
    ),
    s as (
        select x, y, value,
               sqrt(dx * dx + dy * dy) as dist,
               cast(floor(((atan2(dy, dx) + {two_pi!r}) % {two_pi!r})
                          / {two_pi / _VS_SECTORS!r}) as int) as sector
        from d
    ),
    z as (
        select value + {oh!r} as z0 from s order by dist limit 1
    ),
    a as (
        select x, y, value, dist, sector, z.z0 as z0,
               (value - z.z0) / dist as angle
        from s cross join z
        where dist > 0 and dist <= {_VS_MAXD!r}
    ),
    gd as (
        select sector, dist, max(angle) as gmax
        from a group by sector, dist
    ),
    e as (
        select sector, dist,
               max(gmax) over (
                   partition by sector order by dist
                   rows between unbounded preceding and 1 preceding
               ) as occ
        from gd
    ),
    v as (
        select a.x, a.y, a.value, a.dist, a.z0, e.occ,
               a.angle >= max(a.angle) over (
                   partition by a.sector order by a.dist
                   range between unbounded preceding and current row
               ) as visible
        from a join e on a.sector = e.sector and a.dist = e.dist
    )
    select x, y, visible,
           round(greatest(value, coalesce(z0 + occ * dist, value)), 6)
             as dem_min,
           round(greatest(0.0, coalesce(z0 + occ * dist - value, 0.0)), 6)
             as ground_min
    from v
    where x < 60 and y < 60
    """


QUERIES["raster_viewshed_modes"] = _viewshed_modes_query
ORACLES["raster_viewshed_modes"] = _viewshed_modes_oracle()


# Cumulative viewshed (alg/viewshed/cumulative.cpp role): sum of per-
# observer visibility. The oracle repeats the sector-sweep CTE chain per
# observer and rolls up with UNION ALL + GROUP BY — the engine runs one
# sweep job per observer and ONE map-side-combined groupBy(x, y).
_VS_OBS2 = (_gt()[0] + 72.41 * _gt()[1], _gt()[3] + 31.57 * _gt()[5], 25.0)
_VS_CUM_MAXD = 45.0


def _viewshed_cumulative_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.los import cumulative_viewshed

    return cumulative_viewshed(
        _blocks(spark),
        [_VS_OBS, _VS_OBS2],
        n_sectors=_VS_SECTORS,
        band=1,
        max_dist=_VS_CUM_MAXD,
    )


def _one_observer_visible_sql(olon: float, olat: float, oh: float) -> str:
    g = _gt()
    two_pi = 6.283185307179586
    return f"""
        with d as (
            select x, y, value,
                   ({g[0]!r} + (x + 0.5) * {g[1]!r}) - {olon!r} as dx,
                   ({g[3]!r} + (y + 0.5) * {g[5]!r}) - {olat!r} as dy
            from px where band = 1
        ),
        s as (
            select x, y, value,
                   sqrt(dx * dx + dy * dy) as dist,
                   cast(floor(((atan2(dy, dx) + {two_pi!r}) % {two_pi!r})
                              / {two_pi / _VS_SECTORS!r}) as int) as sector
            from d
        ),
        z as (
            select value + {oh!r} as z0 from s order by dist limit 1
        ),
        a as (
            select x, y, dist, sector, (value - z.z0) / dist as angle
            from s cross join z
            where dist > 0 and dist <= {_VS_CUM_MAXD!r}
        )
        select x, y,
               cast(angle >= max(angle) over (
                   partition by sector order by dist
                   range between unbounded preceding and current row
               ) as int) as v
        from a
    """


def _viewshed_cumulative_oracle() -> str:
    o1 = _one_observer_visible_sql(*_VS_OBS)
    o2 = _one_observer_visible_sql(*_VS_OBS2)
    return f"""
    with px as ({PIXELS_CTE}),
    u as (
        select * from ({o1})
        union all
        select * from ({o2})
    )
    select x, y, cast(sum(v) as bigint) as n_visible
    from u group by x, y
    """


QUERIES["raster_viewshed_cumulative"] = _viewshed_cumulative_query
ORACLES["raster_viewshed_cumulative"] = _viewshed_cumulative_oracle()


# --- rgb-to-palette (alg/gdaldither.cpp FindNearestColor path;
# apps/gdalalg_raster_rgb_to_palette.cpp) ------------------------------------
# Nearest-color application of an explicit palette over the 3-band
# grad100 raster; both sides rank palette entries by (squared distance,
# index) so integer-distance ties break identically. Median-cut training
# and Floyd-Steinberg dithering are pinned by pytest
# (tests/test_raster_ops.py) — their driver-side math is not
# SQL-expressible.

_PCT_PALETTE = [
    (0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
    (0, 0, 255), (128, 128, 0), (0, 128, 128), (128, 0, 128),
]


def _rgb_to_palette_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from gdal_spark.raster import palette as P

    pal = np.array(_PCT_PALETTE, dtype=np.uint8)
    out = P.rgb_to_palette(_blocks(spark), pal, rgb_bands=(1, 2, 3))
    f = ops.as_features(out)
    return f.where("x < 40 and y < 40").select(
        "x", "y", F.col("value").cast("int").alias("idx")
    )


def _rgb_to_palette_oracle() -> str:
    pal_rows = " union all ".join(
        f"select {i} as idx, cast({r} as double) as pr, "
        f"cast({g} as double) as pg, cast({b} as double) as pb"
        for i, (r, g, b) in enumerate(_PCT_PALETTE)
    )
    return f"""
    with px as ({PIXELS_CTE}),
    rgb as (
        select x, y,
               max(case when band = 1 then value end) as r,
               max(case when band = 2 then value end) as g,
               max(case when band = 3 then value end) as b
        from px group by x, y
    ),
    pal as ({pal_rows}),
    d as (
        select rgb.x, rgb.y, pal.idx,
               (rgb.r - pal.pr) * (rgb.r - pal.pr)
               + (rgb.g - pal.pg) * (rgb.g - pal.pg)
               + (rgb.b - pal.pb) * (rgb.b - pal.pb) as d2
        from rgb cross join pal
        where rgb.x < 40 and rgb.y < 40
    )
    select x, y, idx from (
        select x, y, idx,
               row_number() over (partition by x, y order by d2, idx) as rn
        from d
    ) where rn = 1
    """


QUERIES["raster_rgb_to_palette"] = _rgb_to_palette_q
ORACLES["raster_rgb_to_palette"] = _rgb_to_palette_oracle()


# --- focal statistics oracle (SURVEY §2.5 row 37 — was pytest-only) ---------
# All 8 focal kernels vs a DuckDB 3x3 neighborhood self-join, on an
# interior window that CROSSES the block seam at x/y = 32, so the halo
# exchange (focal._halo_emit) is what's being proven, not just the
# kernel math. Raster-edge replicate semantics are excluded by the crop.


def _focal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.focal import focal

    b1 = _blocks(spark).where("band = 1")
    out = None
    for op, alias in [
        ("mean", "fmean"), ("sum", "fsum"), ("min", "fmin"),
        ("max", "fmax"), ("stddev", "fstd"), ("median", "fmed"),
        ("tri", "tri"), ("tpi", "tpi"), ("roughness", "rough"),
    ]:
        f = ops.as_features(focal(b1, op)).select(
            "x", "y", F.round("value", 6).alias(alias)
        )
        out = f if out is None else out.join(f, ["x", "y"])
    return out.where(
        "x between 20 and 45 and y between 20 and 45"
    ).select(
        "x", "y", "fmean", "fsum", "fmin", "fmax", "fstd", "fmed",
        "tri", "tpi", "rough",
    )


def _focal_stats_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    c as (select x, y, value from px where band = 1),
    n as (
        select p.x, p.y, p.value as cv, q.value as nv
        from c p join c q
          on abs(q.x - p.x) <= 1 and abs(q.y - p.y) <= 1
        where p.x between 20 and 45 and p.y between 20 and 45
    )
    select x, y,
           round(avg(nv), 6) as fmean,
           round(sum(nv), 6) as fsum,
           round(min(nv), 6) as fmin,
           round(max(nv), 6) as fmax,
           round(stddev_pop(nv), 6) as fstd,
           round(median(nv), 6) as fmed,
           round(sum(abs(nv - cv)) / 8.0, 6) as tri,
           round(max(cv) - (sum(nv) - max(cv)) / 8.0, 6) as tpi,
           round(max(nv) - min(nv), 6) as rough
    from n group by x, y
    """


QUERIES["raster_focal_stats"] = _focal_stats
ORACLES["raster_focal_stats"] = _focal_stats_oracle()


# --- reclassify + color-map oracle (§2.8 rows 59-60 — were pytest-only) -----

_RECLASS_MAP = {10: 1, 20: 2, 50: 3, 100: 4, 200: 5}
_CMAP_BREAKS = [50.0, 100.0, 150.0, 200.0]
_CMAP_COLORS = [11, 22, 33, 44, 55]


def _reclass_colormap(spark: SparkSession, sf_dir: str) -> DataFrame:
    b1 = _blocks(spark).where("band = 1")
    rc = ops.as_features(ops.reclassify(b1, _RECLASS_MAP, default=0)).select(
        "x", "y", F.col("value").cast("int").alias("reclass")
    )
    cm = ops.as_features(
        ops.color_map(b1, _CMAP_BREAKS, _CMAP_COLORS)
    ).select("x", "y", F.col("value").cast("int").alias("color"))
    return (
        rc.join(cm, ["x", "y"])
        .where("x < 30 and y < 30")
        .select("x", "y", "reclass", "color")
    )


def _reclass_colormap_oracle() -> str:
    rc_cases = " ".join(
        f"when value = {k} then {v}" for k, v in sorted(_RECLASS_MAP.items())
    )
    cm_cases = " ".join(
        f"when value <= {b!r} then {c}"
        for b, c in zip(_CMAP_BREAKS, _CMAP_COLORS[:-1])
    )
    return f"""
    with px as ({PIXELS_CTE})
    select x, y,
           cast(case {rc_cases} else 0 end as int) as reclass,
           cast(case {cm_cases} else {_CMAP_COLORS[-1]} end as int) as color
    from px
    where band = 1 and x < 30 and y < 30
    """


QUERIES["raster_reclass_colormap"] = _reclass_colormap
ORACLES["raster_reclass_colormap"] = _reclass_colormap_oracle()


# --- fill-nodata / mosaic / pansharpen oracles (§2 rows 41, 67, 68 —
# were pytest-only) ----------------------------------------------------------


def _fillnodata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.focal import focal

    b1 = _blocks(spark).where("band = 1").withColumn("nodata", F.lit(7.0))
    out = ops.as_features(focal(b1, "fillnodata"))
    return out.where("x between 1 and 40 and y between 1 and 40").select(
        "x", "y", F.round("value", 6).alias("filled")
    )


def _fillnodata_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    c as (select x, y, value from px where band = 1),
    n as (
        select p.x, p.y, p.value as cv, q.value as nv
        from c p join c q
          on abs(q.x - p.x) <= 1 and abs(q.y - p.y) <= 1
        where p.x between 1 and 40 and p.y between 1 and 40
    )
    select x, y,
           round(case when max(cv) <> 7
                      then max(cv)
                      else sum(case when nv <> 7 then nv else 0 end)
                           / count(case when nv <> 7 then 1 end)
                 end, 6) as filled
    from n group by x, y
    """


QUERIES["raster_fillnodata"] = _fillnodata_q
ORACLES["raster_fillnodata"] = _fillnodata_oracle()


def _mosaic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.resample import mosaic

    b = _blocks(spark)
    a_layer = b.where("band = 1")
    b_layer = b.where("band = 2").withColumn("band", F.lit(1))
    out = ops.as_features(mosaic([a_layer, b_layer], nodata=0.0))
    return out.where("x < 40 and y < 40").select(
        "x", "y", F.round("value", 6).alias("value")
    )


def _mosaic_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    j as (
        select a.x, a.y, a.value as v1, b.value as v2
        from (select x, y, value from px where band = 1) a
        join (select x, y, value from px where band = 2) b
          on a.x = b.x and a.y = b.y
        where a.x < 40 and a.y < 40
    )
    select x, y,
           round(case when v1 <> 0 then v1 else v2 end, 6) as value
    from j
    """


QUERIES["raster_mosaic"] = _mosaic_q
ORACLES["raster_mosaic"] = _mosaic_oracle()


def _pansharpen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ops.pansharpen_brovey(_blocks(spark), pan_band=1, rgb_bands=[2, 3])
    f = ops.as_features(out)
    return f.where("x < 40 and y < 40").select(
        "band", "x", "y", F.round("value", 6).alias("value")
    )


def _pansharpen_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    w as (
        select x, y,
               max(case when band = 1 then value end) as pan,
               max(case when band = 2 then value end) as b2,
               max(case when band = 3 then value end) as b3
        from px group by x, y
    ),
    r as (
        select x, y, pan, b2, b3,
               0.5 * b2 + 0.5 * b3 as pseudo
        from w where x < 40 and y < 40
    )
    select band, x, y,
           round(case when pseudo = 0 then 0.0
                      else (case when band = 2 then b2 else b3 end)
                           * pan / pseudo end, 6) as value
    from r cross join (select unnest(range(2, 4)) as band) bb
    """


QUERIES["raster_pansharpen"] = _pansharpen_q
ORACLES["raster_pansharpen"] = _pansharpen_oracle()


# --- gdaldem hillshade variant modes (multidirectional/combined/Igor) ---
# apps/gdaldem_lib.cpp:1255 (USGS OF 92-422 multidirectional), :1151
# (combined), :947 (Igor). Oracle = whole-array edge-replicate mirrors
# (no halo machinery) checksummed to golden VALUES; the plane fixture is
# synthetic, so the golden is sf-independent.

_HSV_OPS = (
    "hillshade_multidirectional", "hillshade_combined", "hillshade_igor"
)


def _hillshade_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = None
    blocks = model.synth_blocks(spark, model.plane_spec())
    for op in _HSV_OPS:
        cs = ops.checksum(RF.focal(blocks, op), width=60).select(
            "dataset", "band", "checksum"
        )
        outs = cs if outs is None else outs.unionByName(cs)
    return outs.orderBy("dataset")


def _hillshade_variants_oracle() -> str:
    z = model.plane_values(0, 0, 60, 60).astype(np.float64)
    pad = np.pad(z, 1, mode="edge")
    a, b, c = pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:]
    d, f = pad[1:-1, :-2], pad[1:-1, 2:]
    g, hh, i = pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]
    sum_x = (a + 2 * d + g) - (c + 2 * f + i)
    sum_y = (g + 2 * hh + i) - (a + 2 * b + c)
    gx = sum_x / (8.0 * 1.0)   # gt1 = 1
    gy = sum_y / (8.0 * -1.0)  # gt5 = -1 (north-up)
    sin_alt = np.sin(np.radians(45.0))
    cos_alt = np.cos(np.radians(45.0))
    xx_yy = gx * gx + gy * gy
    rows = []
    # multidirectional
    c225 = np.cos(np.radians(225.0))
    vals = [
        np.maximum(sin_alt + (gx - gy) * c225 * cos_alt, 0.0),
        np.maximum(sin_alt - gx * cos_alt, 0.0),
        np.maximum(sin_alt + (gx + gy) * c225 * cos_alt, 0.0),
        np.maximum(sin_alt - gy * cos_alt, 0.0),
    ]
    wts = [0.5 * xx_yy - gx * gy, gx * gx, None, gy * gy]
    wts[2] = xx_yy - wts[0]
    num = sum(w * v for w, v in zip(wts, vals))
    with np.errstate(invalid="ignore", divide="ignore"):
        md = 1.0 + 127.0 * num / np.where(xx_yy == 0, 1.0, xx_yy) \
            / np.sqrt(1.0 + xx_yy)
    md = np.where(xx_yy == 0.0, 1.0 + 254.0 * sin_alt, md)
    rows.append(("plane60_hillshade_multidirectional", 1,
                 _ref_checksum_arr(md)))
    # combined
    azr = np.radians(315.0)
    cang = (sin_alt - (gy * np.cos(azr) - gx * np.sin(azr)) * cos_alt) \
        / np.sqrt(1.0 + xx_yy)
    comb = 1.0 - np.arccos(np.clip(cang, -1.0, 1.0)) * np.arctan(
        np.sqrt(xx_yy)) * (4.0 / np.pi**2)
    cb = np.where(comb <= 0.0, 1.0, 1.0 + 254.0 * comb)
    rows.append(("plane60_hillshade_combined", 1, _ref_checksum_arr(cb)))
    # igor
    slope_strength = np.degrees(np.arctan(np.sqrt(xx_yy))) / 90.0
    aspect = np.arctan2(sum_y, sum_x)
    target = 1.5 * np.pi - np.radians(315.0)
    diff = np.abs(np.mod(aspect, 2 * np.pi) - np.mod(target, 2 * np.pi))
    diff = np.where(diff > np.pi, 2 * np.pi - diff, diff)
    ig = 255.0 * (1.0 - slope_strength * (1.0 - diff / np.pi))
    rows.append(("plane60_hillshade_igor", 1, _ref_checksum_arr(ig)))
    rows.sort()
    return _values_sql(rows, ["dataset", "band", "checksum"])


QUERIES["raster_hillshade_variants"] = _hillshade_variants
ORACLES["raster_hillshade_variants"] = _hillshade_variants_oracle()


# --- gdaldem alg/unit variants: Riley TRI (the CLI default), slope -p,
# Zevenbergen-Thorne slope/aspect (apps/gdaldem_lib.cpp:2332,3219,1390,1482)
# over the stepped plateau fixture (non-degenerate windows crossing the
# 32-px block seams, so the halo exchange is exercised for real).

_DEMV_OPS = (
    "tri_riley", "slope_percent", "slope_zt", "aspect_zt",
    "hillshade_zt", "aspect_trig", "aspect_az_zero_flat",
)


def _dem_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = None
    blocks = model.synth_blocks(spark, model.plateau_spec())
    for op in _DEMV_OPS:
        cs = ops.checksum(RF.focal(blocks, op), width=48).select(
            "dataset", "band", "checksum"
        )
        outs = cs if outs is None else outs.unionByName(cs)
    return outs.orderBy("dataset")


def _dem_variants_oracle() -> str:
    z = model.plateau_values(0, 0, 48, 48).astype(np.float64)
    pad = np.pad(z, 1, mode="edge")
    a, b, c = pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:]
    d, e, f = pad[1:-1, :-2], pad[1:-1, 1:-1], pad[1:-1, 2:]
    g, hh, i = pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]
    rows = []
    tri = np.sqrt(sum((w - e) ** 2 for w in (a, b, c, d, f, g, hh, i)))
    rows.append(("plateau48_tri_riley", 1, _ref_checksum_arr(tri)))
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
    dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / 8.0
    rows.append(
        ("plateau48_slope_percent", 1,
         _ref_checksum_arr(100.0 * np.hypot(dzdx, dzdy)))
    )
    ztx = (f - d) / 2.0
    zty = (hh - b) / 2.0
    rows.append(
        ("plateau48_slope_zt", 1,
         _ref_checksum_arr(np.degrees(np.arctan(np.hypot(ztx, zty)))))
    )
    az = 90.0 - np.degrees(np.arctan2(zty, -ztx))
    az = np.where(az < 0, az + 360.0, az)
    az = np.where(az >= 360.0, az - 360.0, az)
    rows.append(("plateau48_aspect_zt", 1, _ref_checksum_arr(az)))
    azr = np.radians(360.0 - 315.0 + 90.0)
    altr = np.radians(45.0)
    zslope = np.arctan(np.hypot(ztx, zty))
    zaspect = np.arctan2(zty, -ztx)
    zshade = np.clip(
        1.0 + 254.0 * (np.sin(altr) * np.cos(zslope)
                       + np.cos(altr) * np.sin(zslope)
                       * np.cos(azr - zaspect)),
        1.0, 255.0)
    rows.append(("plateau48_hillshade_zt", 1, _ref_checksum_arr(zshade)))
    # gdaldem aspect flag matrix: unnormalized sums, flat -> 0
    dx = (c + 2 * f + i) - (a + 2 * d + g)
    dy = (g + 2 * hh + i) - (a + 2 * b + c)
    asp = np.degrees(np.arctan2(dy, -dx))
    flat = (dx == 0) & (dy == 0)
    trig = np.where(asp < 0, asp + 360.0, asp)
    trig = np.where(trig == 360.0, 0.0, trig)
    rows.append(("plateau48_aspect_trig", 1,
                 _ref_checksum_arr(np.where(flat, 0.0, trig))))
    azm = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    azm = np.where(azm == 360.0, 0.0, azm)
    rows.append(("plateau48_aspect_az_zero_flat", 1,
                 _ref_checksum_arr(np.where(flat, 0.0, azm))))
    rows.sort()
    return _values_sql(rows, ["dataset", "band", "checksum"])


QUERIES["raster_dem_variants"] = _dem_variants
ORACLES["raster_dem_variants"] = _dem_variants_oracle()


# --- raster blend (apps/gdalalg_raster_blend.cpp) ---------------------------
# Base RGB = grad100 bands 1,2,3; overlay gray = band 3 (same grid).
# The engine kernel is the reference's exact byte-ratio integer algebra,
# so the oracle replays MulScale255/DivScale255 symbolically in SQL; the
# hsv-value mode replays the float channel swap in double (same op order
# as the numpy kernel).

_BLEND_OPACITY = 179  # odd value exercises the ceiling/floor rounding
_BLEND_WIN = 12


def _blend_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from gdal_spark.raster import blend as BL

    blocks = _blocks(spark)
    over = blocks.where("band = 3")
    outs = []
    for mode in BL.MODES:
        bl = BL.blend(blocks, over, mode=mode, opacity=_BLEND_OPACITY)
        f = ops.as_features(bl).where(
            f"x < {_BLEND_WIN} and y < {_BLEND_WIN}"
        )
        outs.append(
            f.select(
                F.lit(mode).alias("mode"),
                "band",
                "x",
                "y",
                F.col("value").cast("int").alias("px"),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def _blend_oracle() -> str:
    op = _BLEND_OPACITY

    def mul(a, b):
        return f"((({a}) * ({b}) + 255) // 256)"

    def div(a, b):
        return (
            f"(case when ({a}) = 0 then 0 when ({b}) = 0 then 255 "
            f"else (({a}) * 255) // ({b}) end)"
        )

    def gb(x):
        # GByte cast at C++ call boundaries: wrap into [0, 255]
        return f"(((({x}) % 256) + 256) % 256)"

    def sep(mode, c, a, oc, oa, am):
        edge = f"({mul(c, 255 - oa)} + {mul(oc, 255 - a)})"
        fa = 255
        if mode == "multiply":
            return div(gb(f"{mul(c, oc)} + {edge}"), fa)
        if mode == "screen":
            return div(gb(f"({c}) + ({oc}) - {mul(c, oc)}"), fa)
        if mode == "overlay":
            lo = div(gb(f"2 * {mul(c, oc)} + {edge}"), fa)
            hi = div(
                gb(f"{am} - 2 * {mul(f'{a} - ({c})', f'{oa} - ({oc})')} + {edge}"),
                fa,
            )
            return f"(case when 2 * ({c}) < {a} then {lo} else {hi} end)"
        if mode == "darken":
            return div(gb(f"least({mul(oc, a)}, {mul(c, oa)}) + {edge}"), fa)
        if mode == "lighten":
            return div(
                gb(f"greatest({mul(oc, a)}, {mul(c, oa)}) + {edge}"), fa
            )
        if mode == "color-dodge":
            cond = f"{mul(oc, a)} + {mul(c, oa)} >= {am}"
            ge = div(gb(f"{am} + {edge}"), fa)
            lt = div(
                gb(f"{div(mul(c, oa), f'255 - {div(oc, oa)}')} + {edge}"),
                fa,
            )
            return f"(case when {cond} then {ge} else {lt} end)"
        if mode == "color-burn":
            cond = f"{mul(oc, a)} + {mul(c, oa)} <= {am}"
            le = div(gb(edge), fa)
            inner = gb(f"{div(c, a)} + {div(oc, oa)} - 255")
            gt = div(gb(f"{mul(am, inner)} + {edge}"), fa)
            return f"(case when {cond} then {le} else {gt} end)"
        raise ValueError(mode)

    def mode_exprs(mode):
        """Return (expr_r, expr_g, expr_b) over columns r, g, b, v."""
        if mode == "src-over":
            return tuple(
                f"((v * {op} + {c} * {255 - op} + 255) // 256)"
                for c in ("r", "g", "b")
            )
        if mode == "hard-light":
            # overlay with roles swapped; opacity premultiplies the
            # original overlay (now the base slot)
            a, oa = op, 255
            am = (255 * a + 255) // 256
            cc = mul("v", a)
            return tuple(sep("overlay", cc, a, c, oa, am) for c in ("r", "g", "b"))
        if mode == "hsv-value":
            return None  # handled separately
        a, oa = 255, op
        am = (255 * oa + 255) // 256
        og = mul("v", oa)
        return tuple(sep(mode, c, a, og, oa, am) for c in ("r", "g", "b"))

    # hsv-value in double, mirroring the numpy op order exactly
    hsv = """
      select x, y,
             least(least(r, g), b) as minc,
             greatest(greatest(r, g), b) as maxc,
             r, g, b, v
      from base
    """
    hsv_hs = """
      select x, y, r, g, b, v, maxc,
             cast(maxc - minc as double) / greatest(1, maxc) as s,
             (case when maxc - minc = 0 then 1.0
                   else 6.0 * (maxc - minc) end) as denom
      from hsv0
    """
    hsv_h = """
      select x, y, v, s,
             (case when maxc = b then 4.0/6.0 + (r - g) / denom
                   when maxc = g then 2.0/6.0 + (b - r) / denom
                   else (case when (g - b) / denom < 0.0
                              then (g - b) / denom + 1.0
                              else (g - b) / denom end)
              end) as h
      from hsv1
    """
    hsv_i = """
      select x, y, v, s,
             least(greatest(cast(trunc(6.0 * h) as bigint), 0), 5) as i,
             6.0 * h - cast(trunc(6.0 * h) as bigint) as f
      from hsv2
    """
    hsv_pqt = """
      select x, y, v, i,
             cast(trunc(v * (1.0 - s) + 0.5) as bigint) as p,
             cast(trunc(v * (1.0 - s * f) + 0.5) as bigint) as q,
             cast(trunc(v * (1.0 - s * (1.0 - f)) + 0.5) as bigint) as t
      from hsv3
    """
    hsv_rgb = """
      select x, y,
             (case i when 0 then v when 1 then q when 2 then p
                     when 3 then p when 4 then t else v end) as p1,
             (case i when 0 then t when 1 then v when 2 then v
                     when 3 then q when 4 then p else p end) as p2,
             (case i when 0 then p when 1 then p when 2 then t
                     when 3 then v when 4 then v else q end) as p3
      from hsv4
    """

    selects = []
    for mode in (
        "src-over",
        "multiply",
        "screen",
        "overlay",
        "hard-light",
        "darken",
        "lighten",
        "color-burn",
        "color-dodge",
    ):
        er, eg, eb = mode_exprs(mode)
        for band, e in zip((1, 2, 3), (er, eg, eb)):
            selects.append(
                f"select '{mode}' as mode, {band} as band, x, y, "
                f"cast({e} as int) as px from base"
            )
    for band, col in zip((1, 2, 3), ("p1", "p2", "p3")):
        selects.append(
            f"select 'hsv-value' as mode, {band} as band, x, y, "
            f"cast({col} as int) as px from hsvf"
        )
    union = "\nunion all\n".join(selects)
    return f"""
    with px as ({PIXELS_CTE}),
    rgb as (
      select x, y,
             max(case when band = 1 then cast(value as bigint) end) as r,
             max(case when band = 2 then cast(value as bigint) end) as g,
             max(case when band = 3 then cast(value as bigint) end) as b
      from px group by x, y
    ),
    base as (
      select x, y, r, g, b, b as v from rgb
      where x < {_BLEND_WIN} and y < {_BLEND_WIN}
    ),
    hsv0 as ({hsv}),
    hsv1 as ({hsv_hs}),
    hsv2 as ({hsv_h}),
    hsv3 as ({hsv_i}),
    hsv4 as ({hsv_pqt}),
    hsvf as ({hsv_rgb})
    {union}
    """


QUERIES["raster_blend_modes"] = _blend_modes
ORACLES["raster_blend_modes"] = _blend_oracle()


# --- clean-collar / nearblack (apps/gdalalg_raster_clean_collar.cpp) --------
# collar64 fixture: jagged near-black border + interior lake + L-shaped
# bay (model.collar_values). The twopasses variant is window-expressible
# in SQL (per-row/per-column first/last non-near pixel); floodfill is
# pinned by tests/test_collar.py against a BFS brute force.

_COLLAR_VALUE_SQL = """
  case when (x < 3 + y % 4) or (x >= 64 - 2 - y % 3)
         or (y < 2 + x % 5) or (y >= 64 - 3 - x % 2)
         or (x between 20 and 25 and y between 30 and 34)
         or (x >= 3 and x < 40 and y >= 40 and y < 42)
         or (x >= 36 and x < 44 and y >= 20 and y < 40)
       then (x * 3 + y * 5 + band) % 11
       else 60 + (x * 7 + y * 13 + band * 17) % 180 end
"""


def _clean_collar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import collar as CL

    blocks = model.synth_blocks(spark, model.collar64_spec())
    out = CL.clean_collar(blocks, 64, 64, algorithm="twopasses")
    feats = ops.as_features(out)
    masked = (
        feats.where("band = 0")
        .groupBy("y")
        .agg(
            F.sum(F.when(F.col("value") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_collar")
        )
    )
    b1 = (
        feats.where("band = 1")
        .groupBy("y")
        .agg(F.sum(F.col("value").cast("long")).alias("sum_b1"))
    )
    return (
        masked.join(b1, "y")
        .select(F.col("y").cast("int").alias("y"), "n_collar", "sum_b1")
    )


def _clean_collar_oracle() -> str:
    return f"""
    with px as (
      select x.x as x, y.y as y, b.band as band,
             cast(({_COLLAR_VALUE_SQL}) as bigint) as value
      from (select unnest(range(64)) as x) x
      cross join (select unnest(range(64)) as y) y
      cross join (select unnest(range(1, 4)) as band) b
    ),
    nearf as (
      select x, y, min(case when value <= 15 then 1 else 0 end) = 1 as near
      from px group by x, y
    ),
    rows_ as (
      select y,
             min(case when not near then x end) as lo,
             max(case when not near then x end) as hi
      from nearf group by y
    ),
    cols_ as (
      select x,
             min(case when not near then y end) as lo,
             max(case when not near then y end) as hi
      from nearf group by x
    ),
    mask as (
      select n.x, n.y,
             (n.x < coalesce(r.lo, 64) or n.x > coalesce(r.hi, -1)
              or n.y < coalesce(c.lo, 64) or n.y > coalesce(c.hi, -1)) as m
      from nearf n
      join rows_ r on r.y = n.y
      join cols_ c on c.x = n.x
    ),
    b1 as (select x, y, value from px where band = 1)
    select cast(mask.y as int) as y,
           cast(sum(case when m then 1 else 0 end) as bigint) as n_collar,
           cast(sum(case when m then 0 else b1.value end) as bigint) as sum_b1
    from mask join b1 on b1.x = mask.x and b1.y = mask.y
    group by mask.y
    """


QUERIES["raster_clean_collar"] = _clean_collar
ORACLES["raster_clean_collar"] = _clean_collar_oracle()


# --- nodata-to-alpha (apps/gdalalg_raster_nodata_to_alpha.cpp) --------------
# Per-band nodata [7, 24, 41]: on grad100 the three bands differ by
# exactly 17 at every pixel, so "all bands at their nodata" is a real,
# non-trivial pixel set (= band-1 value 7).

_N2A = {1: 7.0, 2: 24.0, 3: 41.0}


def _nodata_to_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ops.nodata_to_alpha(_blocks(spark), _N2A)
    feats = ops.as_features(out.where("band = 4"))
    return feats.groupBy("y").agg(
        F.sum(F.when(F.col("value") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_transparent"),
        F.count("*").cast("long").alias("n_pixels"),
    ).select(F.col("y").cast("int").alias("y"), "n_transparent", "n_pixels")


def _nodata_to_alpha_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    hit as (
      select x, y,
             min(case when (band = 1 and value = 7)
                        or (band = 2 and value = 24)
                        or (band = 3 and value = 41)
                      then 1 else 0 end) = 1 as transparent
      from px group by x, y
    )
    select cast(y as int) as y,
           cast(sum(case when transparent then 1 else 0 end) as bigint)
             as n_transparent,
           cast(count(*) as bigint) as n_pixels
    from hit group by y
    """


QUERIES["raster_nodata_to_alpha"] = _nodata_to_alpha
ORACLES["raster_nodata_to_alpha"] = _nodata_to_alpha_oracle()


# --- raster index / gdaltindex (apps/gdaltindex_lib.cpp) --------------------


def _raster_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    sets = [
        model.synth_blocks(spark, s())
        for s in (
            model.grad100_spec,
            model.collar64_spec,
            model.plateau_spec,
            model.plane_spec,
        )
    ]
    allb = reduce(DataFrame.unionByName, sets)
    idx = ops.raster_index(allb)
    return idx.select(
        "location",
        F.round("minlon", 6).alias("minlon"),
        F.round("maxlon", 6).alias("maxlon"),
        F.round("minlat", 6).alias("minlat"),
        F.round("maxlat", 6).alias("maxlat"),
        F.round("pixel_sx", 6).alias("pixel_sx"),
        F.round("pixel_sy", 6).alias("pixel_sy"),
    )


def _raster_index_oracle() -> str:
    # closed-form envelopes from the GridSpec constants: grad100 is
    # 100x100 at 0.04 deg over (clon-2, clat+2); the others are unit
    # grids anchored at the origin (north-up, negative gt5)
    from gdal_spark import portable

    clat, clon = portable.CITIES[0]
    rows = [
        (
            "grad100",
            clon - 2.0,
            clon - 2.0 + 100 * 0.04,
            clat + 2.0 - 100 * 0.04,
            clat + 2.0,
            0.04,
            0.04,
        ),
        ("collar64", 0.0, 64.0, -64.0, 0.0, 1.0, 1.0),
        ("plateau48", 0.0, 48.0, -48.0, 0.0, 1.0, 1.0),
        ("plane60", 0.0, 60.0, -60.0, 0.0, 1.0, 1.0),
    ]
    vals = ", ".join(
        f"('{n}', {a!r}, {b!r}, {c!r}, {d!r}, {e!r}, {f!r})"
        for n, a, b, c, d, e, f in rows
    )
    return f"""
    select location,
           round(minlon, 6) as minlon, round(maxlon, 6) as maxlon,
           round(minlat, 6) as minlat, round(maxlat, 6) as maxlat,
           round(pixel_sx, 6) as pixel_sx, round(pixel_sy, 6) as pixel_sy
    from (values {vals})
      t(location, minlon, maxlon, minlat, maxlat, pixel_sx, pixel_sy)
    """


QUERIES["raster_index"] = _raster_index
ORACLES["raster_index"] = _raster_index_oracle()


# --- linear (Delaunay) gridding — GDALGridLinear (alg/gdalgrid.cpp:2458) ----
# Planar fixture: z = 2.5x - 1.25y + 10 on every input point, so ANY
# valid triangulation reproduces the plane exactly inside the hull —
# the oracle needs no triangulation, just the plane and the 4-corner
# hull test. Outside the hull the reference falls back to nearest
# neighbor (default radius = infinity); the oracle ranks points by
# (d2, v) exactly like the engine. Cell centers sit > 0.1 units off
# every hull edge, so the inside test is rounding-proof.

_LIN_CORNERS = [(1.03, 1.07), (8.97, 1.13), (8.91, 8.95), (1.07, 8.89)]
_LIN_PTS = _LIN_CORNERS + [
    ((i * 0.731) % 7.5 + 1.3, (i * 0.377) % 7.4 + 1.4) for i in range(30)
]
_LIN_XYZ = [(x, y, 2.5 * x - 1.25 * y + 10.0) for x, y in _LIN_PTS]
_LIN_NC = _LIN_NR = 20
_LIN_CELL = 0.5


def _grid_linear_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.grid import CellGrid, grid_linear

    pts = spark.createDataFrame(
        _LIN_XYZ, "lon double, lat double, value double"
    )
    g = CellGrid(0.0, 0.0, 10.0, 10.0, _LIN_NC, _LIN_NR)
    out = grid_linear(pts, g)
    return out.select(
        "col", "row", F.round("value", 6).alias("value")
    )


def _grid_linear_oracle() -> str:
    vals = ", ".join(f"({x!r}, {y!r}, {z!r})" for x, y, z in _LIN_XYZ)
    (x1, y1), (x2, y2), (x3, y3), (x4, y4) = _LIN_CORNERS
    edges = []
    for (ax, ay), (bx, by) in zip(
        _LIN_CORNERS, _LIN_CORNERS[1:] + _LIN_CORNERS[:1]
    ):
        edges.append(
            f"(({bx!r} - {ax!r}) * (cy - {ay!r})"
            f" - ({by!r} - {ay!r}) * (cx - {ax!r})) >= 0"
        )
    inside = " and ".join(edges)
    return f"""
    with pts as (
      select * from (values {vals}) t(lon, lat, value)
    ),
    cells as (
      select c.col, r.row,
             (c.col + 0.5) * {_LIN_CELL!r} as cx,
             (r.row + 0.5) * {_LIN_CELL!r} as cy
      from (select unnest(range({_LIN_NC})) as col) c
      cross join (select unnest(range({_LIN_NR})) as row) r
    ),
    nn as (
      select col, row, value,
             row_number() over (
               partition by col, row
               order by (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat),
                        value
             ) as rn
      from cells cross join pts
    )
    select cells.col, cells.row,
           round(case when {inside}
                      then 2.5 * cx - 1.25 * cy + 10.0
                      else nn.value end, 6) as value
    from cells join nn on nn.col = cells.col and nn.row = cells.row
    where nn.rn = 1
    """


QUERIES["vector_grid_linear"] = _grid_linear_q
ORACLES["vector_grid_linear"] = _grid_linear_oracle()


# --- raster compare (apps/gdalalg_raster_compare.cpp) -----------------------
# Compare grad100 against a copy whose band-2 values are bumped by +5
# inside the SRCWIN window (clipped at the uint8 ceiling) — per-band
# differing-pixel counts and max abs difference, both closed-form.


def _raster_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator as _It

    blocks = _blocks(spark)
    x0, y0, w, h = SRCWIN

    def bump(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                a = model.decode(
                    (r["buf"], r["height"], r["width"], r["dtype"])
                ).astype(_np.int64)
                if int(r["band"]) == 2:
                    ys, xs = _np.mgrid[0 : int(r["height"]), 0 : int(r["width"])]
                    gx = xs + int(r["x0"])
                    gy = ys + int(r["y0"])
                    win = (
                        (gx >= x0) & (gx < x0 + w) & (gy >= y0) & (gy < y0 + h)
                    )
                    a = _np.where(win, _np.minimum(a + 5, 255), a)
                d = {c: r[c] for c in pdf.columns}
                d["dataset"] = "grad100_edit"
                d["buf"] = _np.ascontiguousarray(
                    a.astype(_np.uint8)
                ).tobytes()
                out.append(d)
            yield _pd.DataFrame(out, columns=list(pdf.columns))

    import pandas as pd  # noqa: F401  (bump closure)

    edited = blocks.mapInPandas(bump, model.BLOCK_SCHEMA)
    cmpd = ops.compare(blocks, edited)
    return cmpd.select(
        "band",
        "pixels_differing",
        F.round("max_value_difference", 6).alias("max_value_difference"),
    )


def _raster_compare_oracle() -> str:
    x0, y0, w, h = SRCWIN
    return f"""
    with px as ({PIXELS_CTE}),
    edit as (
      select x, y, band, value,
             case when band = 2
                    and x between {x0} and {x0 + w - 1}
                    and y between {y0} and {y0 + h - 1}
                  then least(value + 5, 255) else value end as value_b
      from px
    )
    select band,
           cast(sum(case when value <> value_b then 1 else 0 end) as bigint)
             as pixels_differing,
           round(max(abs(value - value_b)), 6) as max_value_difference
    from edit group by band
    """


QUERIES["raster_compare"] = _raster_compare
ORACLES["raster_compare"] = _raster_compare_oracle()


# --- raster pixel-info (apps/gdalalg_raster_pixel_info.cpp) -----------------
# Five georeferenced positions at exact pixel centers; both engines
# evaluate the SAME IEEE-double expression floor((x - gt0) / gt1) from
# identical literals, so the pixel indices agree bit-for-bit even
# though 0.04°/px is not binary-exact.

_PI_PIX = [(3, 7), (17, 23), (50, 50), (82, 64), (99, 99)]


def _pi_points() -> list[tuple[int, str, str]]:
    g = model.grad100_spec().gt
    return [
        (
            i,
            repr(g[0] + (px + 0.5) * g[1]),
            repr(g[3] + (py + 0.5) * g[5]),
        )
        for i, (px, py) in enumerate(_PI_PIX)
    ]


def _raster_pixel_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = spark.sql(
        "select * from values "
        + ", ".join(
            f"({i}, cast({x} as double), cast({y} as double))"
            for i, x, y in _pi_points()
        )
        + " as t(point_id, x, y)"
    )
    out = ops.pixel_info(_blocks(spark), pts)
    return out.orderBy("point_id", "band")


def _raster_pixel_info_oracle() -> str:
    g = model.grad100_spec().gt
    pts = " union all ".join(
        f"select {i} as point_id, cast({x} as double) as x,"
        f" cast({y} as double) as y"
        for i, x, y in _pi_points()
    )
    return f"""
    with pts as ({pts}),
    loc as (
      select point_id,
             cast(floor((x - cast({g[0]!r} as double))
                        / cast({g[1]!r} as double)) as bigint) as px,
             cast(floor((y - cast({g[3]!r} as double))
                        / cast({g[5]!r} as double)) as bigint) as py
      from pts
    ),
    px as ({PIXELS_CTE})
    select loc.point_id, px.band, loc.px, loc.py, px.value
    from loc join px on px.x = loc.px and px.y = loc.py
    order by point_id, band
    """


QUERIES["raster_pixel_info"] = _raster_pixel_info
ORACLES["raster_pixel_info"] = _raster_pixel_info_oracle()


# --- raster update (apps/gdalalg_raster_update.cpp) -------------------------
# Source raster = the complement (255 - v) of grad100 over the block
# range bx in {1,2}, by = 1 (x in [32,96), y in [32,64)), with
# src_nodata = 0: destination pixels survive wherever 255 - v == 0
# (i.e. v == 255). Report per-band stats of the updated raster — exact
# integer sums, fully closed-form.

_UPD_WIN = (32, 32, 64, 32)  # x, y, w, h of the updated block range


def _raster_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator as _It

    blocks = _blocks(spark)

    def complement(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                a = model.decode(
                    (r["buf"], r["height"], r["width"], r["dtype"])
                )
                d = {c: r[c] for c in pdf.columns}
                d["dataset"] = "grad100_patch"
                d["buf"] = _np.ascontiguousarray(
                    (255 - a).astype(_np.uint8)
                ).tobytes()
                out.append(d)
            yield _pd.DataFrame(out, columns=list(pdf.columns))

    import pandas as pd  # noqa: F401  (complement closure)

    src = blocks.where(
        (F.col("bx").isin(1, 2)) & (F.col("by") == 1)
    ).mapInPandas(complement, model.BLOCK_SCHEMA)
    updated = ops.update(blocks, src, src_nodata=0.0)
    s = ops.band_stats(updated)
    return s.select(
        "band", "cnt", "vmin", "vmax", "vsum",
        F.round("mean", 6).alias("mean"),
    )


def _raster_update_oracle() -> str:
    x0, y0, w, h = _UPD_WIN
    return f"""
    with px as ({PIXELS_CTE}),
    upd as (
      select band,
             case when x between {x0} and {x0 + w - 1}
                    and y between {y0} and {y0 + h - 1}
                    and (255 - value) <> 0
                  then 255 - value else value end as value
      from px
    )
    select band, count(*) as cnt, min(value) as vmin, max(value) as vmax,
           sum(value) as vsum, round(avg(value), 6) as mean
    from upd group by band
    """


QUERIES["raster_update"] = _raster_update
ORACLES["raster_update"] = _raster_update_oracle()


# --- raster create (apps/gdalalg_raster_create.h:28) ------------------------
# Distributed blank-raster creation: 64×64×2 uint8 burned to 9, block
# grid enumerated via spark.range (never driver-side). Stats and the
# GDAL checksum of a constant raster are closed-form.


def _raster_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = model.GridSpec(
        "blank64", 64, 64, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        block=32, bands=2,
    )
    blocks = ops.create(spark, spec, burn=9.0)
    s = ops.band_stats(blocks)
    cs = ops.checksum(blocks, width=64)
    return (
        s.join(cs, ["band"])
        .select("band", "cnt", "vmin", "vmax", "vsum", "checksum")
        .orderBy("band")
    )


def _raster_create_oracle() -> str:
    # checksum: sum over pixels of 9 % primes[(y*64+x) % 11], mod 65536.
    # 64*64 = 4096 pixel indices cycle through the 11-prime table:
    # 4096 = 372*11 + 4 -> 372 full cycles + indices 0..3.
    return """
    with prim as (
      select * from (values (0,7),(1,11),(2,13),(3,17),(4,19),(5,23),
                            (6,29),(7,31),(8,37),(9,41),(10,43))
             as t(i, p)
    ),
    px as (
      select b.band, (g.g % 64) as x, (g.g // 64) as y, g.g as gidx
      from (select unnest(range(4096)) as g) g
      cross join (select unnest(range(1, 3)) as band) b
    ),
    terms as (
      select band, cast(9 % p as bigint) as term
      from px join prim on prim.i = (px.gidx % 11)
    )
    select band,
           cast(4096 as bigint) as cnt,
           cast(9.0 as double) as vmin,
           cast(9.0 as double) as vmax,
           cast(4096 * 9.0 as double) as vsum,
           cast(sum(term) % 65536 as bigint) as checksum
    from terms group by band
    order by band
    """


QUERIES["raster_create"] = _raster_create
ORACLES["raster_create"] = _raster_create_oracle()


# --- raster scale (apps/gdalalg_raster_scale.cpp) ---------------------------
# Linear map [55, 200] -> [0, 290] with clipping: the factor is exactly
# 2.0, so scaled values are exact integers and the per-band stats are
# closed-form.


def _raster_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ops.scale_minmax(
        _blocks(spark), 0.0, 290.0, src_min=55.0, src_max=200.0
    )
    s = ops.band_stats(out)
    return s.select("band", "cnt", "vmin", "vmax", "vsum").orderBy("band")


def _raster_scale_oracle() -> str:
    return f"""
    with px as ({PIXELS_CTE}),
    sc as (
      select band,
             (least(greatest(value, 55), 200) - 55) * 2.0 as v
      from px
    )
    select band, count(*) as cnt, min(v) as vmin, max(v) as vmax,
           sum(v) as vsum
    from sc group by band order by band
    """


QUERIES["raster_scale"] = _raster_scale
ORACLES["raster_scale"] = _raster_scale_oracle()


# --- raster resize (apps/gdalalg_raster_resize.cpp) -------------------------
# 100x100 -> 40x40 nearest: the sampling lattice 2.5*X + 0.75 never
# lands on a .5 tie, so the nearest pick is closed-form.


def _raster_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ops.resize(_blocks(spark), 40, 40, "nearest", band=1)
    s = ops.band_stats(out)
    return s.select("band", "cnt", "vmin", "vmax", "vsum")


def _raster_resize_oracle() -> str:
    val = model.VALUE_SQL.format(
        x="cast(floor(2.5 * x.x + 1.25) as bigint)",
        y="cast(floor(2.5 * y.y + 1.25) as bigint)",
        band="1",
    )
    return f"""
    with px as (
      select cast(({val}) as double) as v
      from (select unnest(range(40)) as x) x
      cross join (select unnest(range(40)) as y) y
    )
    select 1 as band, count(*) as cnt, min(v) as vmin, max(v) as vmax,
           sum(v) as vsum
    from px
    """


QUERIES["raster_resize"] = _raster_resize
ORACLES["raster_resize"] = _raster_resize_oracle()


# --- raster overview add / refresh (apps/gdalalg_raster_overview_*.cpp) -----
# Dataset-level factor-2 overview of grad100 (100x100 -> 50x50): the
# 2x2 average with the overview build's floor(v + 0.5) byte rounding is
# closed-form over the analytic fixture. The refresh query rebuilds
# ONLY the overview blocks under the update patch window and must match
# the full recompute of the patched raster.

_OV_REDUCE = """
      select band, (x // 2) as ox, (y // 2) as oy,
             floor(sum(value) / 4.0 + 0.5) as v
      from {src} group by band, (x // 2), (y // 2)
"""


def _raster_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import resample as RS

    ov = RS.overview_blocks(_blocks(spark))
    s = ops.band_stats(ov)
    return s.select("band", "cnt", "vmin", "vmax", "vsum").orderBy("band")


def _raster_overview_oracle() -> str:
    red = _OV_REDUCE.format(src="px")
    return f"""
    with px as ({PIXELS_CTE}),
    ov as ({red})
    select band, count(*) as cnt, min(v) as vmin, max(v) as vmax,
           sum(v) as vsum
    from ov group by band order by band
    """


QUERIES["raster_overview"] = _raster_overview
ORACLES["raster_overview"] = _raster_overview_oracle()


def _raster_overview_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator as _It

    from gdal_spark.raster import resample as RS

    blocks = _blocks(spark)
    x0, y0, w, h = _UPD_WIN

    def complement(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                a = model.decode(
                    (r["buf"], r["height"], r["width"], r["dtype"])
                )
                d = {c: r[c] for c in pdf.columns}
                d["dataset"] = "grad100_patch"
                d["buf"] = _np.ascontiguousarray(
                    (255 - a).astype(_np.uint8)
                ).tobytes()
                out.append(d)
            yield _pd.DataFrame(out, columns=list(pdf.columns))

    import pandas as pd  # noqa: F401  (complement closure)

    src = blocks.where(
        (F.col("bx").isin(1, 2)) & (F.col("by") == 1)
    ).mapInPandas(complement, model.BLOCK_SCHEMA)
    updated = ops.update(blocks, src, src_nodata=0.0)
    stale_ov = RS.overview_blocks(blocks)
    refreshed = RS.overview_refresh(updated, stale_ov, _UPD_WIN)
    s = ops.band_stats(refreshed)
    return s.select("band", "cnt", "vmin", "vmax", "vsum").orderBy("band")


def _raster_overview_refresh_oracle() -> str:
    x0, y0, w, h = _UPD_WIN
    red = _OV_REDUCE.format(src="upd")
    return f"""
    with px as ({PIXELS_CTE}),
    upd as (
      select band, x, y,
             case when x between {x0} and {x0 + w - 1}
                    and y between {y0} and {y0 + h - 1}
                    and (255 - value) <> 0
                  then 255 - value else value end as value
      from px
    ),
    ov as ({red})
    select band, count(*) as cnt, min(v) as vmin, max(v) as vmax,
           sum(v) as vsum
    from ov group by band order by band
    """


QUERIES["raster_overview_refresh"] = _raster_overview_refresh
ORACLES["raster_overview_refresh"] = _raster_overview_refresh_oracle()


# --- raster neighbors (apps/gdalalg_raster_neighbors.cpp) -------------------
# gaussian-3x3 weighted mean over grad100: each output pixel is a
# dyadic rational (integer sum / 16), so the SQL mirror with clamped
# (edge-replicate) coordinates is exact.

_NB_K3 = [[1, 2, 1], [2, 4, 2], [1, 2, 1]]


def _raster_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = RF.neighbors(_blocks(spark), kernel="gaussian-3x3", method="mean")
    s = ops.band_stats(out)
    return s.select(
        "band", "cnt",
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
        F.round("vsum", 6).alias("vsum"),
    ).orderBy("band")


def _raster_neighbors_oracle() -> str:
    terms = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = _NB_K3[dy + 1][dx + 1]
            cx = f"least(greatest(x + ({dx}), 0), {W - 1})"
            cy = f"least(greatest(y + ({dy}), 0), {H - 1})"
            terms.append(
                f"{k} * ({model.VALUE_SQL.format(x=cx, y=cy, band='band')})"
            )
    expr = " + ".join(terms)
    return f"""
    with cells as (
      select x.x as x, y.y as y, b.band as band
      from (select unnest(range({W})) as x) x
      cross join (select unnest(range({H})) as y) y
      cross join (select unnest(range(1, {BANDS + 1})) as band) b
    ),
    nb as (
      select band, cast(({expr}) as double) / 16.0 as v from cells
    )
    select band, count(*) as cnt,
           round(min(v), 6) as vmin, round(max(v), 6) as vmax,
           round(sum(v), 6) as vsum
    from nb group by band order by band
    """


QUERIES["raster_neighbors"] = _raster_neighbors
ORACLES["raster_neighbors"] = _raster_neighbors_oracle()


# --- multi-input calc (apps/gdalalg_raster_calc.cpp:609,717) ----------------
# Two NAMED inputs (bands 1 and 2 of the analytic grid as separate
# variables A and B) + an indexed expression; oracle = the same
# arithmetic over the analytic band formulas, exactly the
# raster_calc_expression discipline.

_CALC_MULTI_EXPR = "A[1] + 2*B[2] + where(A[1] > B[2], 1, 0) - min(A[1], B[2])"


def _calc_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.calc import calc_multi

    g = _blocks(spark)
    out = calc_multi(
        {"A": g.where("band = 1"), "B": g.where("band = 2")},
        _CALC_MULTI_EXPR,
    )
    return (
        ops.as_features(out)
        .where("x < 40 and y < 40")
        .select("x", "y", F.round("value", 6).alias("value"))
    )


def _calc_multi_oracle() -> str:
    def val(b):
        return (
            "cast(("
            + model.VALUE_SQL.format(x="x.x", y="y.y", band=str(b))
            + ") as double)"
        )

    v1, v2 = val(1), val(2)
    return f"""
    select x.x as x, y.y as y,
           round({v1} + 2 * {v2}
                 + (case when {v1} > {v2} then 1 else 0 end)
                 - least({v1}, {v2}), 6) as value
    from (select unnest(range(40)) as x) x
    cross join (select unnest(range(40)) as y) y
    """


QUERIES["raster_calc_multi"] = _calc_multi_query
ORACLES["raster_calc_multi"] = _calc_multi_oracle()


# --- contour polygons (apps/gdalalg_raster_contour.cpp:75 --polygonize) -----
# Level bands of the analytic plane z = 3x + 4y; every band is a
# single 4-connected region (linear ramp, band width >= the max pixel
# step), so region counts, pixel counts and the amin/amax bounds are
# all closed-form in SQL.  Geometry (traced rings, area == n_pixels)
# is pinned by tests/test_polygonize.py.

_CP_LEVELS = [50.0, 100.0, 200.0, 300.0]


def _contour_polygons_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.contour import contour_polygons

    g = model.synth_blocks(spark, model.plane_spec())
    cp = contour_polygons(g, _CP_LEVELS, 60, 60)
    return (
        cp.groupBy("band_code")
        .agg(
            F.count("*").alias("n_regions"),
            F.sum("n_pixels").alias("n_pixels"),
            F.min("amin").alias("amin"),
            F.min("amax").alias("amax"),
        )
        .orderBy("band_code")
    )


def _contour_polygons_oracle() -> str:
    lv = _CP_LEVELS
    code = (
        "case "
        + " ".join(
            f"when z < {lv[i]} then {i}" for i in range(len(lv))
        )
        + f" else {len(lv)} end"
    )
    amin = (
        "case band_code "
        + " ".join(
            f"when {i + 1} then cast({lv[i]} as double)"
            for i in range(len(lv))
        )
        + " else null end"
    )
    amax = (
        "case band_code "
        + " ".join(
            f"when {i} then cast({lv[i]} as double)" for i in range(len(lv))
        )
        + " else null end"
    )
    return f"""
    with px as (
      select cast(3 * x.x + 4 * y.y as double) as z
      from (select unnest(range(60)) as x) x
      cross join (select unnest(range(60)) as y) y
    ),
    c as (select ({code}) as band_code from px)
    select band_code, cast(1 as bigint) as n_regions,
           count(*) as n_pixels, ({amin}) as amin, ({amax}) as amax
    from c group by band_code order by band_code
    """


QUERIES["raster_contour_polygons"] = _contour_polygons_q
ORACLES["raster_contour_polygons"] = _contour_polygons_oracle()


# --- band histogram (gcore/gdalrasterband.cpp GetHistogram) -----------------
# 16 buckets over [0, 256): bucket = value div 16 on the analytic
# uint8 fixture — exact integer SQL mirror of the floor((v-min)*scale)
# rule.


def _raster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.histogram(_blocks(spark), 0.0, 256.0, 16)


def _raster_histogram_oracle() -> str:
    v = model.VALUE_SQL.format(x="x.x", y="y.y", band="b.band")
    return f"""
    with px as (
      select b.band as band, (({v}) // 16) as bucket
      from (select unnest(range(100)) as x) x
      cross join (select unnest(range(100)) as y) y
      cross join (select unnest([1, 2, 3]) as band) b
    )
    select band, cast(bucket as bigint) as bucket, count(*) as n
    from px group by band, bucket order by band, bucket
    """


QUERIES["raster_histogram"] = _raster_histogram
ORACLES["raster_histogram"] = _raster_histogram_oracle()


# --- cutline clip (gdalwarp -cutline / gdal raster clip --geometry) ---

def _raster_clip_cutline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip grad100 with the layer-A NYC octagon (polygon 0): pixels
    whose center falls outside the cutline become nodata-fill (0 for
    the uint8 fixture).  Per-band exact integer report: sum of the
    clipped raster (outside contributes 0) + count of nonzero kept
    pixels."""
    rings = [tables.polygon_rings_local(0)]
    clipped = ops.clip_cutline(_blocks(spark), rings)
    f = ops.as_features(clipped)
    return (
        f.groupBy("band")
        .agg(
            F.sum(F.col("value").cast("long")).alias("value_sum"),
            F.sum(F.when(F.col("value") != 0, 1).otherwise(0))
            .cast("long")
            .alias("n_nonzero"),
        )
        .orderBy("band")
    )


def _clip_cutline_oracle() -> str:
    gt = _gt()
    ring = tables.polygon_rings_local(0)[:-1]
    n = len(ring)
    edges = " union all ".join(
        f"select cast({ring[k][0]!r} as double) as x1, "
        f"cast({ring[k][1]!r} as double) as y1, "
        f"cast({ring[(k + 1) % n][0]!r} as double) as x2, "
        f"cast({ring[(k + 1) % n][1]!r} as double) as y2"
        for k in range(n)
    )
    return f"""
    with px as ({PIXELS_CTE}),
    pc as (
      select x, y, band, value,
             {gt[0]!r} + (x + 0.5) * {gt[1]!r} as lon,
             {gt[3]!r} + (y + 0.5) * {gt[5]!r} as lat
      from px
    ),
    e as ({edges}),
    hits as (
      select p.x, p.y, p.band, p.value,
             sum(case when ((e.y1 > p.lat) <> (e.y2 > p.lat))
                       and (p.lon < (e.x2 - e.x1) * (p.lat - e.y1)
                                    / (e.y2 - e.y1) + e.x1)
                  then 1 else 0 end) as crossings
      from pc p join e on true
      group by p.x, p.y, p.band, p.value
    )
    select band,
           cast(sum(case when crossings % 2 = 1
                         then cast(value as bigint) else 0 end) as bigint)
             as value_sum,
           cast(sum(case when crossings % 2 = 1 and value <> 0
                         then 1 else 0 end) as bigint) as n_nonzero
    from hits group by band order by band
    """


QUERIES["raster_clip_cutline"] = _raster_clip_cutline
ORACLES["raster_clip_cutline"] = _clip_cutline_oracle()
