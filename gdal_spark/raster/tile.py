"""XYZ tile-pyramid generation — the engine's scale-out core operator
(gdal raster tile / gdal2tiles.py, SURVEY §2.9 + §3.3).

Spark re-expression of apps/gdalalg_raster_tile.cpp:

  1. tile cover: each source block computes the (z, tx, ty) tiles its
     georeferenced bbox feeds at the base zoom (pure math, no shuffle).
  2. ONE shuffle keyed by (band, z, tx, ty) replicating each block to
     the tiles it overlaps — the distributed analog of the reference's
     spawn-sharding by tile ranges (gdalalg_raster_tile.cpp:96-120).
  3. per-tile applyInPandas warp kernel: tile pixel centers (EPSG:3857)
     → inverse web-mercator → lon/lat → inverse geotransform → source
     pixels → nearest/bilinear sample from the assembled block mosaic —
     the WarpRegionToBuffer step (gdalalg_raster_tile.cpp:636-664) as a
     numpy gather.
  4. overview zooms: groupBy(parent tile) over ≤4 children, 2×2 average
     reduce (overview construction, gdalalg_raster_tile.cpp:1466).
  5. resume: anti-join against a manifest of already-produced
     (band, z, x, y) — the --resume contract (gdalalg_raster_tile.cpp:280)
     over an Iceberg/parquet checkpoint table.

Tile math uses GDAL's exact GlobalMercator constants via
gdal_spark.cellindex.tile (gdal2tiles.py:315-505).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.cellindex.tile import (
    lonlat_to_meters,
    lonlat_to_tile,
    lonlat_to_tile_geodetic,
    meters_to_lonlat,
    resolution,
    resolution_geodetic,
    tile_bounds_3857,
    tile_bounds_geodetic,
)
from gdal_spark.portable import TILE_SIZE
from gdal_spark.raster import model
from gdal_spark.raster.ops import _PRIMES

TILE_SCHEMA = (
    "dataset string, band int, z int, tile_x long, tile_y long, "
    "dtype string, buf binary, checksum long"
)

_SHIP_SCHEMA = (
    "dataset string, band int, z int, tile_x long, tile_y long, "
    "x0 int, y0 int, width int, height int, dtype string, "
    "gt0 double, gt1 double, gt3 double, gt5 double, buf binary"
)


def _tile_checksum(arr: np.ndarray) -> int:
    v = (
        np.floor(arr.astype(np.float64) + 0.5).astype(np.int64)
        if arr.dtype.kind == "f"
        else arr.astype(np.int64)
    )
    n = v.size
    gidx = np.arange(n, dtype=np.int64)
    return int((v.ravel() % _PRIMES[gidx % 11]).sum() & 0xFFFF)


def _source_coords_exact(tx, ty, zz, gt0, gt1, gt3, gt5):
    """Exact per-pixel inverse transform: tile grid (3857) → lon/lat →
    fractional source pixels (pixel-center convention)."""
    minx, miny, maxx, maxy = tile_bounds_3857(np.array([tx]), np.array([ty]), zz)
    res = resolution(zz)
    px = minx[0] + (np.arange(TILE_SIZE) + 0.5) * res
    py = maxy[0] - (np.arange(TILE_SIZE) + 0.5) * res
    lon, lat = meters_to_lonlat(
        np.repeat(px[None, :], TILE_SIZE, 0),
        np.repeat(py[:, None], TILE_SIZE, 1),
    )
    sx = (lon - gt0) / gt1 - 0.5
    sy = (lat - gt3) / gt5 - 0.5
    return sx, sy


def _source_coords_geodetic(tx, ty, zz, gt0, gt1, gt3, gt5):
    """WorldCRS84Quad variant of the inverse transform: tile pixel
    centers ARE lon/lat (plate carree, gcore/tilematrixset.cpp:175-215),
    so the chain is purely linear — no transcendental step to
    mesh-approximate."""
    minlon, _, _, maxlat = tile_bounds_geodetic(
        np.array([tx]), np.array([ty]), zz
    )
    res = resolution_geodetic(zz)
    lon = minlon[0] + (np.arange(TILE_SIZE) + 0.5) * res
    lat = maxlat[0] - (np.arange(TILE_SIZE) + 0.5) * res
    sx = (np.repeat(lon[None, :], TILE_SIZE, 0) - gt0) / gt1 - 0.5
    sy = (np.repeat(lat[:, None], TILE_SIZE, 1) - gt3) / gt5 - 0.5
    return sx, sy


def _source_coords_approx(tx, ty, zz, gt0, gt1, gt3, gt5, mesh: int = 16):
    """Error-bounded approximate transform (GDALApproxTransformer parity,
    alg/gdaltransformer.cpp:58-61,2624-2633): exact-transform only a
    (mesh+1)² corner grid, bilinear-interpolate source coordinates for
    the 256² pixels. Cuts transcendental calls mesh²/65536-fold; the
    mercator→lat inverse is smooth so interpolation error ≪ 0.1 px at
    mesh=16 (pinned by tests/test_tiles.py)."""
    minx, miny, maxx, maxy = tile_bounds_3857(np.array([tx]), np.array([ty]), zz)
    res = resolution(zz)
    step = TILE_SIZE / mesh
    # mesh sample positions in pixel space (0.5 .. 255.5 inclusive ends)
    mpix = np.linspace(0.5, TILE_SIZE - 0.5, mesh + 1)
    mx = minx[0] + mpix * res
    my = maxy[0] - mpix * res
    lon_m, lat_m = meters_to_lonlat(
        np.repeat(mx[None, :], mesh + 1, 0),
        np.repeat(my[:, None], mesh + 1, 1),
    )
    sx_m = (lon_m - gt0) / gt1 - 0.5
    sy_m = (lat_m - gt3) / gt5 - 0.5
    # bilinear interpolate mesh → full grid
    t = (np.arange(TILE_SIZE) + 0.5 - 0.5) / ((TILE_SIZE - 1) / mesh)
    i0 = np.clip(np.floor(t).astype(np.int64), 0, mesh - 1)
    f = t - i0

    def interp(m2d):
        rows = (
            m2d[i0, :] * (1 - f)[:, None] + m2d[i0 + 1, :] * f[:, None]
        )
        return rows[:, i0] * (1 - f)[None, :] + rows[:, i0 + 1] * f[None, :]

    return interp(sx_m), interp(sy_m)


def base_tiles(
    blocks: DataFrame,
    z: int,
    resampling: str = "bilinear",
    approx_mesh: int = 0,
    scheme: str = "WebMercatorQuad",
    skip_blank_value: float | None = None,
) -> DataFrame:
    """Base-zoom tiles from the block table (stages 1-3 above).
    approx_mesh > 0 switches the coordinate transform to the mesh
    approximation (per-tile speedup at identical output within the
    error bound). `scheme` selects the tiling scheme
    (apps/gdalalg_raster_tile.cpp:205 --tiling-scheme): WebMercatorQuad
    (+ GoogleMapsCompatible/mercator aliases) or WorldCRS84Quad
    (+ geodetic alias); the geodetic grid is linear in lon/lat so the
    mesh approximation is a no-op there and is ignored. For the
    'raster' pixel-space scheme see raster_scheme_tiles()."""
    from gdal_spark.cellindex import tms

    scheme = tms.ALIASES.get(scheme, scheme)
    if scheme not in ("WebMercatorQuad", "WorldCRS84Quad"):
        raise ValueError(f"base_tiles: unsupported tiling scheme {scheme!r}")
    geodetic = scheme == "WorldCRS84Quad"
    cover_tile = lonlat_to_tile_geodetic if geodetic else lonlat_to_tile

    def ship(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                # block bbox in lon/lat (north-up affine, +1px margin for
                # the bilinear support at tile seams)
                lon0 = r.gt0 + (r.x0 - 1) * r.gt1
                lon1 = r.gt0 + (r.x0 + r.width + 1) * r.gt1
                lat0 = r.gt3 + (r.y0 - 1) * r.gt5
                lat1 = r.gt3 + (r.y0 + r.height + 1) * r.gt5
                lo, hi = min(lat0, lat1), max(lat0, lat1)
                tx0, ty0 = cover_tile(
                    np.array([min(lon0, lon1)]), np.array([hi]), z
                )
                tx1, ty1 = cover_tile(
                    np.array([max(lon0, lon1)]), np.array([lo]), z
                )
                for ty in range(int(ty0[0]), int(ty1[0]) + 1):
                    for tx in range(int(tx0[0]), int(tx1[0]) + 1):
                        out.append(
                            (
                                r.dataset,
                                r.band,
                                z,
                                tx,
                                ty,
                                r.x0,
                                r.y0,
                                r.width,
                                r.height,
                                r.dtype,
                                r.gt0,
                                r.gt1,
                                r.gt3,
                                r.gt5,
                                r.buf,
                            )
                        )
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in _SHIP_SCHEMA.split(", ")]
            )

    shipped = blocks.mapInPandas(ship, _SHIP_SCHEMA)

    def warp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dataset, band, zz, tx, ty = key
        r0 = pdf.iloc[0]
        # assemble the source mosaic spanned by the received blocks
        x0 = int(pdf.x0.min())
        y0 = int(pdf.y0.min())
        x1 = int((pdf.x0 + pdf.width).max())
        y1 = int((pdf.y0 + pdf.height).max())
        mosaic = np.full((y1 - y0, x1 - x0), np.nan, dtype=np.float64)
        for r in pdf.itertuples():
            a = model.decode((r.buf, r.height, r.width, r.dtype))
            mosaic[
                r.y0 - y0 : r.y0 - y0 + r.height,
                r.x0 - x0 : r.x0 - x0 + r.width,
            ] = a
        # tile pixel centers in scheme CRS → lon/lat → source pixel
        # coords (exact per-pixel, or mesh-approximated per approx_mesh;
        # geodetic tiles are already lon/lat — always exact & linear)
        if geodetic:
            sx, sy = _source_coords_geodetic(
                tx, ty, zz, r0.gt0, r0.gt1, r0.gt3, r0.gt5
            )
        elif approx_mesh:
            sx, sy = _source_coords_approx(
                tx, ty, zz, r0.gt0, r0.gt1, r0.gt3, r0.gt5, approx_mesh
            )
        else:
            sx, sy = _source_coords_exact(
                tx, ty, zz, r0.gt0, r0.gt1, r0.gt3, r0.gt5
            )
        sx = sx - x0
        sy = sy - y0
        h, w = mosaic.shape
        if resampling == "nearest":
            ix = np.clip(np.round(sx).astype(np.int64), 0, w - 1)
            iy = np.clip(np.round(sy).astype(np.int64), 0, h - 1)
            out = mosaic[iy, ix]
            valid = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
        else:  # bilinear
            fx = np.clip(sx, 0, w - 1)
            fy = np.clip(sy, 0, h - 1)
            ix0 = np.floor(fx).astype(np.int64)
            iy0 = np.floor(fy).astype(np.int64)
            ix1 = np.minimum(ix0 + 1, w - 1)
            iy1 = np.minimum(iy0 + 1, h - 1)
            wx = fx - ix0
            wy = fy - iy0
            out = (
                mosaic[iy0, ix0] * (1 - wx) * (1 - wy)
                + mosaic[iy0, ix1] * wx * (1 - wy)
                + mosaic[iy1, ix0] * (1 - wx) * wy
                + mosaic[iy1, ix1] * wx * wy
            )
            valid = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
        out = np.where(valid & np.isfinite(out), out, 0.0)
        if r0["dtype"] == "uint8":  # ["dtype"]: Series.dtype is shadowed
            arr = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
        else:
            arr = out.astype(np.dtype(r0["dtype"]))
        if skip_blank_value is not None and np.all(arr == skip_blank_value):
            # blank tile: emit nothing (the reference skips writing
            # all-transparent/nodata tiles, apps/gdalalg_raster_tile.cpp
            # --skip-blank area; composes with --resume because absent
            # tiles never enter the manifest)
            return pd.DataFrame(
                [], columns=[c.split()[0] for c in TILE_SCHEMA.split(", ")]
            )
        return pd.DataFrame(
            [
                (
                    dataset,
                    int(band),
                    int(zz),
                    int(tx),
                    int(ty),
                    str(arr.dtype),
                    np.ascontiguousarray(arr).tobytes(),
                    _tile_checksum(arr),
                )
            ],
            columns=[c.split()[0] for c in TILE_SCHEMA.split(", ")],
        )

    return shipped.groupBy("dataset", "band", "z", "tile_x", "tile_y").applyInPandas(
        warp, TILE_SCHEMA
    )


def overview_level(
    tiles: DataFrame, skip_blank_value: float | None = None
) -> DataFrame:
    """One pyramid step: z → z-1 by 2×2 average of ≤4 children
    (gdalalg_raster_tile.cpp overview zooms; average kernel of
    gcore/overview.cpp). Works for any quad-halving scheme — both
    WebMercatorQuad (2^z square) and WorldCRS84Quad (2*2^z x 2^z)
    matrices halve in BOTH dimensions per level, so the parent key is
    (tx//2, ty//2) in either scheme; the 'raster' scheme's
    DIV_ROUND_UP matrices reduce the same way. skip_blank_value: see
    base_tiles."""
    parented = tiles.select(
        "dataset",
        "band",
        (F.col("z") - 1).alias("z"),
        (F.col("tile_x") / 2).cast("long").alias("ptx"),
        (F.col("tile_y") / 2).cast("long").alias("pty"),
        "tile_x",
        "tile_y",
        "dtype",
        "buf",
    )

    def reduce4(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dataset, band, z, ptx, pty = key
        big = np.zeros((2 * TILE_SIZE, 2 * TILE_SIZE), dtype=np.float64)
        for r in pdf.itertuples():
            a = model.decode((r.buf, TILE_SIZE, TILE_SIZE, r.dtype)).astype(
                np.float64
            )
            ox = int(r.tile_x - 2 * ptx) * TILE_SIZE
            oy = int(r.tile_y - 2 * pty) * TILE_SIZE
            big[oy : oy + TILE_SIZE, ox : ox + TILE_SIZE] = a
        # 2×2 average (SSE2 average path, gcore/overview.cpp:543)
        red = big.reshape(TILE_SIZE, 2, TILE_SIZE, 2).mean(axis=(1, 3))
        dt = pdf.iloc[0]["dtype"]
        if dt == "uint8":
            arr = np.clip(np.floor(red + 0.5), 0, 255).astype(np.uint8)
        else:
            arr = red.astype(np.dtype(dt))
        if skip_blank_value is not None and np.all(arr == skip_blank_value):
            return pd.DataFrame(
                [], columns=[c.split()[0] for c in TILE_SCHEMA.split(", ")]
            )
        return pd.DataFrame(
            [
                (
                    dataset,
                    int(band),
                    int(z),
                    int(ptx),
                    int(pty),
                    str(arr.dtype),
                    np.ascontiguousarray(arr).tobytes(),
                    _tile_checksum(arr),
                )
            ],
            columns=[c.split()[0] for c in TILE_SCHEMA.split(", ")],
        )

    return parented.groupBy("dataset", "band", "z", "ptx", "pty").applyInPandas(
        reduce4, TILE_SCHEMA
    )


def tile_pyramid(
    blocks: DataFrame,
    z_base: int,
    z_min: int,
    resampling: str = "bilinear",
    scheme: str = "WebMercatorQuad",
    skip_blank_value: float | None = None,
) -> DataFrame:
    """Full pyramid z_base..z_min. The per-zoom loop is driver-side but
    each level is one distributed job; levels shrink 4× per step.
    scheme: WebMercatorQuad (default) or WorldCRS84Quad (+ aliases);
    skip_blank_value: drop uniform tiles of this value at every level
    before the sink (--skip-blank; a blank region produces NO rows and
    resume anti-joins are unaffected)."""
    level = base_tiles(
        blocks, z_base, resampling, scheme=scheme,
        skip_blank_value=skip_blank_value,
    )
    out = level
    for _ in range(z_base - z_min):
        level = overview_level(level, skip_blank_value=skip_blank_value)
        out = out.unionByName(level)
    return out


def raster_scheme_tiles(
    blocks: DataFrame,
    width_full: int,
    height_full: int,
    zoom_level_count: int | None = None,
    skip_blank_value: float | None = None,
) -> DataFrame:
    """`--tiling-scheme raster` pyramid: tiles in SOURCE PIXEL space
    (gcore/tilematrixset.cpp:560-600 createRaster; selected at
    apps/gdalalg_raster_tile.cpp:4602). The top zoom is the source at
    full resolution — tile (z_base, tx, ty) is the exact pixel window
    [ty*256:(ty+1)*256, tx*256:(tx+1)*256] zero-padded at the right and
    bottom edges — and each lower zoom halves, via the SAME 2x2-average
    overview reduce as the georeferenced schemes. No warp at all: the
    cover shuffle ships each block to the pixel-grid tiles it overlaps
    and the kernel pastes, so the base level is byte-exact with the
    source (the property gdal autotest checks for this scheme).

    zoom_level_count defaults to the reference's choice: enough levels
    that the whole raster fits one tile at z0
    (ceil(log2(max(w,h)/tile_size)) + 1)."""
    if zoom_level_count is None:
        n = 0
        while (max(width_full, height_full) + (256 << n) - 1) // (256 << n) > 1:
            n += 1
        zoom_level_count = n + 1
    z_base = zoom_level_count - 1

    def ship(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                tx0, tx1 = r.x0 // TILE_SIZE, (r.x0 + r.width - 1) // TILE_SIZE
                ty0, ty1 = r.y0 // TILE_SIZE, (r.y0 + r.height - 1) // TILE_SIZE
                for ty in range(ty0, ty1 + 1):
                    for tx in range(tx0, tx1 + 1):
                        out.append(
                            (r.dataset, r.band, z_base, tx, ty, r.x0, r.y0,
                             r.width, r.height, r.dtype, r.gt0, r.gt1,
                             r.gt3, r.gt5, r.buf)
                        )
            yield pd.DataFrame(
                out, columns=[c.split()[0] for c in _SHIP_SCHEMA.split(", ")]
            )

    shipped = blocks.mapInPandas(ship, _SHIP_SCHEMA)

    def paste(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dataset, band, zz, tx, ty = key
        r0 = pdf.iloc[0]
        arr = np.zeros((TILE_SIZE, TILE_SIZE), dtype=np.dtype(r0["dtype"]))
        px0, py0 = int(tx) * TILE_SIZE, int(ty) * TILE_SIZE
        for r in pdf.itertuples():
            a = model.decode((r.buf, r.height, r.width, r.dtype))
            bx0 = max(r.x0, px0)
            by0 = max(r.y0, py0)
            bx1 = min(r.x0 + r.width, px0 + TILE_SIZE)
            by1 = min(r.y0 + r.height, py0 + TILE_SIZE)
            if bx1 <= bx0 or by1 <= by0:
                continue
            arr[by0 - py0:by1 - py0, bx0 - px0:bx1 - px0] = a[
                by0 - r.y0:by1 - r.y0, bx0 - r.x0:bx1 - r.x0
            ]
        if skip_blank_value is not None and np.all(arr == skip_blank_value):
            return pd.DataFrame(
                [], columns=[c.split()[0] for c in TILE_SCHEMA.split(", ")]
            )
        return pd.DataFrame(
            [
                (dataset, int(band), int(zz), int(tx), int(ty),
                 str(arr.dtype), np.ascontiguousarray(arr).tobytes(),
                 _tile_checksum(arr))
            ],
            columns=[c.split()[0] for c in TILE_SCHEMA.split(", ")],
        )

    level = shipped.groupBy(
        "dataset", "band", "z", "tile_x", "tile_y"
    ).applyInPandas(paste, TILE_SCHEMA)
    out = level
    for _ in range(z_base):
        level = overview_level(level, skip_blank_value=skip_blank_value)
        out = out.unionByName(level)
    return out


def resume_filter(tiles: DataFrame, manifest: DataFrame) -> DataFrame:
    """Drop tiles already present in the checkpoint manifest
    (band, z, tile_x, tile_y) — the --resume anti-join."""
    return tiles.join(
        manifest.select("band", "z", "tile_x", "tile_y"),
        ["band", "z", "tile_x", "tile_y"],
        "left_anti",
    )
