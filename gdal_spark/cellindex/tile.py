"""WebMercatorQuad (XYZ) tile math — numpy vectorized.

Exact reproduction of the reference's GlobalMercator
(swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:315-505):
  originShift = 20037508.342789244
  initialResolution = 156543.03392804062
  res(z) = initialResolution / 2**z
  px = (mx + originShift) / res(z);  tx = ceil(px/256) - 1   (TMS)
  y_xyz = 2**z - 1 - y_tms          (apps/gdalalg_raster_tile.cpp:488)
The formulas here are operation-for-operation identical to the SQL in
gdal_spark.portable so both paths agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.portable import INITIAL_RESOLUTION, MAX_LAT, ORIGIN_SHIFT, TILE_SIZE


def lonlat_to_meters(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → EPSG:3857 (gdal2tiles.py:366-372)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_lonlat(mx: np.ndarray, my: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 → EPSG:4326 (gdal2tiles.py:374-383)."""
    lon = np.asarray(mx, dtype=np.float64) / ORIGIN_SHIFT * 180.0
    lat = np.asarray(my, dtype=np.float64) / ORIGIN_SHIFT * 180.0
    lat = (
        180.0
        / np.pi
        * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
    )
    return lon, lat


def resolution(z: int) -> float:
    return INITIAL_RESOLUTION / (2 ** z)


def lonlat_to_tile(
    lon: np.ndarray, lat: np.ndarray, z: int, xyz: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Tile indices at zoom z. xyz=True flips to top-origin convention."""
    mx, my = lonlat_to_meters(lon, np.clip(lat, -MAX_LAT, MAX_LAT))
    res = resolution(z)
    px = (mx + ORIGIN_SHIFT) / res
    py = (my + ORIGIN_SHIFT) / res
    tx = np.ceil(px / float(TILE_SIZE)).astype(np.int64) - 1
    ty = np.ceil(py / float(TILE_SIZE)).astype(np.int64) - 1
    n = np.int64(2 ** z)
    tx = np.clip(tx, 0, n - 1)
    ty = np.clip(ty, 0, n - 1)
    if xyz:
        ty = n - 1 - ty
    return tx, ty


def tile_bounds_3857(tx, ty, z: int, xyz: bool = True):
    """(minx, miny, maxx, maxy) in EPSG:3857 of tile(s)."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    if xyz:
        ty = (2 ** z) - 1 - ty  # back to TMS (bottom-origin)
    res = resolution(z)
    minx = tx * TILE_SIZE * res - ORIGIN_SHIFT
    miny = ty * TILE_SIZE * res - ORIGIN_SHIFT
    maxx = (tx + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    maxy = (ty + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    return minx, miny, maxx, maxy


def quadkey(tx, ty, z: int) -> np.ndarray:
    """Morton-interleaved quadtree key (Bing-style), int64. Useful as a
    single-column clustering / range-partition key per zoom."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    key = np.zeros_like(tx)
    for i in range(z):
        key |= ((tx >> i) & 1) << (2 * i)
        key |= ((ty >> i) & 1) << (2 * i + 1)
    return key | (np.int64(1) << np.int64(2 * z))  # level marker bit


# --- GlobalGeodetic / WorldCRS84Quad (gdal2tiles.py:534-630,
# gcore/tilematrixset.cpp:175-215): plate-carree pyramid, 2x1 tiles at
# z0, res(z) = (180/256)/2^z deg/px. Linear math — no trig anywhere,
# so the SQL oracle mirror is bit-exact by construction.
GEODETIC_RES_FACT = 180.0 / TILE_SIZE  # tmscompatible resFact (0.703125)


def resolution_geodetic(z: int) -> float:
    """deg/pixel at zoom z (gdal2tiles.py:604 GlobalGeodetic.Resolution)."""
    return GEODETIC_RES_FACT / (2 ** z)


def lonlat_to_tile_geodetic(
    lon: np.ndarray, lat: np.ndarray, z: int, xyz: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """WorldCRS84Quad tile indices at zoom z (gdal2tiles.py:582-598
    LonLatToPixels + PixelsToTile: tx = ceil(px/ts)-1 over the
    bottom-origin pyramid). Matrix is 2*2^z wide x 2^z tall; xyz=True
    flips to the top-origin convention (gdalalg_raster_tile.cpp:488)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    res = resolution_geodetic(z)
    px = (180.0 + lon) / res
    py = (90.0 + lat) / res
    tx = np.ceil(px / float(TILE_SIZE)).astype(np.int64) - 1
    ty = np.ceil(py / float(TILE_SIZE)).astype(np.int64) - 1
    n = np.int64(2 ** z)
    tx = np.clip(tx, 0, 2 * n - 1)
    ty = np.clip(ty, 0, n - 1)
    if xyz:
        ty = n - 1 - ty
    return tx, ty


def tile_bounds_geodetic(tx, ty, z: int, xyz: bool = True):
    """(minlon, minlat, maxlon, maxlat) of WorldCRS84Quad tile(s)
    (gdal2tiles.py:617-625 GlobalGeodetic.TileBounds)."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    if xyz:
        ty = (2 ** z) - 1 - ty  # back to TMS (bottom-origin)
    res = resolution_geodetic(z)
    minlon = tx * TILE_SIZE * res - 180.0
    minlat = ty * TILE_SIZE * res - 90.0
    maxlon = (tx + 1) * TILE_SIZE * res - 180.0
    maxlat = (ty + 1) * TILE_SIZE * res - 90.0
    return minlon, minlat, maxlon, maxlat


def parent_tile(tx, ty):
    """(z,x,y) → parent (x//2, y//2) at z-1 — the 4→1 pyramid reduce key
    (apps/gdalalg_raster_tile.cpp overview zoom construction)."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    return tx >> 1, ty >> 1
