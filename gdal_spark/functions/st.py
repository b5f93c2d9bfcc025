"""ST_* geometry function registry — the Spark analog of the reference's
SQLite-dialect spatial scalars (ogr/ogrsf_frmts/sqlite/
ogrsqlitesqlfunctions.cpp:956-1148: ST_Area ST_AsBinary ST_AsText
ST_Buffer ST_GeomFromText ST_GeomFromWKB ST_Length ST_MakePoint
ST_MakeValid ST_SRID ST_Union …) plus the OGRGeometry method surface
(ogr/ogr_geometry.h:429-600: predicates, constructive ops, measures).

Geometry columns are BinaryType ISO WKB. Every function is a pandas UDF
(Arrow batch in/out). Coordinate math is numpy; the per-geometry python
loop inside a batch is acceptable for *polygon-layer* columns (small
relative to point tables — the hot point paths use the dedicated
vectorized kernels in geometry.kernels / operators.spatial_join).

Set-operation functions accept arbitrary simple polygons on both sides:
concave second operands are ear-clipped into convex parts first
(geometry.clip *_general).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
)

from gdal_spark.geometry import clip as C
from gdal_spark.geometry import wkb as W
from gdal_spark.geometry import wkt as T
from gdal_spark.geometry.kernels import (
    bbox_of_rings,
    polygon_area,
    ring_centroid,
    ring_length,
)


def _rings(buf: bytes) -> list[np.ndarray]:
    return W.polygon_rings(bytes(buf))


def _ext(buf: bytes) -> np.ndarray:
    return _rings(buf)[0]


def _each(series: pd.Series, fn, dtype=object) -> pd.Series:
    return pd.Series(
        [None if b is None else fn(bytes(b)) for b in series], dtype=dtype
    )


def _each2(sa: pd.Series, sb: pd.Series, fn, dtype=object) -> pd.Series:
    return pd.Series(
        [
            None if a is None or b is None else fn(bytes(a), bytes(b))
            for a, b in zip(sa, sb)
        ],
        dtype=dtype,
    )


def _area(buf: bytes) -> float:
    t, payload = W.parse_wkb(buf)
    if t == W.POLYGON:
        return polygon_area(payload)
    if t == W.MULTIPOLYGON:
        return float(sum(polygon_area(rings) for (_, rings) in payload))
    return 0.0


def _length(buf: bytes) -> float:
    t, payload = W.parse_wkb(buf)
    if t == W.LINESTRING:
        d = np.diff(payload, axis=0)
        return float(np.hypot(d[:, 0], d[:, 1]).sum())
    if t == W.POLYGON:
        return float(sum(ring_length(np.vstack([r, r[:1]])
                                     if not np.array_equal(r[0], r[-1]) else r)
                         for r in payload))
    if t in (W.MULTILINESTRING, W.MULTIPOLYGON):
        return float(sum(_length_part(p) for p in payload))
    return 0.0


def _length_part(parsed) -> float:
    t, payload = parsed
    if t == W.LINESTRING:
        d = np.diff(payload, axis=0)
        return float(np.hypot(d[:, 0], d[:, 1]).sum())
    if t == W.POLYGON:
        return float(sum(ring_length(np.vstack([r, r[:1]])
                                     if not np.array_equal(r[0], r[-1]) else r)
                         for r in payload))
    return 0.0


def _centroid(buf: bytes) -> bytes:
    t, payload = W.parse_wkb(buf)
    if t == W.POINT:
        return buf
    if t == W.LINESTRING:
        seg = np.diff(payload, axis=0)
        ln = np.hypot(seg[:, 0], seg[:, 1])
        mid = (payload[:-1] + payload[1:]) / 2.0
        tot = ln.sum()
        c = mid.mean(axis=0) if tot == 0 else (mid * ln[:, None]).sum(0) / tot
        return W.points_to_wkb([c[0]], [c[1]])[0]
    cx, cy = ring_centroid(_rings(buf))
    return W.points_to_wkb([cx], [cy])[0]


def _envelope(buf: bytes) -> bytes:
    t, payload = W.parse_wkb(buf)
    if t == W.POINT:
        return buf
    if t in (W.POLYGON, W.MULTIPOLYGON):
        minx, miny, maxx, maxy = bbox_of_rings(_rings(buf))
    else:
        c = payload if t == W.LINESTRING else np.vstack([p for (_, p) in payload])
        minx, miny = c.min(axis=0)
        maxx, maxy = c.max(axis=0)
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]], dtype=np.float64
    )
    return W.polygon_to_wkb([ring])


def _npoints(buf: bytes) -> int:
    t, payload = W.parse_wkb(buf)
    if t == W.POINT:
        return 1
    if t == W.LINESTRING:
        return len(payload)
    if t == W.POLYGON:
        return int(sum(len(r) for r in payload))
    return int(sum(_npoints_part(p) for p in payload))


def _npoints_part(parsed) -> int:
    t, payload = parsed
    if t == W.POINT:
        return 1
    if t == W.LINESTRING:
        return len(payload)
    if t == W.POLYGON:
        return int(sum(len(r) for r in payload))
    return 0


def _is_valid(buf: bytes) -> bool:
    """Basic validity: ≥3 distinct vertices per ring, finite coords,
    non-zero area (full GEOS-grade validity is out of scope)."""
    try:
        t, payload = W.parse_wkb(buf)
    except Exception:  # noqa: BLE001
        return False
    if t == W.POINT:
        return bool(np.isfinite(payload).all())
    if t == W.LINESTRING:
        return len(payload) >= 2 and bool(np.isfinite(payload).all())
    if t == W.POLYGON:
        for r in payload:
            rr = C._open(r)
            if len(rr) < 3 or not np.isfinite(rr).all():
                return False
            if abs(C.ring_area(rr)) == 0:
                return False
        return True
    if t == W.MULTIPOLYGON:
        return all(
            _is_valid(W.polygon_to_wkb(rings)) for (_, rings) in payload
        )
    return True


def _pieces_to_wkb(pieces: list[np.ndarray]) -> bytes | None:
    if not pieces:
        return None
    if len(pieces) == 1:
        return W.polygon_to_wkb([pieces[0]])
    return W.multipolygon_to_wkb([[p] for p in pieces])


def _intersection(a: bytes, b: bytes) -> bytes | None:
    return _pieces_to_wkb(C.clip_general(_ext(a), _ext(b)))


def _difference(a: bytes, b: bytes) -> bytes | None:
    return _pieces_to_wkb(C.difference_general(_ext(a), _ext(b)))


def _union(a: bytes, b: bytes) -> bytes | None:
    return _pieces_to_wkb(C.union_general(_ext(a), _ext(b)))


def _sym_difference(a: bytes, b: bytes) -> bytes | None:
    return _pieces_to_wkb(C.sym_difference_general(_ext(a), _ext(b)))


def register_st_functions(spark: SparkSession) -> None:
    """Register the ST_ registry on a session (idempotent)."""
    reg = spark.udf.register
    P = F.pandas_udf

    reg("st_area", P(lambda s: _each(s, _area, "float64"), DoubleType()))
    reg("st_length", P(lambda s: _each(s, _length, "float64"), DoubleType()))
    reg("st_astext", P(lambda s: _each(s, T.wkb_to_wkt), StringType()))
    reg("st_geomfromtext", P(
        lambda s: pd.Series([None if v is None else T.wkt_to_wkb(v) for v in s]),
        BinaryType(),
    ))
    reg("st_x", P(
        lambda s: _each(s, lambda b: float(W.parse_wkb(b)[1][0, 0]), "float64"),
        DoubleType(),
    ))
    reg("st_y", P(
        lambda s: _each(s, lambda b: float(W.parse_wkb(b)[1][0, 1]), "float64"),
        DoubleType(),
    ))
    reg("st_makepoint", P(
        lambda x, y: pd.Series(
            W.points_to_wkb(x.to_numpy("float64"), y.to_numpy("float64"))
        ),
        BinaryType(),
    ))
    reg("st_centroid", P(lambda s: _each(s, _centroid), BinaryType()))
    reg("st_envelope", P(lambda s: _each(s, _envelope), BinaryType()))
    reg("st_numpoints", P(lambda s: _each(s, _npoints, "int32"), IntegerType()))
    reg("st_isvalid", P(lambda s: _each(s, _is_valid, "boolean"), BooleanType()))
    reg("st_srid", P(lambda s: _each(s, lambda b: 4326, "int32"), IntegerType()))
    reg("st_convexhull", P(
        lambda s: _each(
            s, lambda b: W.polygon_to_wkb([C.convex_hull(np.vstack(_rings(b)))])
        ),
        BinaryType(),
    ))
    reg("st_buffer", P(
        lambda s, d: pd.Series(
            [
                None if b is None else _buffer(bytes(b), float(dv))
                for b, dv in zip(s, d)
            ]
        ),
        BinaryType(),
    ))
    reg("st_simplify", P(
        lambda s, t: pd.Series(
            [
                None
                if b is None
                else W.polygon_to_wkb([C.simplify_dp(_ext(bytes(b)), float(tv))])
                for b, tv in zip(s, t)
            ]
        ),
        BinaryType(),
    ))

    reg("st_intersects", P(
        lambda a, b: _each2(
            a, b, lambda x, y: C.polygons_intersect(_ext(x), _ext(y)), "boolean"
        ),
        BooleanType(),
    ))
    reg("st_disjoint", P(
        lambda a, b: _each2(
            a, b,
            lambda x, y: not C.polygons_intersect(_ext(x), _ext(y)),
            "boolean",
        ),
        BooleanType(),
    ))
    reg("st_contains", P(
        lambda a, b: _each2(
            a, b, lambda x, y: C.polygon_contains(_ext(x), _ext(y)), "boolean"
        ),
        BooleanType(),
    ))
    reg("st_within", P(
        lambda a, b: _each2(
            a, b, lambda x, y: C.polygon_contains(_ext(y), _ext(x)), "boolean"
        ),
        BooleanType(),
    ))
    reg("st_distance", P(
        lambda a, b: _each2(
            a, b,
            lambda x, y: C.polygon_distance(_ext(x), _ext(y)),
            "float64",
        ),
        DoubleType(),
    ))
    reg("st_intersection", P(lambda a, b: _each2(a, b, _intersection), BinaryType()))
    reg("st_union", P(lambda a, b: _each2(a, b, _union), BinaryType()))
    reg("st_difference", P(lambda a, b: _each2(a, b, _difference), BinaryType()))
    reg("st_symdifference", P(
        lambda a, b: _each2(a, b, _sym_difference), BinaryType()
    ))


def _buffer(buf: bytes, dist: float) -> bytes | None:
    t, payload = W.parse_wkb(buf)
    if t == W.POINT:
        return W.polygon_to_wkb([C.buffer_point(payload[0, 0], payload[0, 1], dist)])
    ring = C.buffer_polygon(_ext(buf), dist)
    if len(ring) < 3:
        return None
    return W.polygon_to_wkb([ring])


def _swap_xy(buf: bytes) -> bytes:
    """swap-xy (apps/gdalalg_vector_swap_xy.cpp): exchange coordinate
    order in place."""
    t, payload = W.parse_wkb(buf)
    if t == W.POINT:
        return W.points_to_wkb([payload[0, 1]], [payload[0, 0]])[0]
    if t == W.LINESTRING:
        return W.linestring_to_wkb(payload[:, ::-1])
    if t == W.POLYGON:
        return W.polygon_to_wkb([r[:, ::-1] for r in payload])
    if t == W.MULTIPOLYGON:
        return W.multipolygon_to_wkb(
            [[r[:, ::-1] for r in rings] for (_, rings) in payload]
        )
    raise ValueError(f"swap_xy: unsupported type {t}")


def register_extra_st(spark: SparkSession) -> None:
    """Additional vector-pipeline steps: swap-xy, num-geometries."""
    reg = spark.udf.register
    P = F.pandas_udf
    reg("st_swapxy", P(lambda s: _each(s, _swap_xy), BinaryType()))
    reg("st_numgeometries", P(
        lambda s: _each(
            s,
            lambda b: (
                len(W.parse_wkb(b)[1])
                if W.parse_wkb(b)[0]
                in (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON, W.COLLECTION)
                else 1
            ),
            "int32",
        ),
        IntegerType(),
    ))
