"""Vectorized geometry: WKB codec, numpy predicate/measure kernels,
convex clipping, and a packed Hilbert R-tree for broadcast probes.

Shapely is intentionally absent: the point-in-polygon refine is an
explicit ray-casting numpy kernel (the north-star requirement), matching
the even-odd rule of the reference's scanline rasterizer
(alg/llrasterize.cpp:31-58) and validated against a pure-SQL oracle.
"""

from gdal_spark.geometry.wkb import (  # noqa: F401
    points_to_wkb,
    wkb_points_to_xy,
    polygon_to_wkb,
    parse_wkb,
)
from gdal_spark.geometry.kernels import (  # noqa: F401
    points_in_rings,
    haversine_m,
    ring_area,
    ring_is_ccw,
)
from gdal_spark.geometry.strtree import PackedRTree  # noqa: F401
