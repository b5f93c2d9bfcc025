"""Hierarchical cell indexes: WebMercatorQuad tiles (quadkey) and S2 cells.

The reference's cell systems are the XYZ tile matrix
(apps/gdalalg_raster_tile.cpp, gcore/tilematrixset.hpp), CPLQuadTree
(port/cpl_quad_tree.cpp) and Hilbert codes (alg/hilbert.cpp). This engine
uses the same quadtree tiles for tile assignment and exposes an
S2-style 64-bit cell id (face + Hilbert curve) as the spatial join /
clustering / kNN-ring key. All encoders are numpy-vectorized.
"""

from gdal_spark.cellindex.tile import (  # noqa: F401
    lonlat_to_tile,
    tile_bounds_3857,
    quadkey,
    parent_tile,
)
from gdal_spark.cellindex.s2 import (  # noqa: F401
    lonlat_to_cell,
    cell_parent,
    cell_level,
    cell_to_lonlat,
)
from gdal_spark.cellindex.hilbert import hilbert_code  # noqa: F401
