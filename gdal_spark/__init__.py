"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query and data-processing capabilities of GDAL/OGR 3.13
(reference: jjimenezshaw/gdal) as DataFrame-level operators over Parquet/
Iceberg tables of Common-Crawl-style web pages:

- S2/quadkey cell indexing via vectorized numpy Arrow UDFs
  (reference's cell systems: XYZ tile matrix apps/gdalalg_raster_tile.cpp,
  CPLQuadTree port/cpl_quad_tree.cpp, Hilbert codes alg/hilbert.cpp)
- spatial join = envelope filter (broadcast packed R-tree, cf. FlatGeobuf
  ogr/ogrsf_frmts/flatgeobuf/packedrtree.h) + ray-casting point-in-polygon
  refine (cf. GEOS prepared Intersects in ogr/ogrsf_frmts/generic/
  ogrlayer.cpp:3981-4048 and the scanline fill in alg/llrasterize.cpp)
- kNN by cell-ring expansion + exact haversine re-rank
  (cf. quadtree radius search in alg/gdalgrid.cpp:256-384)
- raster warp/resample/tile-pyramid as numpy block kernels
  (cf. alg/gdalwarpkernel.cpp, apps/gdalalg_raster_tile.cpp)
- OGR-SQL semantic parity layer (first-match joins, summary aggregates,
  LIKE rules — ogr/swq*.cpp, ogr/ogrsf_frmts/generic/ogr_gensql.cpp)

All hot paths are vectorized Arrow/pandas UDFs — zero per-row Python.
Everything here is a new Spark-first design, not a port of the C++.
"""

__version__ = "0.1.0"

from gdal_spark.session import get_spark  # noqa: F401
