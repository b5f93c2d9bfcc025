"""Raster data model — the blocked "raster table" (SURVEY §1.2).

One row per (dataset, band, bx, by) block; the pixel payload is a
C-order numpy buffer in a binary column, mirroring how the reference
moves blocks (GDALRasterBlock, gcore/gdal_rasterblock.h:32) but with
Spark partitions replacing the LRU block cache. Georeferencing is the
6-coefficient affine geotransform carried as gt0..gt5 columns
(gcore/gdal_geotransform.h:41):

  lon = gt0 + (px + 0.5) * gt1 + (py + 0.5) * gt2      (pixel centers)
  lat = gt3 + (px + 0.5) * gt4 + (py + 0.5) * gt5

Synthetic fixtures replace file drivers (none needed for parity —
SURVEY §2.1): deterministic analytic value grids so the DuckDB oracle
can recompute any pixel from (x, y, band) in pure SQL:

  value(x, y, band) = (x*7 + y*13 + band*17) % 256        (uint8)

`grad100` covers city 0 (New York) ±2°, 100×100 pixels, blocked 32×32
(partial edge blocks exercise block-window logic), 3 bands.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark import portable

BLOCK_SCHEMA = (
    "dataset string, band int, bx int, by int, x0 int, y0 int, "
    "width int, height int, dtype string, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, gt5 double, "
    "nodata double, buf binary"
)

VALUE_SQL = "(({x}) * 7 + ({y}) * 13 + ({band}) * 17) % 256"


def value_grid(x0: int, y0: int, w: int, h: int, band: int) -> np.ndarray:
    """The analytic fixture values for a block window, uint8."""
    xs = np.arange(x0, x0 + w, dtype=np.int64)
    ys = np.arange(y0, y0 + h, dtype=np.int64)
    return ((xs[None, :] * 7 + ys[:, None] * 13 + band * 17) % 256).astype(
        np.uint8
    )


class GridSpec:
    """Dataset geometry: W×H pixels, affine gt, block size."""

    def __init__(
        self,
        name: str,
        width: int,
        height: int,
        gt: tuple[float, float, float, float, float, float],
        block: int = 32,
        bands: int = 3,
        dtype: str = "uint8",
        nodata: float | None = None,
    ):
        self.name = name
        self.width = width
        self.height = height
        self.gt = gt
        self.block = block
        self.bands = bands
        self.dtype = dtype
        self.nodata = nodata

    def n_blocks(self) -> tuple[int, int]:
        bs = self.block
        return (
            (self.width + bs - 1) // bs,
            (self.height + bs - 1) // bs,
        )

    def block_window(self, bx: int, by: int) -> tuple[int, int, int, int]:
        bs = self.block
        x0, y0 = bx * bs, by * bs
        return x0, y0, min(bs, self.width - x0), min(bs, self.height - y0)

    def extent(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy) in georeferenced coords (north-up gt)."""
        g = self.gt
        xs = [g[0], g[0] + self.width * g[1]]
        ys = [g[3], g[3] + self.height * g[5]]
        return min(xs), min(ys), max(xs), max(ys)


def grad100_spec() -> GridSpec:
    clat, clon = portable.CITIES[0]  # new york
    # north-up grid over city ±2°, 0.04°/pixel
    return GridSpec(
        "grad100",
        100,
        100,
        (clon - 2.0, 0.04, 0.0, clat + 2.0, 0.0, -0.04),
        block=32,
        bands=3,
    )


def plane_spec() -> GridSpec:
    """60×60 float32 inclined plane for DEM-derivative goldens:
    z = 3*x + 4*y (constant slope everywhere)."""
    return GridSpec(
        "plane60", 60, 60, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        block=32, bands=1, dtype="float32",
    )


def plane_values(x0: int, y0: int, w: int, h: int) -> np.ndarray:
    xs = np.arange(x0, x0 + w, dtype=np.float64)
    ys = np.arange(y0, y0 + h, dtype=np.float64)
    return (3.0 * xs[None, :] + 4.0 * ys[:, None]).astype(np.float32)


def synth_blocks(spark: SparkSession, spec: GridSpec) -> DataFrame:
    """Materialize the synthetic block table. Block rows are built
    driver-side (fixtures are tiny); a production source would be an
    Iceberg/parquet table with the same schema."""
    nbx, nby = spec.n_blocks()
    rows = []
    for band in range(1, spec.bands + 1):
        for by in range(nby):
            for bx in range(nbx):
                x0, y0, w, h = spec.block_window(bx, by)
                if spec.name == "plane60":
                    arr = plane_values(x0, y0, w, h)
                elif spec.name == "plateau48":
                    arr = plateau_values(x0, y0, w, h)
                elif spec.name == "checker48":
                    arr = checker_values(x0, y0, w, h)
                elif spec.name == "collar64":
                    arr = collar_values(x0, y0, w, h, band)
                else:
                    arr = value_grid(x0, y0, w, h, band)
                rows.append(
                    (
                        spec.name,
                        band,
                        bx,
                        by,
                        x0,
                        y0,
                        w,
                        h,
                        spec.dtype,
                        *[float(g) for g in spec.gt],
                        spec.nodata,
                        bytearray(np.ascontiguousarray(arr).tobytes()),
                    )
                )
    return spark.createDataFrame(rows, BLOCK_SCHEMA)


def decode(row_or_pdf_cols) -> np.ndarray:
    """buf bytes + (height,width,dtype) → 2-D array."""
    buf, h, w, dt = row_or_pdf_cols
    return np.frombuffer(bytes(buf), dtype=np.dtype(dt)).reshape(int(h), int(w))


def plateau_spec() -> GridSpec:
    """48×48 uint8 plateau raster for polygonize/sieve: value =
    ((x//8)*3 + (y//8)*5) % 7 → 8×8 plateaus, some sharing values with
    neighbors (cross-block merges at block=32)."""
    return GridSpec(
        "plateau48", 48, 48, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        block=32, bands=1, dtype="uint8",
    )


def checker_spec() -> GridSpec:
    """48×48 data/nodata checkerboard (16×16 tiles) for the footprint
    operator: data tiles touch only diagonally, so 4-connectivity gives
    five separate data regions with exactly-known outlines."""
    return GridSpec(
        "checker48", 48, 48, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        block=32, bands=1, dtype="uint8",
    )


def checker_values(x0: int, y0: int, w: int, h: int) -> np.ndarray:
    xs = np.arange(x0, x0 + w, dtype=np.int64)
    ys = np.arange(y0, y0 + h, dtype=np.int64)
    return (((xs[None, :] // 16 + ys[:, None] // 16) % 2 == 0) * 7).astype(
        np.uint8
    )


def plateau_values(x0: int, y0: int, w: int, h: int) -> np.ndarray:
    xs = np.arange(x0, x0 + w, dtype=np.int64)
    ys = np.arange(y0, y0 + h, dtype=np.int64)
    return (((xs[None, :] // 8) * 3 + (ys[:, None] // 8) * 5) % 7).astype(
        np.uint8
    )

def collar64_spec() -> GridSpec:
    """64×64×3 uint8 fixture for clean-collar (nearblack): a jagged
    near-black border of varying width, an interior near-black lake
    that does NOT touch the edge (must survive), and a bay connected
    to the edge only through an L-shaped path (flood fill removes it,
    the two-pass scan does not — the reference's algorithm choice,
    apps/gdalalg_raster_clean_collar.cpp:101-105)."""
    return GridSpec(
        "collar64", 64, 64, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
        block=32, bands=3,
    )


def collar_values(x0: int, y0: int, w: int, h: int, band: int) -> np.ndarray:
    xs = np.arange(x0, x0 + w, dtype=np.int64)[None, :]
    ys = np.arange(y0, y0 + h, dtype=np.int64)[:, None]
    W = H = 64
    border = (
        (xs < 3 + ys % 4)
        | (xs >= W - 2 - ys % 3)
        | (ys < 2 + xs % 5)
        | (ys >= H - 3 - xs % 2)
    )
    lake = (xs >= 20) & (xs < 26) & (ys >= 30) & (ys < 35)
    # bay: a corridor from the left border into an interior pocket —
    # edge-connected only through the horizontal leg at y in [40,42)
    leg = (xs >= 3) & (xs < 40) & (ys >= 40) & (ys < 42)
    pocket = (xs >= 36) & (xs < 44) & (ys >= 20) & (ys < 40)
    dark = border | lake | leg | pocket
    near = ((xs * 3 + ys * 5 + band) % 11).astype(np.uint8)
    bright = (60 + (xs * 7 + ys * 13 + band * 17) % 180).astype(np.uint8)
    return np.where(dark, near, bright)
