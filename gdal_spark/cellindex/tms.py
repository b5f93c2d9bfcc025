"""OGC TileMatrixSet registry — parity with gcore/tilematrixset.cpp.

Implements the predefined tile matrix sets the reference ships
(gcore/tilematrixset.cpp:33-260: GoogleMapsCompatible/WebMercatorQuad,
WorldCRS84Quad + its InspireCRS84Quad / PseudoTMS_GlobalGeodetic
aliases, GoogleCRS84Quad, WorldMercatorWGS84Quad,
PseudoTMS_GlobalMercator) plus the synthetic per-dataset "raster"
scheme (gcore/tilematrixset.cpp:560-600 TileMatrixSet::createRaster,
used by `gdal raster tile --tiling-scheme raster`,
apps/gdalalg_raster_tile.cpp:4602).

All tile math is vectorized numpy over the matrix definition — these
objects are tiny immutable descriptors, safe to close over in
mapInPandas workers (broadcast by pickling with the task, no driver
state).  Indexing convention inside a TileMatrix is the OGC one: row 0
at the TOP (top-left origin), which is the XYZ convention; the TMS
bottom-origin flip is applied by callers (y_tms = matrix_height-1-y,
apps/gdalalg_raster_tile.cpp:488).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

HALF_CIRCUMFERENCE = 20037508.342789244  # pi * 6378137


@dataclass(frozen=True)
class TileMatrix:
    """One zoom level of a tile matrix set (OGC 17-083r4 §7)."""

    z: int
    res_x: float
    res_y: float
    top_left_x: float
    top_left_y: float
    tile_width: int
    tile_height: int
    matrix_width: int
    matrix_height: int
    scale_denominator: float

    def tile_for(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        """Planar CRS coords → (tx, ty) top-origin tile indices, clipped
        to the matrix. Uses the gdal2tiles convention tx=ceil(px/ts)-1
        (gdal2tiles.py:398-412 PixelsToTile) so points exactly on a tile
        boundary belong to the LOWER-index tile — identical to the
        engine's WebMercatorQuad SQL mirror."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        px = (x - self.top_left_x) / self.res_x
        py = (self.top_left_y - y) / self.res_y
        tx = np.ceil(px / float(self.tile_width)).astype(np.int64) - 1
        ty = np.ceil(py / float(self.tile_height)).astype(np.int64) - 1
        tx = np.clip(tx, 0, self.matrix_width - 1)
        ty = np.clip(ty, 0, self.matrix_height - 1)
        return tx, ty

    def tile_bounds(self, tx, ty):
        """(minx, miny, maxx, maxy) planar bounds of top-origin tiles."""
        tx = np.asarray(tx, dtype=np.int64)
        ty = np.asarray(ty, dtype=np.int64)
        minx = self.top_left_x + tx * self.tile_width * self.res_x
        maxx = self.top_left_x + (tx + 1) * self.tile_width * self.res_x
        maxy = self.top_left_y - ty * self.tile_height * self.res_y
        miny = self.top_left_y - (ty + 1) * self.tile_height * self.res_y
        return minx, miny, maxx, maxy


@dataclass(frozen=True)
class TileMatrixSet:
    identifier: str
    title: str
    crs: str
    bbox: tuple[float, float, float, float]  # lower x, lower y, upper x, upper y
    matrices: tuple[TileMatrix, ...] = field(default=())

    def matrix(self, z: int) -> TileMatrix:
        m = self.matrices[z]
        assert m.z == z
        return m

    @property
    def max_zoom(self) -> int:
        return len(self.matrices) - 1

    def zoom_for_res(self, pixel_size: float) -> int:
        """Max scaledown zoom whose resolution is >= pixel_size
        (gdal2tiles.py ZoomForPixelSize: 'we don't want to scale up')."""
        for m in self.matrices:
            if pixel_size > m.res_x:
                return max(0, m.z - 1)
        return self.max_zoom


def _quad(
    identifier: str,
    crs: str,
    res0: float,
    top_left: tuple[float, float],
    bbox: tuple[float, float, float, float],
    width0: int,
    height0: int,
    levels: int,
    scale_factor: float,
) -> TileMatrixSet:
    mats = tuple(
        TileMatrix(
            z=i,
            res_x=res0 / (1 << i),
            res_y=res0 / (1 << i),
            top_left_x=top_left[0],
            top_left_y=top_left[1],
            tile_width=256,
            tile_height=256,
            matrix_width=width0 * (1 << i),
            matrix_height=height0 * (1 << i),
            scale_denominator=res0 / (1 << i) * scale_factor / 0.28e-3,
        )
        for i in range(levels + 1)
    )
    return TileMatrixSet(identifier, identifier, crs, bbox, mats)


_M = HALF_CIRCUMFERENCE
_METER_SCALE = 1.0
_DEG_SCALE = HALF_CIRCUMFERENCE / 180.0  # degree-CRS scale denominators


def _predefined() -> dict[str, TileMatrixSet]:
    sets = {}
    # gcore/tilematrixset.cpp:70-108 (GoogleMapsCompatible == WebMercatorQuad)
    sets["WebMercatorQuad"] = _quad(
        "WebMercatorQuad",
        "http://www.opengis.net/def/crs/EPSG/0/3857",
        2 * _M / 256,
        (-_M, _M),
        (-_M, -_M, _M, _M),
        1,
        1,
        30,
        _METER_SCALE,
    )
    # gcore/tilematrixset.cpp:110-141
    sets["WorldMercatorWGS84Quad"] = _quad(
        "WorldMercatorWGS84Quad",
        "http://www.opengis.net/def/crs/EPSG/0/3395",
        2 * _M / 256,
        (-_M, _M),
        (-_M, -_M, _M, _M),
        1,
        1,
        30,
        _METER_SCALE,
    )
    # gcore/tilematrixset.cpp:143-172
    sets["PseudoTMS_GlobalMercator"] = _quad(
        "PseudoTMS_GlobalMercator",
        "http://www.opengis.net/def/crs/EPSG/0/3857",
        _M / 256,
        (-_M, _M),
        (-_M, -_M, _M, _M),
        2,
        2,
        29,
        _METER_SCALE,
    )
    # gcore/tilematrixset.cpp:175-215 — the geodetic quad (2x1 at z0,
    # res0 = 180/256 deg/px); zoom capped at 29 (matrix_width int32)
    sets["WorldCRS84Quad"] = _quad(
        "WorldCRS84Quad",
        "http://www.opengis.net/def/crs/OGC/1.3/CRS84",
        180.0 / 256,
        (-180.0, 90.0),
        (-180.0, -90.0, 180.0, 90.0),
        2,
        1,
        29,
        _DEG_SCALE,
    )
    # gcore/tilematrixset.cpp:217-252 — 1 square tile at z0 covering
    # [-180,180]x[-180,180] (top_left_y = 180, NOT 90)
    sets["GoogleCRS84Quad"] = _quad(
        "GoogleCRS84Quad",
        "http://www.opengis.net/def/crs/OGC/1.3/CRS84",
        360.0 / 256,
        (-180.0, 180.0),
        (-180.0, -90.0, 180.0, 90.0),
        1,
        1,
        30,
        _DEG_SCALE,
    )
    return sets


_PREDEFINED = _predefined()

# apps/gdalalg_raster_tile.cpp:199-213 — identifier aliases accepted by
# `gdal raster tile --tiling-scheme`, incl. the gdal2tiles profile names
ALIASES = {
    "GoogleMapsCompatible": "WebMercatorQuad",
    "mercator": "WebMercatorQuad",
    "geodetic": "WorldCRS84Quad",
    "InspireCRS84Quad": "WorldCRS84Quad",
    "PseudoTMS_GlobalGeodetic": "WorldCRS84Quad",
}


def list_predefined() -> list[str]:
    """gcore/tilematrixset.cpp:33 listPredefinedTileMatrixSets (the
    built-in subset; json registry files are a format-driver concern)."""
    return ["GoogleMapsCompatible", *(k for k in _PREDEFINED if k != "WebMercatorQuad")]


def get(name: str) -> TileMatrixSet:
    """Resolve a scheme identifier or alias (tilematrixset.cpp parse)."""
    name = ALIASES.get(name, name)
    for full, short in (
        ("http://www.opengis.net/def/tilematrixset/OGC/1.0/", ""),
    ):
        if name.startswith(full):
            name = name[len(full):]
    if name not in _PREDEFINED:
        raise KeyError(f"unknown tile matrix set: {name!r}")
    return _PREDEFINED[name]


def from_json(obj: "dict | str", meters_per_unit: float = 1.0) -> TileMatrixSet:
    """Parse an OGC TileMatrixSet definition — TMS 2.0 ("id" +
    "tileMatrices"/"pointOfOrigin") or TMS 1.0 ("identifier" +
    "tileMatrix"/"topLeftCorner") — the format of the reference's
    tms_*.json registry files (gcore/tilematrixset.cpp:256-470).
    Resolution derives from the scale denominator per OGC 17-083r2
    Table 2 note g: res = scaleDenominator * 0.28e-3 / metersPerUnit.
    Scale denominators must be a strictly decreasing positive series;
    variable matrix widths are unsupported (like the reference's tile
    app, which skips such schemes, apps/gdalalg_raster_tile.cpp:195)."""
    import json as _json

    if isinstance(obj, str):
        obj = _json.loads(obj)
    v2 = "crs" in obj and "tileMatrices" in obj
    if not v2 and obj.get("type") != "TileMatrixSetType":
        raise ValueError("expected TMS 2.0 or type=TileMatrixSetType")
    ident = obj.get("id" if v2 else "identifier", "")
    crs = obj.get("crs", "")
    if isinstance(crs, dict):  # TMS 2.0 allows {"uri": ...}
        crs = crs.get("uri", "")
    bbox = obj.get("boundingBox", {})
    lower = bbox.get("lowerCorner", [float("nan")] * 2)
    upper = bbox.get("upperCorner", [float("nan")] * 2)
    mats = []
    last_sd = float("inf")
    for i, tm in enumerate(obj.get("tileMatrices" if v2 else "tileMatrix", [])):
        sd = float(tm["scaleDenominator"])
        if sd >= last_sd or sd <= 0:
            raise ValueError(
                "invalid or non-decreasing scale denominator series"
            )
        last_sd = sd
        if v2 and tm.get("cornerOfOrigin", "topLeft") != "topLeft":
            raise ValueError("cornerOfOrigin != topLeft not supported")
        if tm.get("variableMatrixWidths" if v2 else "variableMatrixWidth"):
            raise ValueError("variable matrix widths not supported")
        origin = tm["pointOfOrigin" if v2 else "topLeftCorner"]
        res = sd * 0.28e-3 / meters_per_unit
        tw, th = int(tm["tileWidth"]), int(tm["tileHeight"])
        mw, mh = int(tm["matrixWidth"]), int(tm["matrixHeight"])
        if min(tw, th, mw, mh) <= 0:
            raise ValueError("invalid tile/matrix dimensions")
        mats.append(
            TileMatrix(
                z=i,
                res_x=res,
                res_y=res,
                top_left_x=float(origin[0]),
                top_left_y=float(origin[1]),
                tile_width=tw,
                tile_height=th,
                matrix_width=mw,
                matrix_height=mh,
                scale_denominator=sd,
            )
        )
    return TileMatrixSet(
        ident,
        obj.get("title", ident),
        crs,
        (
            float(lower[0]), float(lower[1]),
            float(upper[0]), float(upper[1]),
        ),
        tuple(mats),
    )


def create_raster(
    width: int,
    height: int,
    tile_size: int,
    zoom_level_count: int,
    top_left_x: float,
    top_left_y: float,
    res_x_full: float,
    res_y_full: float,
    crs: str = "",
) -> TileMatrixSet:
    """The per-dataset 'raster' scheme: tiles in SOURCE pixel space, the
    top zoom at full resolution and each lower zoom at 2x the pixel
    size (gcore/tilematrixset.cpp:560-600 createRaster). The base-zoom
    tile grid is an exact pixel slicing of the source, so no warp is
    needed — `gdal raster tile --tiling-scheme raster` for
    non-georeferenced/any-CRS rasters."""
    assert width > 0 and height > 0 and tile_size > 0 and zoom_level_count > 0
    mats = []
    for i in range(zoom_level_count):
        i_rev = zoom_level_count - 1 - i
        res_x = res_x_full * (1 << i_rev)
        res_y = res_y_full * (1 << i_rev)
        mats.append(
            TileMatrix(
                z=i,
                res_x=res_x,
                res_y=res_y,
                top_left_x=top_left_x,
                top_left_y=top_left_y,
                tile_width=tile_size,
                tile_height=tile_size,
                matrix_width=max(1, -((width >> i_rev) // -tile_size)),
                matrix_height=max(1, -((height >> i_rev) // -tile_size)),
                scale_denominator=res_x / 0.28e-3,
            )
        )
    return TileMatrixSet(
        "raster",
        "raster",
        crs,
        (
            top_left_x,
            top_left_y - height * res_y_full,
            top_left_x + width * res_x_full,
            top_left_y,
        ),
        tuple(mats),
    )


def to_json(s: TileMatrixSet) -> dict:
    """Export the TMS 1.0 (17-083r2) JSON shape the reference writes
    (gcore/tilematrixset.cpp:611-656 exportToTMSJsonV1); round-trips
    through from_json (tile assignment parity, scale denominators
    preserved exactly)."""
    return {
        "type": "TileMatrixSetType",
        "identifier": s.identifier,
        "title": s.title,
        "supportedCRS": s.crs,
        "boundingBox": {
            "type": "BoundingBoxType",
            "crs": s.crs,
            "lowerCorner": [s.bbox[0], s.bbox[1]],
            "upperCorner": [s.bbox[2], s.bbox[3]],
        },
        "tileMatrix": [
            {
                "type": "TileMatrixType",
                "identifier": str(m.z),
                "scaleDenominator": m.scale_denominator,
                "topLeftCorner": [m.top_left_x, m.top_left_y],
                "tileWidth": m.tile_width,
                "tileHeight": m.tile_height,
                "matrixWidth": m.matrix_width,
                "matrixHeight": m.matrix_height,
            }
            for m in s.matrices
        ],
    }
