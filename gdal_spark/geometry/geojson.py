"""GeoJSON (RFC 7946) codec over the structured WKB lattice.

The interchange format OGR users export to first (the reference's
GeoJSON driver, `ogr/ogrsf_frmts/geojson/` — here a FORMAT codec, not a
file driver: the engine's I/O stays parquet per SURVEY §2.1, and GeoJSON
strings live in ordinary string columns).

Emission uses the same shortest-roundtrip number formatting as the WKT
codec (`wkt._num`), so `round(x, 3)`-quantized fixtures are bit-equal to
DuckDB's varchar cast of the same doubles — the oracle trick the ST
string queries already rely on.  Curve types (CircularString /
CompoundCurve / CurvePolygon) have no GeoJSON representation (RFC 7946
§3.1.1); they are linearized first via `wkb.linearize_structured`, the
same behavior as the reference's GeoJSON writer.
"""

from __future__ import annotations

import json

import numpy as np

from gdal_spark.geometry import wkb as W
from gdal_spark.geometry.wkt import _num

_CURVED = {W.CIRCULARSTRING, W.COMPOUNDCURVE, W.CURVEPOLYGON,
           W.MULTICURVE, W.MULTISURFACE}

_NAME = {
    W.POINT: "Point",
    W.LINESTRING: "LineString",
    W.POLYGON: "Polygon",
    W.MULTIPOINT: "MultiPoint",
    W.MULTILINESTRING: "MultiLineString",
    W.MULTIPOLYGON: "MultiPolygon",
    W.COLLECTION: "GeometryCollection",
}
_CODE = {v: k for k, v in _NAME.items()}


def _pos(row, dim: int) -> str:
    return "[" + ",".join(_num(float(v)) for v in row[:dim]) + "]"


def _poslist(coords, dim: int) -> str:
    return "[" + ",".join(_pos(c, dim) for c in coords) + "]"


def _ring_closed(r: np.ndarray) -> np.ndarray:
    # RFC 7946 §3.1.6: linear rings MUST be closed
    if len(r) and not np.array_equal(r[0], r[-1]):
        return np.vstack([r, r[:1]])
    return r


def _contains_curve(node) -> bool:
    base = node[0]
    if base in _CURVED:
        return True
    if base in (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON,
                W.COLLECTION):
        return any(_contains_curve(ch) for ch in node[3])
    return False


def to_geojson(node) -> str:
    """Structured WKB node → compact RFC 7946 geometry JSON.  Z is kept
    as a third position element; M is dropped (GeoJSON has no M)."""
    if node[0] != W.COLLECTION and _contains_curve(node):
        # linearize_structured returns plain WKB bytes — re-parse.
        # COLLECTION recurses below, so curved CHILDREN linearize one
        # by one (linearize_structured has no collection case).
        node = W.parse_wkb_structured(W.linearize_structured(node))
    base, has_z, _m, payload = node
    dim = 3 if has_z else 2
    name = _NAME.get(base)
    if name is None:
        raise ValueError(f"no GeoJSON representation for type {base}")
    if base == W.POINT:
        body = _pos(payload[0], dim)
    elif base == W.LINESTRING:
        body = _poslist(payload, dim)
    elif base == W.POLYGON:
        body = "[" + ",".join(
            _poslist(_ring_closed(r), dim) for r in payload
        ) + "]"
    elif base == W.MULTIPOINT:
        body = "[" + ",".join(_pos(ch[3][0], dim) for ch in payload) + "]"
    elif base == W.MULTILINESTRING:
        body = "[" + ",".join(_poslist(ch[3], dim) for ch in payload) + "]"
    elif base == W.MULTIPOLYGON:
        body = "[" + ",".join(
            "[" + ",".join(
                _poslist(_ring_closed(r), dim) for r in ch[3]
            ) + "]"
            for ch in payload
        ) + "]"
    else:  # GeometryCollection
        return (
            '{"type":"GeometryCollection","geometries":['
            + ",".join(to_geojson(ch) for ch in payload)
            + "]}"
        )
    return f'{{"type":"{name}","coordinates":{body}}}'


def wkb_to_geojson(buf: bytes) -> str:
    return to_geojson(W.parse_wkb_structured(buf))


def from_geojson(txt: str) -> bytes:
    """RFC 7946 geometry JSON → ISO WKB bytes (via the structured
    emitter, so Z round-trips; ring closure is preserved as given)."""
    return W.structured_to_wkb(_node(json.loads(txt)))


def _node(obj):
    t = obj["type"]
    if t == "GeometryCollection":
        return (W.COLLECTION, False, False,
                [_node(g) for g in obj["geometries"]])
    code = _CODE[t]
    cs = obj["coordinates"]
    # RFC 7946 permits 2- and 3-element positions MIXED within one
    # geometry; decide the dimension in a pre-pass (any 3-element
    # position -> 3D, short positions z-padded with 0.0 — the OGR
    # missing-z convention) so every coordinate array is uniform.
    has_z = _any_z(cs)
    dim = 3 if has_z else 2

    def arr(ps):
        return np.asarray(
            [(list(map(float, p)) + [0.0, 0.0])[:dim] for p in ps],
            dtype=np.float64,
        )

    if t == "Point":
        pay = arr([cs])
    elif t == "LineString":
        pay = arr(cs)
    elif t == "Polygon":
        pay = [arr(r) for r in cs]
    elif t == "MultiPoint":
        pay = [(W.POINT, has_z, False, arr([p])) for p in cs]
    elif t == "MultiLineString":
        pay = [(W.LINESTRING, has_z, False, arr(l)) for l in cs]
    elif t == "MultiPolygon":
        pay = [
            (W.POLYGON, has_z, False, [arr(r) for r in poly]) for poly in cs
        ]
    else:
        raise ValueError(f"unsupported GeoJSON type {t}")
    return (code, has_z, False, pay)


def _any_z(cs) -> bool:
    if not isinstance(cs, (list, tuple)) or not cs:
        return False
    if isinstance(cs[0], (int, float)):
        return len(cs) >= 3
    return any(_any_z(c) for c in cs)
