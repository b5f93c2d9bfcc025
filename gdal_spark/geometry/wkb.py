"""ISO WKB encode/decode (little-endian) — the geometry wire format.

Geometry columns are BinaryType WKB, exactly how the reference ships
geometry through its Arrow interface (ogr/ogrsf_frmts/generic/
ogrlayerarrow.cpp: geometry as a WKB binary Arrow column). Supported
types (ogr/ogr_core.h:422-556 subset): Point(1), LineString(2),
Polygon(3), MultiPoint(4), MultiLineString(5), MultiPolygon(6),
GeometryCollection(7). On parse, Z/M/ZM variants in both encodings (ISO
+1000/+2000/+3000 offsets and EWKB 0x80000000/0x40000000 flags,
ogr/ogr_core.h:579-600) are accepted with the extra coordinates
dropped, and an EWKB embedded SRID is skipped. ISO curve/surface types
(CircularString, CompoundCurve, CurvePolygon, MultiCurve, MultiSurface,
PolyhedralSurface, TIN, Triangle) are LINEARIZED on read the way the
reference strokes them for non-curve-aware consumers
(ogr/ogrgeometryfactory.cpp curveToLineString, OGR_ARC_STEPSIZE 4°).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION = (
    1, 2, 3, 4, 5, 6, 7,
)

_HDR = struct.Struct("<BI")
_PT = struct.Struct("<BI2d")


def points_to_wkb(x, y) -> list[bytes]:
    """Vectorized point WKB: one (N,21) uint8 buffer, sliced to bytes."""
    x = np.asarray(x, dtype="<f8")
    y = np.asarray(y, dtype="<f8")
    n = x.shape[0]
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1:5] = np.array([1, 0, 0, 0], dtype=np.uint8)
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    return [raw[i * 21 : (i + 1) * 21] for i in range(n)]


def wkb_points_to_xy(wkbs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized point-WKB decode: join + single frombuffer."""
    blob = b"".join(wkbs)
    n = len(blob) // 21
    a = np.frombuffer(blob, dtype=np.uint8).reshape(n, 21)
    x = a[:, 5:13].copy().view("<f8").ravel()
    y = a[:, 13:21].copy().view("<f8").ravel()
    return x, y


def linestring_to_wkb(coords: np.ndarray) -> bytes:
    coords = np.ascontiguousarray(coords, dtype="<f8")
    return _HDR.pack(1, LINESTRING) + struct.pack("<I", len(coords)) + coords.tobytes()


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """rings[0] = exterior (closed or not — closed on write), rest holes."""
    out = [_HDR.pack(1, POLYGON), struct.pack("<I", len(rings))]
    for r in rings:
        r = np.asarray(r, dtype="<f8")
        if len(r) == 0 or not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(np.ascontiguousarray(r).tobytes())
    return b"".join(out)


def multilinestring_to_wkb(lines: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, MULTILINESTRING), struct.pack("<I", len(lines))]
    for coords in lines:
        out.append(linestring_to_wkb(coords))
    return b"".join(out)


def multipolygon_to_wkb(polys: list[list[np.ndarray]]) -> bytes:
    out = [_HDR.pack(1, MULTIPOLYGON), struct.pack("<I", len(polys))]
    for rings in polys:
        out.append(polygon_to_wkb(rings))
    return b"".join(out)


def multipoint_to_wkb(coords: np.ndarray) -> bytes:
    out = [_HDR.pack(1, MULTIPOINT), struct.pack("<I", len(coords))]
    out.extend(
        points_to_wkb(
            np.ascontiguousarray(coords[:, 0]),
            np.ascontiguousarray(coords[:, 1]),
        )
    )
    return b"".join(out)


def collection_to_wkb(children: list[bytes]) -> bytes:
    """GEOMETRYCOLLECTION from already-encoded child WKBs."""
    out = [_HDR.pack(1, COLLECTION), struct.pack("<I", len(children))]
    out.extend(children)
    return b"".join(out)


def _rd_u32(buf, off, little):
    return struct.unpack_from("<I" if little else ">I", buf, off)[0], off + 4


def _parse_one(buf: bytes, off: int):
    little = buf[off] == 1
    off += 1
    gtype, off = _rd_u32(buf, off, little)
    # dimension flags, both encodings (ogr/ogr_core.h:579-600):
    #   ISO: base + 1000 (Z), + 2000 (M), + 3000 (ZM)
    #   EWKB: 0x80000000 (Z), 0x40000000 (M), 0x20000000 (SRID present)
    ewkb_z = bool(gtype & 0x80000000)
    ewkb_m = bool(gtype & 0x40000000)
    ewkb_srid = bool(gtype & 0x20000000)
    code = gtype & 0x0FFFFFFF
    iso = code // 1000  # 0 plain, 1 Z, 2 M, 3 ZM
    base = code % 1000
    has_z = ewkb_z or iso in (1, 3)
    has_m = ewkb_m or iso in (2, 3)
    if ewkb_srid:
        _, off = _rd_u32(buf, off, little)  # skip SRID
    dim = 2 + int(has_z) + int(has_m)
    fmt = ("<" if little else ">") + "d"

    def rd_coords(n, off):
        nb = n * dim * 8
        arr = np.frombuffer(buf, dtype=("<f8" if little else ">f8"), count=n * dim,
                            offset=off).reshape(n, dim)[:, :2]
        return np.asarray(arr, dtype=np.float64), off + nb

    if base == POINT:
        c, off = rd_coords(1, off)
        return (POINT, c), off
    if base == LINESTRING:
        n, off = _rd_u32(buf, off, little)
        c, off = rd_coords(n, off)
        return (LINESTRING, c), off
    if base == POLYGON:
        nr, off = _rd_u32(buf, off, little)
        rings = []
        for _ in range(nr):
            n, off = _rd_u32(buf, off, little)
            c, off = rd_coords(n, off)
            rings.append(c)
        return (POLYGON, rings), off
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION):
        ng, off = _rd_u32(buf, off, little)
        parts = []
        for _ in range(ng):
            g, off = _parse_one(buf, off)
            parts.append(g)
        return (base, parts), off
    # --- ISO curve/surface types, linearized on read the way the
    # reference strokes them for non-curve-aware consumers
    # (ogr/ogrgeometryfactory.cpp curveToLineString, OGR_ARC_STEPSIZE
    # default 4°) ---
    if base == CIRCULARSTRING:
        n, off = _rd_u32(buf, off, little)
        c, off = rd_coords(n, off)
        return (LINESTRING, _stroke_circularstring(c)), off
    if base == COMPOUNDCURVE:
        ns, off = _rd_u32(buf, off, little)
        pieces = []
        for _ in range(ns):
            (t, c), off = _parse_one(buf, off)
            if t != LINESTRING:
                raise ValueError("compound curve segment of unexpected type")
            pieces.append(c if not pieces else c[1:])  # shared endpoint
        return (LINESTRING, np.vstack(pieces)), off
    if base == CURVEPOLYGON:
        nr, off = _rd_u32(buf, off, little)
        rings = []
        for _ in range(nr):
            (t, c), off = _parse_one(buf, off)
            if t != LINESTRING:
                raise ValueError("curve polygon ring of unexpected type")
            rings.append(c)
        return (POLYGON, rings), off
    if base == MULTICURVE:
        ng, off = _rd_u32(buf, off, little)
        parts = []
        for _ in range(ng):
            g, off = _parse_one(buf, off)
            parts.append(g)
        return (MULTILINESTRING, parts), off
    if base in (MULTISURFACE, POLYHEDRALSURFACE, TIN):
        ng, off = _rd_u32(buf, off, little)
        parts = []
        for _ in range(ng):
            g, off = _parse_one(buf, off)
            parts.append(g)
        return (MULTIPOLYGON, parts), off
    if base == TRIANGLE:
        nr, off = _rd_u32(buf, off, little)
        rings = []
        for _ in range(nr):
            n, off = _rd_u32(buf, off, little)
            c, off = rd_coords(n, off)
            rings.append(c)
        return (POLYGON, rings), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


# ISO curve/surface type codes (ogr/ogr_core.h:422-556)
CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE = (
    8, 9, 10, 11, 12,
)
POLYHEDRALSURFACE, TIN, TRIANGLE = 15, 16, 17

ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (ogrgeometryfactory.cpp:4470)


def _stroke_circularstring(pts: np.ndarray) -> np.ndarray:
    """Linearize a CircularString: consecutive point triples define
    arcs through 3 points; collinear triples degrade to straight
    segments. Max angular step ARC_STEP_DEG, endpoints exact."""
    out = [pts[0]]
    for i in range(0, len(pts) - 2, 2):
        p0, p1, p2 = pts[i], pts[i + 1], pts[i + 2]
        d = 2.0 * (
            p0[0] * (p1[1] - p2[1])
            + p1[0] * (p2[1] - p0[1])
            + p2[0] * (p0[1] - p1[1])
        )
        chord = np.hypot(*(p2 - p0))
        if abs(d) < 1e-12 * max(chord, 1.0) ** 2:
            out.extend([p1, p2])  # collinear
            continue
        s0, s1, s2 = (p0 @ p0), (p1 @ p1), (p2 @ p2)
        ux = (s0 * (p1[1] - p2[1]) + s1 * (p2[1] - p0[1])
              + s2 * (p0[1] - p1[1])) / d
        uy = (s0 * (p2[0] - p1[0]) + s1 * (p0[0] - p2[0])
              + s2 * (p1[0] - p0[0])) / d
        ctr = np.array([ux, uy])
        r = np.hypot(*(p0 - ctr))
        a0 = np.arctan2(p0[1] - uy, p0[0] - ux)
        a1 = np.arctan2(p1[1] - uy, p1[0] - ux)
        a2 = np.arctan2(p2[1] - uy, p2[0] - ux)
        # sweep direction: the arc must pass through p1
        ccw_12 = (a1 - a0) % (2 * np.pi)
        ccw_13 = (a2 - a0) % (2 * np.pi)
        if ccw_12 <= ccw_13:  # counterclockwise through p1
            sweep = ccw_13 if ccw_13 > 0 else 2 * np.pi
        else:  # clockwise
            sweep = -((a0 - a2) % (2 * np.pi) or 2 * np.pi)
        steps = max(2, int(np.ceil(abs(sweep) / np.radians(ARC_STEP_DEG))))
        angs = a0 + sweep * np.arange(1, steps + 1) / steps
        arc = np.column_stack(
            [ux + r * np.cos(angs), uy + r * np.sin(angs)]
        )
        arc[-1] = p2  # exact endpoint
        out.extend(arc)
    return np.vstack([np.atleast_2d(p) for p in out])


def parse_wkb(buf: bytes):
    """→ (type, payload). Point/LineString: (t, coords(N,2));
    Polygon: (t, [ring(N,2), ...]); Multi*/Collection: (t, [children])."""
    g, _ = _parse_one(buf, 0)
    return g


def polygon_rings(buf: bytes) -> list[np.ndarray]:
    """All rings of a Polygon or MultiPolygon WKB (flattened)."""
    t, payload = parse_wkb(buf)
    if t == POLYGON:
        return payload
    if t == MULTIPOLYGON:
        rings = []
        for (_, rs) in payload:
            rings.extend(rs)
        return rings
    raise ValueError(f"expected (Multi)Polygon, got type {t}")


def uniform_polygon_coords(wkbs) -> np.ndarray | None:
    """Batch decode: (N, npts, 2) float64 if EVERY buffer is a
    little-endian single-ring POLYGON with the same vertex count (the
    common shape of a homogeneous polygon column), else None — callers
    fall back to the per-geometry parser. One frombuffer pass, no
    per-row Python."""
    import struct

    if len(wkbs) == 0:
        return None
    first = wkbs[0]
    size = len(first)
    if size < 13:
        return None
    try:
        gtype, nrings = struct.unpack_from("<II", first, 1)
        npts = struct.unpack_from("<I", first, 9)[0]
    except struct.error:
        return None
    if first[0] != 1 or gtype != POLYGON or nrings != 1:
        return None
    if size != 13 + npts * 16:
        return None
    blob = b"".join(wkbs)
    if len(blob) != len(wkbs) * size:
        return None
    a = np.frombuffer(blob, dtype=np.uint8).reshape(len(wkbs), size)
    hdr = np.frombuffer(first[:13], dtype=np.uint8)
    if not (a[:, :13] == hdr).all():
        return None
    return a[:, 13:].copy().view("<f8").reshape(len(wkbs), npts, 2)


# --------------------------------------------------------------------------
# Curve-preserving parse + write (the write side of ogr/ogr_core.h:422-556:
# CircularString/CompoundCurve/CurvePolygon/MultiCurve/MultiSurface and the
# PolyhedralSurface/TIN/Triangle family).  parse_wkb() above deliberately
# linearizes for the numpy kernels; these structured forms keep the curve
# control points and Z/M ordinates intact so curve data can round-trip
# byte-exactly to a curve-aware sink (e.g. GPKG) instead of silently
# densifying.  Node shape: (base_type, has_z, has_m, payload) where payload
# is an (n, dim) coord array (point/linestring/circularstring), a list of
# coord arrays (polygon/triangle rings), or a list of child nodes
# (compound/curvepoly/multi*/collection/surface types).
# --------------------------------------------------------------------------

_COORD_LEAF = (POINT, LINESTRING, CIRCULARSTRING)
_RING_LEAF = (POLYGON, TRIANGLE)


def parse_wkb_structured(buf: bytes):
    node, _ = _parse_structured(buf, 0)
    return node


def _parse_structured(buf: bytes, off: int):
    little = buf[off] == 1
    off += 1
    gtype, off = _rd_u32(buf, off, little)
    ewkb_z = bool(gtype & 0x80000000)
    ewkb_m = bool(gtype & 0x40000000)
    ewkb_srid = bool(gtype & 0x20000000)
    code = gtype & 0x0FFFFFFF
    iso = code // 1000
    base = code % 1000
    has_z = ewkb_z or iso in (1, 3)
    has_m = ewkb_m or iso in (2, 3)
    if ewkb_srid:
        _, off = _rd_u32(buf, off, little)
    dim = 2 + int(has_z) + int(has_m)

    def rd(n, off):
        arr = np.frombuffer(
            buf, dtype=("<f8" if little else ">f8"), count=n * dim, offset=off
        ).reshape(n, dim)
        return np.asarray(arr, dtype=np.float64), off + n * dim * 8

    if base == POINT:
        c, off = rd(1, off)
        return (base, has_z, has_m, c), off
    if base in (LINESTRING, CIRCULARSTRING):
        n, off = _rd_u32(buf, off, little)
        c, off = rd(n, off)
        return (base, has_z, has_m, c), off
    if base in _RING_LEAF:
        nr, off = _rd_u32(buf, off, little)
        rings = []
        for _ in range(nr):
            n, off = _rd_u32(buf, off, little)
            c, off = rd(n, off)
            rings.append(c)
        return (base, has_z, has_m, rings), off
    if base in (
        COMPOUNDCURVE, CURVEPOLYGON, MULTIPOINT, MULTILINESTRING,
        MULTIPOLYGON, COLLECTION, MULTICURVE, MULTISURFACE,
        POLYHEDRALSURFACE, TIN,
    ):
        ng, off = _rd_u32(buf, off, little)
        parts = []
        for _ in range(ng):
            child, off = _parse_structured(buf, off)
            parts.append(child)
        return (base, has_z, has_m, parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def structured_to_wkb(node) -> bytes:
    """Emit little-endian ISO WKB (base + 1000·flags type codes) for a
    structured node, preserving curve control points and Z/M ordinates.
    parse_wkb_structured → structured_to_wkb is byte-identity for any
    little-endian ISO input (tests pin this)."""
    base, has_z, has_m, payload = node
    code = base + 1000 * ((1 if has_z else 0) + (2 if has_m else 0))
    out = [b"\x01", struct.pack("<I", code)]
    dim = 2 + int(has_z) + int(has_m)

    def coords(c) -> bytes:
        a = np.ascontiguousarray(np.asarray(c, dtype="<f8").reshape(-1, dim))
        return a.tobytes()

    if base == POINT:
        out.append(coords(payload))
    elif base in (LINESTRING, CIRCULARSTRING):
        a = np.asarray(payload)
        out.append(struct.pack("<I", a.shape[0]))
        out.append(coords(a))
    elif base in _RING_LEAF:
        out.append(struct.pack("<I", len(payload)))
        for ring in payload:
            a = np.asarray(ring)
            out.append(struct.pack("<I", a.shape[0]))
            out.append(coords(a))
    else:
        out.append(struct.pack("<I", len(payload)))
        for child in payload:
            out.append(structured_to_wkb(child))
    return b"".join(out)


def has_curve(node) -> bool:
    """True if any component is a non-linear type (OGRGeometry::
    hasCurveGeometry role, ogr/ogr_geometry.h)."""
    base, _, _, payload = node
    if base == CIRCULARSTRING:
        return True
    if base in (COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE):
        return True
    if base in _COORD_LEAF or base in _RING_LEAF:
        return False
    return any(has_curve(ch) for ch in payload)


def linearize_structured(node) -> bytes:
    """Structured node → plain (curve-free) WKB by round-tripping
    through the stroking reader — same 4° arc step as parse_wkb
    (getLinearGeometry role)."""
    t, payload = parse_wkb(structured_to_wkb(node))
    if t == POINT:
        return points_to_wkb(payload[:, 0], payload[:, 1])[0]
    if t == LINESTRING:
        return linestring_to_wkb(payload)
    if t == POLYGON:
        return polygon_to_wkb(payload)
    if t == MULTILINESTRING:
        return multilinestring_to_wkb([c for (_, c) in payload])
    if t == MULTIPOLYGON:
        return multipolygon_to_wkb([rs for (_, rs) in payload])
    raise ValueError(f"cannot linearize type {t}")


def circularstring_to_wkb(pts: np.ndarray, has_z=False, has_m=False) -> bytes:
    return structured_to_wkb((CIRCULARSTRING, has_z, has_m, pts))


def compoundcurve_to_wkb(segments: list) -> bytes:
    """segments: list of (base, has_z, has_m, coords) leaf nodes."""
    hz = any(s[1] for s in segments)
    hm = any(s[2] for s in segments)
    return structured_to_wkb((COMPOUNDCURVE, hz, hm, segments))


def curvepolygon_to_wkb(rings: list) -> bytes:
    hz = any(r[1] for r in rings)
    hm = any(r[2] for r in rings)
    return structured_to_wkb((CURVEPOLYGON, hz, hm, rings))
