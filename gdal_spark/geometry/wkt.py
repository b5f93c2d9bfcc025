"""WKT format/parse for the supported geometry subset.

Number formatting follows OGR's %.15g-style shortest-roundtrip output
(ogr/ogr_geometry.cpp exportToWkt uses OGRFormatDouble); python repr of
float is shortest-roundtrip which both Spark and the oracle reproduce.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry import wkb as W


def _num(v: float) -> str:
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def _coords(arr: np.ndarray) -> str:
    return ", ".join(f"{_num(x)} {_num(y)}" for x, y in np.asarray(arr))


def _ring_closed(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=np.float64)
    if len(r) == 0 or not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def to_wkt(parsed) -> str:
    """(type, payload) from wkb.parse_wkb → WKT string."""
    t, payload = parsed
    if t == W.POINT:
        return f"POINT ({_coords(payload)})"
    if t == W.LINESTRING:
        return f"LINESTRING ({_coords(payload)})"
    if t == W.POLYGON:
        rings = ", ".join(f"({_coords(_ring_closed(r))})" for r in payload)
        return f"POLYGON ({rings})"
    if t == W.MULTIPOINT:
        pts = ", ".join(f"({_coords(c)})" for (_, c) in payload)
        return f"MULTIPOINT ({pts})"
    if t == W.MULTILINESTRING:
        ls = ", ".join(f"({_coords(c)})" for (_, c) in payload)
        return f"MULTILINESTRING ({ls})"
    if t == W.MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_coords(_ring_closed(r))})" for r in rings) + ")"
            for (_, rings) in payload
        )
        return f"MULTIPOLYGON ({polys})"
    if t == W.COLLECTION:
        return (
            "GEOMETRYCOLLECTION ("
            + ", ".join(to_wkt(child) for child in payload)
            + ")"
        )
    raise ValueError(f"unsupported geometry type {t}")


def wkb_to_wkt(buf: bytes) -> str:
    return to_wkt(W.parse_wkb(buf))


# --- parser ---


def _parse_coords(txt: str) -> np.ndarray:
    pts = []
    for pair in txt.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype=np.float64)


def _split_groups(txt: str) -> list[str]:
    """Split 'a, b, c' at top parenthesis level."""
    out, depth, cur = [], 0, []
    for ch in txt:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _strip(txt: str) -> str:
    txt = txt.strip()
    assert txt.startswith("(") and txt.endswith(")"), txt
    return txt[1:-1]


def wkt_to_wkb(wkt: str) -> bytes:
    s = wkt.strip()
    up = s.upper()
    if up.startswith("POINT"):
        c = _parse_coords(_strip(s[5:]))
        return W.points_to_wkb(c[:1, 0], c[:1, 1])[0]
    if up.startswith("LINESTRING"):
        return W.linestring_to_wkb(_parse_coords(_strip(s[10:])))
    if up.startswith("POLYGON"):
        body = _strip(s[7:])
        rings = [_parse_coords(_strip(g)) for g in _split_groups(body)]
        return W.polygon_to_wkb(rings)
    if up.startswith("MULTIPOLYGON"):
        body = _strip(s[12:])
        polys = []
        for g in _split_groups(body):
            polys.append([_parse_coords(_strip(r)) for r in _split_groups(_strip(g))])
        return W.multipolygon_to_wkb(polys)
    if up.startswith("MULTIPOINT"):
        body = _strip(s[10:])
        # both OGC spellings: MULTIPOINT ((1 2), (3 4)) and (1 2, 3 4)
        pts = [
            _parse_coords(_strip(g) if g.strip().startswith("(") else g)
            for g in _split_groups(body)
        ]
        return W.multipoint_to_wkb(np.vstack(pts))
    if up.startswith("MULTILINESTRING"):
        body = _strip(s[15:])
        return W.multilinestring_to_wkb(
            [_parse_coords(_strip(g)) for g in _split_groups(body)]
        )
    if up.startswith("GEOMETRYCOLLECTION"):
        body = _strip(s[18:])
        return W.collection_to_wkb(
            [wkt_to_wkb(g.strip()) for g in _split_groups(body)]
        )
    raise ValueError(f"unsupported WKT: {wkt[:40]}")
