"""Geohash cell system (Niemeyer 2008, public domain standard): base32
string keys from alternating longitude/latitude binary subdivision.

The remaining public cell family next to the engine's Morton / Hilbert /
S2-style / hex systems — its distinguishing property is that the PARENT
relation is string-prefix truncation, so cell roll-ups are `substring`
and range scans are string-prefix ranges (the reason geo databases use
it as a sort/partition key).

Pure numpy (vectorized, no per-row Python); the SQL twin lives in
queries/spatial._geohash_sql — same integer quantization + interleave,
portable to Spark and DuckDB, pinned against this kernel and against the
published test vectors in tests/test_cellindex.py.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def encode(lon, lat, precision: int = 6) -> np.ndarray:
    """Vectorized geohash encode -> array of `precision`-char strings.

    bits = 5 * precision, split ceil/floor between lon and lat (lon
    gets the extra bit — the standard starts with a longitude bit).
    Quantize each axis to its bit budget, interleave MSB-first
    (lon, lat, lon, ...), then emit 5-bit base32 digits."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    bits = 5 * precision
    lonbits = (bits + 1) // 2
    latbits = bits // 2
    ix = np.clip(
        np.floor((lon + 180.0) / 360.0 * (1 << lonbits)).astype(np.int64),
        0,
        (1 << lonbits) - 1,
    )
    iy = np.clip(
        np.floor((lat + 90.0) / 180.0 * (1 << latbits)).astype(np.int64),
        0,
        (1 << latbits) - 1,
    )
    code = np.zeros(lon.shape, dtype=np.int64)
    for j in range(bits):
        if j % 2 == 0:  # longitude bit, MSB first
            bit = (ix >> (lonbits - 1 - j // 2)) & 1
        else:
            bit = (iy >> (latbits - 1 - (j - 1) // 2)) & 1
        code |= bit << (bits - 1 - j)
    digits = np.stack(
        [(code >> (5 * (precision - 1 - c))) & 31 for c in range(precision)],
        axis=-1,
    )
    lut = np.array(list(BASE32))
    return np.array(["".join(row) for row in lut[digits]])


def decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a geohash cell — the
    inverse subdivision, scalar (driver-side use: seeds, asserts)."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for ch in gh:
        d = BASE32.index(ch)
        for b in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if d & b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if d & b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lon_lo, lat_lo, lon_hi, lat_hi


def neighbors(gh: str) -> list[str]:
    """The up-to-8 adjacent geohash cells (the border-table algorithm
    every geohash library ships, computed here from the codec itself:
    decode the cell, step one cell-width in each compass direction,
    re-encode).  Cells at the antimeridian/pole edge drop the
    out-of-range directions.  Needed whenever a radius query probes a
    geohash-bucketed index — matches within ε of a cell border live in
    a neighbor bucket (the same 3×3 discipline as the DBSCAN cell
    join)."""
    lon_lo, lat_lo, lon_hi, lat_hi = decode_bbox(gh)
    dlon = lon_hi - lon_lo
    dlat = lat_hi - lat_lo
    clon = (lon_lo + lon_hi) / 2.0
    clat = (lat_lo + lat_hi) / 2.0
    out = []
    for dy in (1, 0, -1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            lon = clon + dx * dlon
            lat = clat + dy * dlat
            if not (-90.0 < lat < 90.0):
                continue
            # longitude wraps across the antimeridian
            if lon <= -180.0:
                lon += 360.0
            elif lon > 180.0:
                lon -= 360.0
            out.append(str(encode(np.array([lon]), np.array([lat]),
                                  len(gh))[0]))
    return out
