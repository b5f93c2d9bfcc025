"""S2-style 64-bit hierarchical cell ids — from-scratch numpy implementation.

Public S2 geometry scheme (s2geometry.io): the sphere is projected onto
6 cube faces; each face carries a level-30 Hilbert curve; a cell id packs
(face:3 bits, hilbert position: 2*level bits, trailing 1 marker). Parent
cells are bit-prefix truncations, so "points in cell C" is a contiguous
id range — ideal for range joins, clustering, and partition pruning.

This is NOT a binding to the s2 library (unavailable here); it is an
independent implementation of the published math, vectorized with numpy
(loop over 30 fixed levels, all-array ops — zero per-row Python).
The reference engine has no hex/S2 index (SURVEY §2.11); this replaces
its CPLQuadTree + Hilbert-code roles (port/cpl_quad_tree.cpp,
alg/hilbert.cpp) with one key usable at 10^12-row scale.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell order per orientation. orientation bits: SWAP=1, INVERT=2.
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap | invert
    ],
    dtype=np.int64,
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)  # SWAP,0,0,SWAP|INVERT


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # major axis value sign selects face 0-2 vs 3-5
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            u[m], v[m] = y[m] / x[m], z[m] / x[m]
        elif f == 1:
            u[m], v[m] = -x[m] / y[m], z[m] / y[m]
        elif f == 2:
            u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
        elif f == 3:
            u[m], v[m] = z[m] / x[m], y[m] / x[m]
        elif f == 4:
            u[m], v[m] = z[m] / y[m], -x[m] / y[m]
        else:
            u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    one = np.ones_like(u)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            x[m], y[m], z[m] = one[m], u[m], v[m]
        elif f == 1:
            x[m], y[m], z[m] = -u[m], one[m], v[m]
        elif f == 2:
            x[m], y[m], z[m] = -u[m], -v[m], one[m]
        elif f == 3:
            x[m], y[m], z[m] = -one[m], -v[m], -u[m]
        elif f == 4:
            x[m], y[m], z[m] = v[m], -one[m], -u[m]
        else:
            x[m], y[m], z[m] = v[m], u[m], -one[m]
    return x, y, z


def _uv_to_st(u):
    """Quadratic projection (S2_QUADRATIC_PROJECTION)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def lonlat_to_cell(lon, lat, level: int = 9) -> np.ndarray:
    """Vectorized (lon°, lat°) → S2 cell id at `level` (uint64→int64)."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    x, y, z = cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s, t = _uv_to_st(u), _uv_to_st(v)
    lim = np.int64((1 << MAX_LEVEL) - 1)
    i = np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, lim)
    j = np.clip((t * (1 << MAX_LEVEL)).astype(np.int64), 0, lim)

    # Hilbert position, 1 bit-pair per level, all-array ops.
    pos = np.zeros(face.shape, dtype=np.uint64)
    orient = (face & 1).astype(np.int64)  # face orientation seed: swap on odd faces
    for k in range(MAX_LEVEL - 1, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ij = bi * 2 + bj
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]

    level = int(level)
    full = (face.astype(np.uint64) << np.uint64(2 * MAX_LEVEL + 1)) | (
        pos << np.uint64(1)
    ) | np.uint64(1)
    # truncate to requested level: zero low bits, set the level marker
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    cell = ((full >> shift) << shift) | (np.uint64(1) << np.uint64(shift - np.uint64(1)))
    return cell.astype(np.int64)


def cell_level(cell) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    # lsb = 2^(2*(30-level)+... ) → level = 30 - (log2(lsb)-1)/2... wait:
    # trailing-one at bit b means level = (2*MAX_LEVEL+1 - (b+1))/2? Use log2.
    b = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        b[m] += s
        v[m] >>= np.uint64(s)
    return (MAX_LEVEL - (b >> 1)).astype(np.int64)


def cell_parent(cell, level: int) -> np.ndarray:
    """Ancestor at a coarser level (bit-prefix truncation)."""
    c = np.asarray(cell, dtype=np.uint64)
    shift = np.uint64(2 * (MAX_LEVEL - int(level)) + 1)
    return (((c >> shift) << shift) | (np.uint64(1) << (shift - np.uint64(1)))).astype(
        np.int64
    )


def cell_range(cell) -> tuple[np.ndarray, np.ndarray]:
    """[lo, hi] leaf-id range covered by cell — contiguous by construction,
    so 'point-in-cell' is a BETWEEN predicate (partition-prunable)."""
    c = np.asarray(cell, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    return (c - lsb + np.uint64(1)).astype(np.int64), (c + lsb - np.uint64(1)).astype(
        np.int64
    )


def cell_to_lonlat(cell) -> tuple[np.ndarray, np.ndarray]:
    """Center (lon°, lat°) of cell(s) — inverse transform for testing."""
    c = np.asarray(cell, dtype=np.uint64)
    face = (c >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    lev = cell_level(c)
    # shift away the marker + unused low bits → face<<2lev | pos (2lev bits)
    ppos = c >> (2 * (MAX_LEVEL - lev) + 1).astype(np.uint64)
    i = np.zeros(c.shape, dtype=np.int64)
    j = np.zeros(c.shape, dtype=np.int64)
    orient = (face & 1).astype(np.int64)
    for k in range(MAX_LEVEL):
        active = k < lev
        sh = np.where(active, 2 * (lev - 1 - k), 0).astype(np.uint64)
        p = np.where(active, (ppos >> sh).astype(np.int64) & 3, 0)
        ij = _POS_TO_IJ[orient, p]
        i = np.where(active, (i << 1) | ((ij >> 1) & 1), i)
        j = np.where(active, (j << 1) | (ij & 1), j)
        orient = np.where(active, orient ^ _POS_TO_ORIENT[p], orient)
    # center of the cell in st space (lev-bit grid)
    grid = np.power(2.0, lev.astype(np.float64))
    s = (i.astype(np.float64) + 0.5) / grid
    t = (j.astype(np.float64) + 0.5) / grid
    u, v = _st_to_uv(s), _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def cell_face_pos(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face, hilbert position, level) decomposition of packed cell
    ids — the integer key pair operators/cells.compact_pos_cells
    groups on (parent = pos div 4, the bit-prefix rule of
    cell_parent)."""
    c = np.asarray(cell, dtype=np.uint64)
    lev = cell_level(c)
    face = (c >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    ppos = c >> (2 * (MAX_LEVEL - lev) + 1).astype(np.uint64)
    pos = (ppos & ((np.uint64(1) << (2 * lev).astype(np.uint64)) - np.uint64(1))).astype(
        np.int64
    )
    return face, pos, lev


def face_pos_to_cell(face, pos, level) -> np.ndarray:
    """Inverse of cell_face_pos: repack (face, pos, level) into the
    64-bit id with its trailing-one marker."""
    face = np.asarray(face, dtype=np.uint64)
    pos = np.asarray(pos, dtype=np.uint64)
    lev = np.asarray(level, dtype=np.uint64)
    shift = np.uint64(2) * (np.uint64(MAX_LEVEL) - lev) + np.uint64(1)
    ppos = (face << (np.uint64(2) * lev)) | pos
    return ((ppos << shift) | (np.uint64(1) << (shift - np.uint64(1)))).astype(
        np.int64
    )
