"""32-bit Hilbert code over a bounding extent — GDAL-parity clustering key.

Reproduces the semantics of the reference's GDALHilbertCode
(alg/hilbert.cpp:19-90): normalize (x, y) into a 2^order grid over the
extent, then walk `order` Hilbert iterations. Used by `gdal vector sort
--hilbert` (apps/gdalalg_vector_sort.cpp) to spatially cluster features
before writes — here the key feeds df.repartitionByRange before tile
emission. numpy-vectorized (fixed 16-iteration loop, all-array ops).
"""

from __future__ import annotations

import numpy as np

DEFAULT_ORDER = 16


def hilbert_code(
    x: np.ndarray,
    y: np.ndarray,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    order: int = DEFAULT_ORDER,
) -> np.ndarray:
    n = np.int64(1) << np.int64(order)
    w = max(maxx - minx, 1e-300)
    h = max(maxy - miny, 1e-300)
    ix = np.clip(((np.asarray(x) - minx) / w * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(y) - miny) / h * n).astype(np.int64), 0, n - 1)
    rx = np.zeros_like(ix)
    ry = np.zeros_like(ix)
    d = np.zeros_like(ix)
    s = n >> 1
    while s > 0:
        rx = ((ix & s) > 0).astype(np.int64)
        ry = ((iy & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        ix_f = np.where(flip, s - 1 - ix, ix)
        iy_f = np.where(flip, s - 1 - iy, iy)
        ix, iy = np.where(swap, iy_f, ix_f), np.where(swap, ix_f, iy_f)
        s >>= 1
    return d
