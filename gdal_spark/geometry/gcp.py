"""GCP-based transformers — polynomial (order 1-3) and thin plate
spline.

Reference surface: GDALCreateGCPTransformer (alg/gdal_crs.cpp — least
squares polynomial fit over ground control points, orders 1..3) and
GDALCreateTPSTransformer (alg/gdal_tps.cpp — r²·ln r thin plate spline),
both consumed through the generic transformer chain
(alg/gdaltransformer.cpp:96 GenImgProj). Implemented from the published
formulations (polynomial LS normal equations; Bookstein 1989 TPS), pure
vectorized numpy — the fitted transformer is bounded metadata
(coefficient vectors) broadcast into Arrow batches, so it plugs
straight into resample.reproject_grid's world_to_dst/dst_to_world seam.
"""

from __future__ import annotations

import numpy as np


def _poly_terms(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Design-matrix columns: all monomials x^i y^j with i+j <= order,
    in deterministic (total degree, then x power desc) order."""
    cols = []
    for d in range(order + 1):
        for i in range(d, -1, -1):
            j = d - i
            cols.append((x**i) * (y**j))
    return np.column_stack(cols)


class GCPPolynomial:
    """Least-squares polynomial GCP transformer (alg/gdal_crs.cpp role).

    Fits (sx, sy) → (dx, dy) with monomials up to `order`; `inverse`
    fits the opposite direction from the same points (the reference does
    the same rather than inverting the polynomial)."""

    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        order: int = 1,
    ) -> None:
        src = np.asarray(src, dtype=np.float64)
        dst = np.asarray(dst, dtype=np.float64)
        n_terms = (order + 1) * (order + 2) // 2
        if len(src) < n_terms:
            raise ValueError(
                f"order-{order} polynomial needs >= {n_terms} GCPs, "
                f"got {len(src)}"
            )
        self.order = order
        A = _poly_terms(src[:, 0], src[:, 1], order)
        self.fwd, *_ = np.linalg.lstsq(A, dst, rcond=None)
        B = _poly_terms(dst[:, 0], dst[:, 1], order)
        self.inv, *_ = np.linalg.lstsq(B, src, rcond=None)

    def _apply(self, x, y, coef):
        x = np.asarray(x, dtype=np.float64)
        shape = x.shape
        A = _poly_terms(
            x.ravel(), np.asarray(y, dtype=np.float64).ravel(), self.order
        )
        out = A @ coef
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)

    def forward(self, x, y):
        return self._apply(x, y, self.fwd)

    def inverse(self, x, y):
        return self._apply(x, y, self.inv)

    def residuals(self) -> np.ndarray:
        """Max forward-fit residual per GCP is not stored; recompute on
        demand from the fitted coefficients if needed."""
        raise NotImplementedError


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    """U(r) = r² ln r² (Bookstein 1989 uses r² ln r; the factor 2 is
    absorbed into the solved weights)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        k = r2 * np.log(r2)
    return np.where(r2 > 0, k, 0.0)


class TPS:
    """Thin plate spline transformer (alg/gdal_tps.cpp role): exact
    interpolation at the GCPs, affine + radial-basis blend elsewhere.
    `inverse` fits the swapped direction (as the reference does)."""

    def __init__(self, src: np.ndarray, dst: np.ndarray) -> None:
        self.src = np.asarray(src, dtype=np.float64)
        dst = np.asarray(dst, dtype=np.float64)
        n = len(self.src)
        if n < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        d2 = (
            (self.src[:, None, 0] - self.src[None, :, 0]) ** 2
            + (self.src[:, None, 1] - self.src[None, :, 1]) ** 2
        )
        K = _tps_kernel(d2)
        P = np.column_stack([np.ones(n), self.src])
        L = np.zeros((n + 3, n + 3))
        L[:n, :n] = K
        L[:n, n:] = P
        L[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        self.w = np.linalg.solve(L, rhs)  # (n+3, 2)

    def forward(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        shape = x.shape
        xf = x.ravel()
        yf = np.asarray(y, dtype=np.float64).ravel()
        d2 = (
            (xf[:, None] - self.src[None, :, 0]) ** 2
            + (yf[:, None] - self.src[None, :, 1]) ** 2
        )
        K = _tps_kernel(d2)  # (m, n)
        n = len(self.src)
        out = (
            K @ self.w[:n]
            + self.w[n]
            + xf[:, None] * self.w[n + 1]
            + yf[:, None] * self.w[n + 2]
        )
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)


def tps_pair(src: np.ndarray, dst: np.ndarray) -> tuple[TPS, TPS]:
    """(forward, inverse) TPS pair for reproject_grid's
    world_to_dst/dst_to_world seam."""
    return TPS(src, dst), TPS(dst, src)
