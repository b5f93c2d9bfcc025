"""RPC (rational polynomial coefficient) transformer — the
GDALCreateRPCTransformer analog (alg/gdal_rpc.cpp), from the public
RPC00B / OGC sensor-model formulation: image coordinates are ratios of
20-term cubic polynomials in normalized (lat, lon, height).

ground_to_image is a direct vectorized evaluation; image_to_ground
inverts it with a damped Newton iteration on the 2×2 finite-difference
Jacobian (the reference's RPCInverseTransformPoint is the same shape).
Pure numpy — an RPCModel is bounded metadata, broadcastable into Arrow
batches, and `pair()` plugs into resample.reproject_grid's
world_to_dst/dst_to_world seam like the TM/LCC/GCP transformers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _basis(P: np.ndarray, L: np.ndarray, H: np.ndarray) -> np.ndarray:
    """RPC00B 20-term cubic basis, standard coefficient order."""
    one = np.ones_like(P)
    return np.stack(
        [
            one, L, P, H,
            L * P, L * H, P * H,
            L * L, P * P, H * H,
            P * L * H, L**3, L * P * P, L * H * H,
            L * L * P, P**3, P * H * H, L * L * H,
            P * P * H, H**3,
        ],
        axis=-1,
    )


@dataclass
class RPCModel:
    line_off: float
    samp_off: float
    lat_off: float
    lon_off: float
    height_off: float
    line_scale: float
    samp_scale: float
    lat_scale: float
    lon_scale: float
    height_scale: float
    line_num: np.ndarray = field(default_factory=lambda: np.zeros(20))
    line_den: np.ndarray = field(default_factory=lambda: np.zeros(20))
    samp_num: np.ndarray = field(default_factory=lambda: np.zeros(20))
    samp_den: np.ndarray = field(default_factory=lambda: np.zeros(20))

    def ground_to_image(
        self, lon: np.ndarray, lat: np.ndarray, h: np.ndarray | float = 0.0
    ) -> tuple[np.ndarray, np.ndarray]:
        """(lon, lat, height) degrees/meters → (samp, line) pixels."""
        P = (np.asarray(lat, np.float64) - self.lat_off) / self.lat_scale
        L = (np.asarray(lon, np.float64) - self.lon_off) / self.lon_scale
        H = (np.asarray(h, np.float64) - self.height_off) / self.height_scale
        H = np.broadcast_to(H, P.shape)
        B = _basis(P, L, H)
        line = (B @ self.line_num) / (B @ self.line_den)
        samp = (B @ self.samp_num) / (B @ self.samp_den)
        return (
            samp * self.samp_scale + self.samp_off,
            line * self.line_scale + self.line_off,
        )

    def image_to_ground(
        self,
        samp: np.ndarray,
        line: np.ndarray,
        h: np.ndarray | float = 0.0,
        iters: int = 12,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(samp, line) pixels → (lon, lat) degrees at height h, by
        Newton iteration on the forward model."""
        samp = np.asarray(samp, np.float64)
        line = np.asarray(line, np.float64)
        lon = np.full_like(samp, self.lon_off, dtype=np.float64)
        lat = np.full_like(samp, self.lat_off, dtype=np.float64)
        d_lon = 1e-7 * self.lon_scale
        d_lat = 1e-7 * self.lat_scale
        for _ in range(iters):
            s0, l0 = self.ground_to_image(lon, lat, h)
            fs, fl = s0 - samp, l0 - line
            s1, l1 = self.ground_to_image(lon + d_lon, lat, h)
            s2, l2 = self.ground_to_image(lon, lat + d_lat, h)
            j00 = (s1 - s0) / d_lon  # ∂samp/∂lon
            j01 = (s2 - s0) / d_lat  # ∂samp/∂lat
            j10 = (l1 - l0) / d_lon
            j11 = (l2 - l0) / d_lat
            det = j00 * j11 - j01 * j10
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            lon = lon - (fs * j11 - fl * j01) / det
            lat = lat - (fl * j00 - fs * j10) / det
        return lon, lat

    def pair(self, h: float = 0.0):
        """(world_to_dst, dst_to_world) callables for reproject_grid:
        world = (lon, lat), dst = (samp, line) at constant height."""

        def fwd(lon, lat):
            return self.ground_to_image(lon, lat, h)

        def inv(samp, line):
            return self.image_to_ground(samp, line, h)

        return fwd, inv


def affine_rpc(
    a: float, b: float, c: float, d: float, e: float, f: float,
    lon_off: float = 0.0, lat_off: float = 0.0,
) -> RPCModel:
    """RPC whose forward is exactly samp = a + b·lon + c·lat,
    line = d + e·lon + f·lat — a synthesis helper for tests and for
    sensors modeled to first order (denominator ≡ 1)."""
    m = RPCModel(
        line_off=0.0, samp_off=0.0,
        lat_off=lat_off, lon_off=lon_off, height_off=0.0,
        line_scale=1.0, samp_scale=1.0,
        lat_scale=1.0, lon_scale=1.0, height_scale=1.0,
    )
    for den in (m.line_den, m.samp_den):
        den[0] = 1.0
    # normalized L = lon - lon_off, P = lat - lat_off
    m.samp_num[0] = a + b * lon_off + c * lat_off
    m.samp_num[1] = b
    m.samp_num[2] = c
    m.line_num[0] = d + e * lon_off + f * lat_off
    m.line_num[1] = e
    m.line_num[2] = f
    return m
