"""Numpy map projections — the engine's analog of the reference's PROJ
transformer chain (alg/gdaltransformer.cpp:96-280 GenImgProj: src GT ∘
SRS op ∘ dst GT⁻¹; ogr/ogrct.cpp:665 OGRCreateCoordinateTransformation).

pyproj is not available in this environment; the workhorse projections
are implemented from the published formulas:

- Transverse Mercator: Krüger series in conformal latitude, 6th-order
  alpha/beta coefficients (Karney 2011, "Transverse Mercator with an
  accuracy of a few nanometers" — the same series PROJ's tmerc/etmerc
  uses).  Sub-millimeter accuracy within ±10° of the central meridian.
- UTM: TM with k0 = 0.9996, false easting 500 km, zone central meridian.
- Web Mercator (EPSG:3857) lives in raster/tile.py (spherical formulas).

All functions are vectorized numpy over coordinate arrays — they run
inside Arrow batches on executors, no per-point Python.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)

# Krüger series coefficients in n = f/(2-f) (Karney 2011, eqs. 35-36)
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6

_ALPHA = (
    _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288
    + 7891 * _N6 / 37800,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630
    - 1983433 * _N6 / 1935360,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880
    + 167603 * _N6 / 181440,
    49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
    34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
    212378941 * _N6 / 319334400,
)

_BETA = (
    _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512
    + 96199 * _N6 / 604800,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105
    - 1118711 * _N6 / 3870720,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
    4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
    4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
    20648693 * _N6 / 638668800,
)

# rectifying radius A1 = a/(1+n) * (1 + n²/4 + n⁴/64 + n⁶/256)
_A1 = _A / (1 + _N) * (1 + _N2 / 4 + _N4 / 64 + _N6 / 256)

_E = np.sqrt(_F * (2 - _F))  # first eccentricity


def tm_forward(
    lon: np.ndarray,
    lat: np.ndarray,
    lon0: float,
    k0: float = 0.9996,
    fe: float = 500000.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Transverse Mercator forward: (lon, lat) degrees → (easting,
    northing) meters."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    # conformal latitude (Karney eq. 7-9)
    t = np.sinh(
        np.arctanh(np.sin(phi)) - _E * np.arctanh(_E * np.sin(phi))
    )
    xip = np.arctan2(t, np.cos(lam))
    etp = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xip.copy()
    eta = etp.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xip) * np.cosh(2 * j * etp)
        eta = eta + a * np.cos(2 * j * xip) * np.sinh(2 * j * etp)
    return fe + k0 * _A1 * eta, fn + k0 * _A1 * xi


def tm_inverse(
    e: np.ndarray,
    n: np.ndarray,
    lon0: float,
    k0: float = 0.9996,
    fe: float = 500000.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Transverse Mercator inverse: (easting, northing) meters →
    (lon, lat) degrees."""
    xi = (np.asarray(n, dtype=np.float64) - fn) / (k0 * _A1)
    eta = (np.asarray(e, dtype=np.float64) - fe) / (k0 * _A1)
    xip = xi.copy()
    etp = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xip = xip - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etp = etp - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    lam = np.arctan2(np.sinh(etp), np.cos(xip))
    chi = np.arcsin(np.sin(xip) / np.cosh(etp))  # conformal latitude
    # invert the conformal latitude by the classic fixed-point iteration
    # on the isometric form: phi = asin(tanh(atanh(sin chi)
    # + e*atanh(e*sin phi))) — converges to <1e-12 rad in ~8 rounds for
    # WGS84 eccentricity (no second coefficient table needed)
    psi = np.arctanh(np.sin(chi))
    phi = chi.copy()
    for _ in range(10):
        phi = np.arcsin(np.tanh(psi + _E * np.arctanh(_E * np.sin(phi))))
    return np.degrees(lam) + lon0, np.degrees(phi)


def utm_zone(lon: float) -> int:
    return int((lon + 180.0) // 6.0) + 1


def utm_lon0(zone: int) -> float:
    return -183.0 + 6.0 * zone


# --- Lambert conformal conic (2SP, ellipsoidal) ------------------------------
# Snyder 1987 "Map Projections — A Working Manual", pp. 104-110
# (eqs. 14-15, 15-1..15-11) — PROJ's lcc; the reference reaches it through
# the PROJ pipeline (alg/gdaltransformer.cpp:96 GenImgProj chain).


def _lcc_m(phi: np.ndarray) -> np.ndarray:
    return np.cos(phi) / np.sqrt(1.0 - (_E * np.sin(phi)) ** 2)


def _lcc_t(phi: np.ndarray) -> np.ndarray:
    es = _E * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - es) / (1.0 + es)) ** (
        _E / 2.0
    )


def _lcc_consts(lat1: float, lat2: float, lat0: float):
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _lcc_m(p1), _lcc_m(p2)
    t1, t2, t0 = _lcc_t(p1), _lcc_t(p2), _lcc_t(p0)
    if abs(lat1 - lat2) < 1e-12:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    Fc = m1 / (n * t1**n)
    rho0 = _A * Fc * t0**n
    return float(n), float(Fc), float(rho0)


def lcc_forward(
    lon: np.ndarray,
    lat: np.ndarray,
    lat1: float,
    lat2: float,
    lat0: float,
    lon0: float,
    fe: float = 0.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """LCC 2SP forward (Snyder eqs. 15-1..15-7): degrees → meters."""
    n, Fc, rho0 = _lcc_consts(lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    rho = _A * Fc * _lcc_t(phi) ** n
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def lcc_inverse(
    x: np.ndarray,
    y: np.ndarray,
    lat1: float,
    lat2: float,
    lat0: float,
    lon0: float,
    fe: float = 0.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """LCC 2SP inverse (Snyder eqs. 15-8..15-11 + 7-9): meters →
    degrees. Latitude from t by the classic fixed-point iteration
    φ = π/2 − 2 atan(t·((1−e sinφ)/(1+e sinφ))^(e/2)) — <1e-12 rad in
    ~8 rounds at WGS84 eccentricity."""
    n, Fc, rho0 = _lcc_consts(lat1, lat2, lat0)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xp, yp)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    t = (rho / (_A * Fc)) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(10):
        es = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - es) / (1.0 + es)) ** (_E / 2.0)
        )
    return np.degrees(theta / n) + lon0, np.degrees(phi)


# --- Albers equal-area conic (2SP, ellipsoidal) ------------------------------
# Snyder 1987 pp. 98-103 (eqs. 14-12..14-19, 3-16) — PROJ's aea.


def _aea_q(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    es = _E * s
    return (1.0 - _E**2) * (
        s / (1.0 - es**2) - np.log((1.0 - es) / (1.0 + es)) / (2.0 * _E)
    )


def _aea_consts(lat1: float, lat2: float, lat0: float):
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _lcc_m(p1), _lcc_m(p2)
    q1, q2, q0 = _aea_q(p1), _aea_q(p2), _aea_q(p0)
    if abs(lat1 - lat2) < 1e-12:
        n = np.sin(p1)
    else:
        n = (m1**2 - m2**2) / (q2 - q1)
    Cc = m1**2 + n * q1
    rho0 = _A * np.sqrt(Cc - n * q0) / n
    return float(n), float(Cc), float(rho0)


def aea_forward(
    lon: np.ndarray,
    lat: np.ndarray,
    lat1: float,
    lat2: float,
    lat0: float,
    lon0: float,
    fe: float = 0.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Albers equal-area forward: degrees → meters."""
    n, Cc, rho0 = _aea_consts(lat1, lat2, lat0)
    q = _aea_q(np.radians(np.asarray(lat, dtype=np.float64)))
    rho = _A * np.sqrt(Cc - n * q) / n
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def aea_inverse(
    x: np.ndarray,
    y: np.ndarray,
    lat1: float,
    lat2: float,
    lat0: float,
    lon0: float,
    fe: float = 0.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Albers inverse; latitude by Newton iteration on q (Snyder
    eq. 3-16), <1e-12 rad in ~5 rounds."""
    n, Cc, rho0 = _aea_consts(lat1, lat2, lat0)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.hypot(xp, yp)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    q = (Cc - (rho * n / _A) ** 2) / n
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    e2 = _E**2
    for _ in range(8):
        s = np.sin(phi)
        es = _E * s
        phi = phi + (1.0 - e2 * s**2) ** 2 / (2.0 * np.cos(phi) * (1.0 - e2)) * (
            q / (1.0 - e2)
            - s / (1.0 - e2 * s**2)
            + np.log((1.0 - es) / (1.0 + es)) / (2.0 * _E)
        )
    return np.degrees(theta / n) + lon0, np.degrees(phi)


# --- polar stereographic (ellipsoidal, variant B) ----------------------------
# Snyder 1987 pp. 160-162 (eqs. 21-33..21-34, 15-9) — PROJ's stere at
# the pole with a standard parallel.


def stere_forward(
    lon: np.ndarray,
    lat: np.ndarray,
    lat_ts: float = 71.0,
    lon0: float = 0.0,
    north: bool = True,
    fe: float = 0.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Polar stereographic forward (degrees → meters), standard
    parallel lat_ts."""
    sgn = 1.0 if north else -1.0
    phi = sgn * np.radians(np.asarray(lat, dtype=np.float64))
    lam = sgn * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    pts = np.radians(abs(lat_ts))
    t = _lcc_t(phi)
    mc = _lcc_m(pts)
    tc = _lcc_t(np.asarray(pts))
    rho = _A * mc * t / tc
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    return fe + sgn * x, fn + sgn * y


def stere_inverse(
    x: np.ndarray,
    y: np.ndarray,
    lat_ts: float = 71.0,
    lon0: float = 0.0,
    north: bool = True,
    fe: float = 0.0,
    fn: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Polar stereographic inverse; latitude by the same fixed-point
    iteration as LCC (Snyder eq. 7-9)."""
    sgn = 1.0 if north else -1.0
    xp = sgn * (np.asarray(x, dtype=np.float64) - fe)
    yp = sgn * (np.asarray(y, dtype=np.float64) - fn)
    rho = np.hypot(xp, yp)
    pts = np.radians(abs(lat_ts))
    mc = _lcc_m(pts)
    tc = _lcc_t(np.asarray(pts))
    t = rho * tc / (_A * mc)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(10):
        es = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - es) / (1.0 + es)) ** (_E / 2.0)
        )
    lam = np.arctan2(xp, -yp)
    return sgn * np.degrees(lam) + lon0, sgn * np.degrees(phi)
