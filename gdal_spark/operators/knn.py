"""kNN operators (SURVEY §2.3 kNN row).

Two strategies:

- knn_broadcast_sql (used by queries.knn): tiny target layer →
  Catalyst broadcast cross join + haversine + window re-rank. Exact,
  zero Python, and the oracle-parity path.

- knn_ring_join: the scale path replacing the reference's quadtree
  radius search (alg/gdalgrid.cpp:256-384, port/cpl_quad_tree.cpp).
  Targets are bucketed into a degree grid (broadcast dict); each Arrow
  batch of queries expands square cell rings (ring 0, 1, 2, …) until k
  candidates are found AND the k-th best haversine distance is provably
  inside the covered ring (conservative meters-per-degree bound with
  cos(lat) clamped — documented exactness domain |lat| ≲ 85°). Exact
  kNN without a cross join: work per query is O(ring cells + candidates).
  For huge target layers the same ring probe runs against a shuffled
  (cell → targets) table instead of a broadcast dict.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark.geometry.kernels import haversine_m

M_PER_DEG = 111194.92664455873  # 2πR/360 at R=6371008.8


def _ring_cells(cx: int, cy: int, r: int) -> list[tuple[int, int]]:
    if r == 0:
        return [(cx, cy)]
    cells = []
    for dx in range(-r, r + 1):
        cells.append((cx + dx, cy - r))
        cells.append((cx + dx, cy + r))
    for dy in range(-r + 1, r):
        cells.append((cx - r, cy + dy))
        cells.append((cx + r, cy + dy))
    return cells


def knn_ring_join(
    points: DataFrame,
    targets: list[tuple[int, float, float]],
    k: int = 3,
    cell_deg: float = 1.0,
    id_col: str = "url",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(id, rnk, target_id, dist_m) exact k nearest targets per point."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(
        [(int(t), float(la), float(lo)) for t, la, lo in targets]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tlist = bc.value
        buckets: dict[tuple[int, int], list[int]] = {}
        tlat = np.array([t[1] for t in tlist])
        tlon = np.array([t[2] for t in tlist])
        tid = np.array([t[0] for t in tlist], dtype=np.int64)
        for i, (_, la, lo) in enumerate(tlist):
            key = (int(np.floor(lo / cell_deg)), int(np.floor(la / cell_deg)))
            buckets.setdefault(key, []).append(i)
        max_ring = int(np.ceil(360.0 / cell_deg)) + 1
        for pdf in batches:
            out_rows = []
            plat = pdf[lat_col].to_numpy(np.float64)
            plon = pdf[lon_col].to_numpy(np.float64)
            pids = pdf[id_col]
            for qi in range(len(pdf)):
                cx = int(np.floor(plon[qi] / cell_deg))
                cy = int(np.floor(plat[qi] / cell_deg))
                cand: list[int] = []
                best: np.ndarray | None = None
                for r in range(max_ring):
                    for cell in _ring_cells(cx, cy, r):
                        cand.extend(buckets.get(cell, ()))
                    if len(cand) >= k:
                        idx = np.array(cand, dtype=np.int64)
                        d = haversine_m(
                            plat[qi], plon[qi], tlat[idx], tlon[idx]
                        )
                        order = np.lexsort((tid[idx], d))[:k]
                        best = (idx[order], d[order])
                        # conservative covered radius of ring r (meters):
                        # anything outside differs by ≥ r*cell_deg in one
                        # axis; lon axis shrinks by cos(lat)
                        cos = max(
                            0.02,
                            np.cos(
                                np.radians(
                                    min(85.0, abs(plat[qi]) + (r + 1) * cell_deg)
                                )
                            ),
                        )
                        bound = r * cell_deg * M_PER_DEG * cos
                        if best[1][-1] <= bound:
                            break
                if best is None:
                    continue
                for rank, (ti, dd) in enumerate(zip(*best), start=1):
                    out_rows.append((pids.iloc[qi], rank, int(tid[ti]), float(dd)))
            yield pd.DataFrame(
                out_rows, columns=[id_col, "rnk", "target_id", "dist_m"]
            )

    return points.select(id_col, lat_col, lon_col).mapInPandas(
        fn, f"{id_col} string, rnk int, target_id long, dist_m double"
    )


_HEX_DIRS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))
_SQRT3_3 = 0.5773502691896258
_R_EARTH = 6371008.8
# merc→true slack: for |lat| <= cap, d_true >= d_merc * cos(cap)/(1+pi/2)
# (see knn_hex_ring_join docstring for the derivation)
_MERC_SLACK = 1.0 + np.pi / 2.0


def _hex_ring_cells(cq: int, cr: int, r: int) -> list[tuple[int, int]]:
    """Axial coordinates of the hex ring at distance r (standard k-ring
    walk: start r steps along direction 4, then r steps in each of the
    6 directions)."""
    if r == 0:
        return [(cq, cr)]
    q = cq + _HEX_DIRS[4][0] * r
    rr = cr + _HEX_DIRS[4][1] * r
    cells = []
    for d in range(6):
        dq, dr = _HEX_DIRS[d]
        for _ in range(r):
            cells.append((q, rr))
            q += dq
            rr += dr
    return cells


def _hex_cell_of(mx: float, my: float, size: float) -> tuple[int, int]:
    """Containing pointy-top hexagon (axial) of a mercator point —
    fractional axial coords + cube rounding (same lattice math as
    portable.hex_cells_sql; rounding-mode ulp differences are
    irrelevant here because the cell is only a candidate bucket and
    the re-rank is exact)."""
    qf = (_SQRT3_3 * mx - my / 3.0) / size
    rf = (2.0 * my / 3.0) / size
    sf = -qf - rf
    rq, rr, rs = round(qf), round(rf), round(sf)
    dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
    if dq > ds and dq > dr:
        rq = -rs - rr
    elif not (ds > dr):
        rr = -rq - rs
    return int(rq), int(rr)


def _merc(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    shift = 20037508.342789244
    mx = lon * shift / 180.0
    my = (
        np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
        * shift / 180.0
    )
    return mx, my


def knn_hex_ring_join(
    points: DataFrame,
    targets: list[tuple[int, float, float]],
    k: int = 3,
    size: float = 200000.0,
    lat_cap: float = 66.0,
    id_col: str = "url",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(id, rnk, target_id, dist_m) exact k nearest targets per point —
    the north rule's "kNN answered by H3 k-ring expansion with distance
    re-rank": targets bucket into axial hexagons of circumradius `size`
    mercator meters (broadcast dict), each query expands hex k-rings
    until k candidates are found AND the k-th best haversine distance is
    provably inside the covered rings.

    Provable stop (|lat| <= lat_cap contract, asserted on targets and
    applied to the cos bound):  after completing ring r every unexplored
    target sits in a hexagon at hex-distance >= r+1, whose center is
    >= 1.5*(r+1)*size mercator meters away (the ring of hex-distance d
    is a hexagon of inradius d*sqrt(3)*size*(sqrt(3)/2) = 1.5*d*size);
    both endpoints lie within `size` of their centers, so
    d_merc >= (1.5*(r+1) - 2)*size.  Mercator-to-true conversion, exact
    for any two points with |lat| <= cap: d_true >= R*dphi and
    dmy <= R*sec(cap)*dphi give d_true >= dmy*cos(cap); haversine
    >= 2R*sqrt(cos p1 cos p2)*sin(dlam/2) >= (2/pi)*R*dlam*cos(cap) =
    (2/pi)*dmx*cos(cap); hence d_merc <= dmx + dmy <=
    d_true*(1 + pi/2)/cos(cap), i.e. d_true >= d_merc*cos(cap)/(1+pi/2).
    Conservative (a few extra rings near the cap), never wrong within
    the stated domain — same contract style as knn_ring_join's degree
    bound.  Work per query is O(ring cells + candidates); the full
    target set is the fallback ceiling (scan-all == brute force)."""
    spark = points.sparkSession
    for _, tla, _ in targets:
        if abs(float(tla)) > lat_cap:
            raise ValueError(
                f"target lat {tla} outside the |lat| <= {lat_cap} "
                "exactness domain (raise lat_cap; cos bound weakens)"
            )
    bc = spark.sparkContext.broadcast(
        [(int(t), float(la), float(lo)) for t, la, lo in targets]
    )
    cos_cap = float(np.cos(np.radians(lat_cap)))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tlist = bc.value
        tlat = np.array([t[1] for t in tlist])
        tlon = np.array([t[2] for t in tlist])
        tid = np.array([t[0] for t in tlist], dtype=np.int64)
        tmx, tmy = _merc(tlat, tlon)
        buckets: dict[tuple[int, int], list[int]] = {}
        for i in range(len(tlist)):
            buckets.setdefault(
                _hex_cell_of(float(tmx[i]), float(tmy[i]), size), []
            ).append(i)
        n_t = len(tlist)
        # world extent ceiling: beyond this every bucket is visited
        max_ring = int(np.ceil(2.0 * 20037508.342789244 * 1.5 / size)) + 2
        for pdf in batches:
            out_rows = []
            plat = pdf[lat_col].to_numpy(np.float64)
            plon = pdf[lon_col].to_numpy(np.float64)
            pmx, pmy = _merc(plat, plon)
            pids = pdf[id_col]
            for qi in range(len(pdf)):
                cq, cr = _hex_cell_of(float(pmx[qi]), float(pmy[qi]), size)
                cand: list[int] = []
                best: tuple | None = None
                for r in range(max_ring):
                    for cell in _hex_ring_cells(cq, cr, r):
                        cand.extend(buckets.get(cell, ()))
                    if len(cand) >= k or len(cand) == n_t:
                        idx = np.array(sorted(set(cand)), dtype=np.int64)
                        d = haversine_m(
                            plat[qi], plon[qi], tlat[idx], tlon[idx]
                        )
                        kk = min(k, len(idx))
                        order = np.lexsort((tid[idx], d))[:kk]
                        best = (idx[order], d[order])
                        if len(cand) == n_t:
                            break  # scanned everything: exact by fiat
                        merc_bound = (1.5 * (r + 1) - 2.0) * size
                        if (
                            merc_bound > 0
                            and len(best[0]) >= k
                            and best[1][-1]
                            <= merc_bound * cos_cap / _MERC_SLACK
                        ):
                            break
                if best is None:
                    continue
                for rnk, (ti, dd) in enumerate(
                    zip(best[0], best[1]), start=1
                ):
                    out_rows.append(
                        (pids.iloc[qi], rnk, int(tid[ti]), float(dd))
                    )
            yield pd.DataFrame(
                out_rows, columns=[id_col, "rnk", "target_id", "dist_m"]
            )

    return points.select(id_col, lat_col, lon_col).mapInPandas(
        fn, f"{id_col} string, rnk int, target_id long, dist_m double"
    )
