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
