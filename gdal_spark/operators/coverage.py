"""Coverage hygiene operators — check-geometry, check-coverage,
clean-coverage, simplify-coverage (reference:
apps/gdalalg_vector_check_geometry.cpp, …_check_coverage.cpp,
…_clean_coverage.cpp, …_simplify_coverage.cpp; the reference delegates
the kernels to GEOS ≥3.12/3.14 CoverageValidate / CoverageClean /
CoverageSimplifyVW — re-implemented here from the published algorithm
descriptions on numpy, never from GEOS source).

Distributed shapes (all scale-sane, no driver geometry loops):

- check_geometry: pure map-side (mapInPandas) per-feature validity
  kernel → error-location point rows, mirroring the reference's
  ``error_location`` output layer (error string + point geometry,
  gdalalg_vector_check_geometry.cpp:49-122).
- check_coverage / clean_coverage: neighbor pairs come from a
  grid-cell cover self-join (same strategy as
  operators/spatial_join.py cell_pip_join_shuffled); each candidate
  pair is refined row-locally.  One shuffle for the cell join, one
  groupBy to gather a feature's losing overlaps — O(features), never
  all-pairs.
- simplify_coverage: shared-arc decomposition.  Boundary segments are
  keyed canonically, owners resolved by one groupBy, junction vertices
  by a second; arcs are then assembled and simplified ONCE per
  owner-set group (applyInPandas) so both sides of a shared boundary
  receive bit-identical simplified coordinates — the defining
  topology-preservation property of GEOS CoverageSimplifyVW
  (gdalalg_vector_simplify_coverage.cpp:100-140).  Group size is
  bounded by a single feature pair's boundary, not by table size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gdal_spark.geometry import clip as C
from gdal_spark.geometry import wkb as W
from gdal_spark.geometry.kernels import ring_area

_SNAP_DP = 9  # canonical coordinate rounding for segment/vertex keys


# --------------------------------------------------------------------------
# Row-local helpers
# --------------------------------------------------------------------------


def _polys_of(buf: bytes) -> list[list[np.ndarray]]:
    """WKB → list of polygons, each a [shell, hole, ...] ring list."""
    t, payload = W.parse_wkb(bytes(buf))
    if t == W.POLYGON:
        return [payload]
    if t == W.MULTIPOLYGON:
        return [rs for (_, rs) in payload]
    return []


def _lines_of(buf: bytes) -> list[np.ndarray]:
    t, payload = W.parse_wkb(bytes(buf))
    if t == W.LINESTRING:
        return [payload]
    if t == W.MULTILINESTRING:
        return [c for (_, c) in payload] if payload and isinstance(
            payload[0], tuple
        ) else list(payload)
    return []


def _cross_point(p, q, r, u) -> np.ndarray | None:
    """Intersection point of properly-crossing segments pq, ru."""
    d1, d2 = q - p, u - r
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < 1e-18:
        return None
    w = r - p
    t = (w[0] * d2[1] - w[1] * d2[0]) / denom
    return p + t * d1


def _ring_self_intersection(ring: np.ndarray) -> np.ndarray | None:
    """First proper self-crossing of a closed ring, or a repeated
    non-consecutive vertex (GEOS 'Ring Self-intersection')."""
    r = C._open(ring)
    n = len(r)
    for i in range(n):
        p, q = r[i], r[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            a, b = r[j], r[(j + 1) % n]
            if C.segments_cross_strict(p, q, a, b):
                x = _cross_point(p, q, a, b)
                if x is not None:
                    return x
    # repeated vertex (pinch point)
    seen: dict[tuple, int] = {}
    for i in range(n):
        k = (round(float(r[i][0]), _SNAP_DP), round(float(r[i][1]), _SNAP_DP))
        if k in seen and abs(seen[k] - i) not in (0,):
            return r[i]
        seen[k] = i
    return None


def validate_geometry(buf: bytes) -> tuple[str | None, float, float]:
    """GEOSisValidDetail / isSimpleDetail role
    (gdalalg_vector_check_geometry.cpp:180-231): first validity error
    and its location, or (None, nan, nan).  Points are always valid
    (reference warns and passes them, :139-144)."""
    t, payload = W.parse_wkb(bytes(buf))
    if t in (W.POINT, W.MULTIPOINT):
        return None, float("nan"), float("nan")

    if t in (W.LINESTRING, W.MULTILINESTRING):
        for line in _lines_of(buf):
            a = np.asarray(line, dtype=np.float64)
            n = len(a) - 1
            closed = n >= 1 and np.allclose(a[0], a[-1])
            for i in range(n):
                for j in range(i + 2, n):
                    if closed and i == 0 and j == n - 1:
                        continue
                    if C.segments_cross_strict(a[i], a[i + 1], a[j], a[j + 1]):
                        x = _cross_point(a[i], a[i + 1], a[j], a[j + 1])
                        if x is not None:
                            return "self-intersection", float(x[0]), float(x[1])
        return None, float("nan"), float("nan")

    for rings in _polys_of(buf):
        for ring in rings:
            r = C._open(ring)
            if len(r) < 3:
                return (
                    "Too few points in geometry component",
                    float(ring[0][0]),
                    float(ring[0][1]),
                )
            x = _ring_self_intersection(ring)
            if x is not None:
                return "Ring Self-intersection", float(x[0]), float(x[1])
        # cross-ring crossings
        for i in range(len(rings)):
            for j in range(i + 1, len(rings)):
                a, b = C._open(rings[i]), C._open(rings[j])
                for k in range(len(a)):
                    p, q = a[k], a[(k + 1) % len(a)]
                    for m in range(len(b)):
                        if C.segments_cross_strict(
                            p, q, b[m], b[(m + 1) % len(b)]
                        ):
                            x = _cross_point(p, q, b[m], b[(m + 1) % len(b)])
                            if x is not None:
                                return (
                                    "Self-intersection",
                                    float(x[0]),
                                    float(x[1]),
                                )
        shell = rings[0]
        for h in rings[1:]:
            hh = C._open(h)
            mid = hh.mean(axis=0)
            inside = C.inside_or_on(
                np.array([hh[0][0]]), np.array([hh[0][1]]), [shell], 1e-12
            )[0]
            if not inside:
                return "Hole lies outside shell", float(hh[0][0]), float(hh[0][1])
            del mid
        for i in range(1, len(rings)):
            for j in range(1, len(rings)):
                if i == j:
                    continue
                hi, hj = C._open(rings[i]), C._open(rings[j])
                if C.polygon_contains(
                    np.vstack([hi, hi[:1]]), np.vstack([hj, hj[:1]])
                ):
                    return "Holes are nested", float(hj[0][0]), float(hj[0][1])
    return None, float("nan"), float("nan")


# --------------------------------------------------------------------------
# check_geometry
# --------------------------------------------------------------------------


def check_geometry(
    df: DataFrame,
    id_col: str = "id",
    geom_col: str = "wkb",
    include_valid: bool = False,
) -> DataFrame:
    """'gdal vector check-geometry': per-feature validity report with
    error-location points (gdalalg_vector_check_geometry.cpp ——
    output layer ``error_location`` with an ``error`` string field).
    Pure map-side; zero shuffles."""
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("error", StringType(), True),
            StructField("x", DoubleType(), True),
            StructField("y", DoubleType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[id_col], pdf[geom_col]):
                err, x, y = validate_geometry(bytes(buf))
                if err is not None:
                    rows.append((int(fid), err, x, y))
                elif include_valid:
                    rows.append((int(fid), None, None, None))
            yield pd.DataFrame(rows, columns=["id", "error", "x", "y"])

    return df.select(id_col, geom_col).mapInPandas(fn, schema)


# --------------------------------------------------------------------------
# Neighbor-pair machinery (cell-cover self-join)
# --------------------------------------------------------------------------


def _with_cells(df: DataFrame, id_col: str, geom_col: str, cell: float):
    """Explode features to covering grid cells, carrying bbox columns.
    Pair dedupe uses the min-corner rule: a pair is processed only in
    the cell containing the lower-left corner of the bbox overlap, so
    no distinct/groupBy dedupe shuffle is needed."""
    schema = StructType(
        [
            StructField("cx", LongType()),
            StructField("cy", LongType()),
            StructField("fid", LongType()),
            StructField("g", BinaryType()),
            StructField("x0", DoubleType()),
            StructField("y0", DoubleType()),
            StructField("x1", DoubleType()),
            StructField("y1", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[id_col], pdf[geom_col]):
                polys = _polys_of(bytes(buf))
                if not polys:
                    continue
                pts = np.vstack([r for rings in polys for r in rings])
                x0, y0 = pts.min(axis=0)
                x1, y1 = pts.max(axis=0)
                for cx in range(int(np.floor(x0 / cell)), int(np.floor(x1 / cell)) + 1):
                    for cy in range(
                        int(np.floor(y0 / cell)), int(np.floor(y1 / cell)) + 1
                    ):
                        rows.append(
                            (cx, cy, int(fid), bytes(buf),
                             float(x0), float(y0), float(x1), float(y1))
                        )
            yield pd.DataFrame(
                rows, columns=["cx", "cy", "fid", "g", "x0", "y0", "x1", "y1"]
            )

    return df.select(id_col, geom_col).mapInPandas(fn, schema)


def _candidate_pairs(
    df: DataFrame, id_col: str, geom_col: str, cell: float
) -> DataFrame:
    """(a_fid, a_g, b_fid, b_g) bbox-overlapping pairs, each exactly
    once (a_fid < b_fid, min-corner cell dedupe)."""
    cells = _with_cells(df, id_col, geom_col, cell)
    a = cells.alias("a")
    b = cells.alias("b")
    ov_x0 = F.greatest(F.col("a.x0"), F.col("b.x0"))
    ov_y0 = F.greatest(F.col("a.y0"), F.col("b.y0"))
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.fid") < F.col("b.fid")),
        )
        .where(
            (F.col("a.x0") <= F.col("b.x1"))
            & (F.col("b.x0") <= F.col("a.x1"))
            & (F.col("a.y0") <= F.col("b.y1"))
            & (F.col("b.y0") <= F.col("a.y1"))
            & (F.floor(ov_x0 / F.lit(cell)) == F.col("a.cx"))
            & (F.floor(ov_y0 / F.lit(cell)) == F.col("a.cy"))
        )
        .select(
            F.col("a.fid").alias("a_fid"),
            F.col("a.g").alias("a_g"),
            F.col("b.fid").alias("b_fid"),
            F.col("b.g").alias("b_g"),
        )
    )


def _auto_cell(df: DataFrame, id_col: str, geom_col: str) -> float:
    """Cell size = 2 × the largest bbox extent — guarantees the
    min-corner dedupe rule sees every overlap, keeps the per-feature
    cell fan-out ≤ 4.  One bounded-metadata agg (a single driver
    scalar), annotated per the collect lint."""
    schema = StructType([StructField("ext", DoubleType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            exts = []
            for buf in pdf[geom_col]:
                polys = _polys_of(bytes(buf))
                if not polys:
                    continue
                pts = np.vstack([r for rings in polys for r in rings])
                d = pts.max(axis=0) - pts.min(axis=0)
                exts.append(float(max(d[0], d[1])))
            yield pd.DataFrame({"ext": exts})

    row = (
        df.select(geom_col).mapInPandas(fn, schema).agg(F.max("ext")).first()
    )  # bounded: single scalar
    ext = row[0] or 1.0
    return max(2.0 * ext, 1e-9)


# --------------------------------------------------------------------------
# check_coverage
# --------------------------------------------------------------------------


def _seg_iter(rings: list[list[np.ndarray]]):
    for poly in rings:
        for ring in poly:
            r = C._open(ring)
            for i in range(len(r)):
                yield r[i], r[(i + 1) % len(r)]


def _canon_seg(p, q) -> tuple:
    a = (round(float(p[0]), _SNAP_DP), round(float(p[1]), _SNAP_DP))
    b = (round(float(q[0]), _SNAP_DP), round(float(q[1]), _SNAP_DP))
    return (a, b) if a <= b else (b, a)


def _collinear_partial(p, q, r, u) -> bool:
    """pq and ru collinear-overlap over a positive length without
    being the identical segment (T-junction / mis-snapped vertex)."""
    if _canon_seg(p, q) == _canon_seg(r, u):
        return False
    d1 = q - p
    L2 = float(d1 @ d1)
    if L2 < 1e-24:
        return False
    scale = max(1.0, float(np.abs(d1).max()))
    if abs(np.cross(d1, r - p)) > 1e-9 * scale or abs(
        np.cross(d1, u - p)
    ) > 1e-9 * scale:
        return False
    t0 = float((r - p) @ d1) / L2
    t1 = float((u - p) @ d1) / L2
    lo, hi = min(t0, t1), max(t0, t1)
    return min(hi, 1.0) - max(lo, 0.0) > 1e-9


def _pair_invalid_segments(A, B) -> tuple[list, list]:
    """Invalid boundary segments of each side of a candidate pair:
    proper crossings, segments interior to the neighbor, and partial
    collinear overlaps (GEOS coverage-validity edge rules)."""
    segs_a = list(_seg_iter(A))
    segs_b = list(_seg_iter(B))
    bad_a, bad_b = set(), set()
    for i, (p, q) in enumerate(segs_a):
        for j, (r, u) in enumerate(segs_b):
            if C.segments_cross_strict(p, q, r, u):
                bad_a.add(i)
                bad_b.add(j)
            elif _collinear_partial(p, q, r, u):
                bad_a.add(i)
                bad_b.add(j)
    for i, (p, q) in enumerate(segs_a):
        if i in bad_a:
            continue
        mid = (p + q) / 2.0
        for rings in B:
            if C.strictly_inside(
                np.array([mid[0]]), np.array([mid[1]]), rings, 1e-12
            )[0] and not C.on_boundary(
                np.array([mid[0]]), np.array([mid[1]]), rings, 1e-9
            )[0]:
                bad_a.add(i)
                break
    for j, (r, u) in enumerate(segs_b):
        if j in bad_b:
            continue
        mid = (r + u) / 2.0
        for rings in A:
            if C.strictly_inside(
                np.array([mid[0]]), np.array([mid[1]]), rings, 1e-12
            )[0] and not C.on_boundary(
                np.array([mid[0]]), np.array([mid[1]]), rings, 1e-9
            )[0]:
                bad_b.add(j)
                break
    return (
        [segs_a[i] for i in sorted(bad_a)],
        [segs_b[j] for j in sorted(bad_b)],
    )


def check_coverage(
    df: DataFrame,
    id_col: str = "id",
    geom_col: str = "wkb",
    cell_size: float | None = None,
) -> DataFrame:
    """'gdal vector check-coverage': per-feature ``invalid_edge``
    linework where the polygonal coverage is broken — overlaps,
    crossings, T-junction partial edges
    (gdalalg_vector_check_coverage.cpp:184 invalid_edge layer).
    Returns (id, n_invalid, invalid_edge wkb) for broken features
    only.  Cell self-join + per-pair refine; 2 shuffles."""
    cell = cell_size if cell_size is not None else _auto_cell(df, id_col, geom_col)
    pairs = _candidate_pairs(df, id_col, geom_col, cell)

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("sx0", DoubleType()),
            StructField("sy0", DoubleType()),
            StructField("sx1", DoubleType()),
            StructField("sy1", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a_fid, a_g, b_fid, b_g in zip(
                pdf["a_fid"], pdf["a_g"], pdf["b_fid"], pdf["b_g"]
            ):
                A, B = _polys_of(bytes(a_g)), _polys_of(bytes(b_g))
                bad_a, bad_b = _pair_invalid_segments(A, B)
                for p, q in bad_a:
                    rows.append(
                        (int(a_fid), float(p[0]), float(p[1]), float(q[0]), float(q[1]))
                    )
                for p, q in bad_b:
                    rows.append(
                        (int(b_fid), float(p[0]), float(p[1]), float(q[0]), float(q[1]))
                    )
            yield pd.DataFrame(rows, columns=["id", "sx0", "sy0", "sx1", "sy1"])

    segs = pairs.mapInPandas(fn, schema).dropDuplicates(
        ["id", "sx0", "sy0", "sx1", "sy1"]
    )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("n_invalid", IntegerType()),
            StructField("invalid_edge", BinaryType()),
        ]
    )

    def assemble(key, pdf):
        lines = [
            np.array([[r.sx0, r.sy0], [r.sx1, r.sy1]])
            for r in pdf.itertuples()
        ]
        return pd.DataFrame(
            {
                "id": [int(key[0])],
                "n_invalid": [len(lines)],
                "invalid_edge": [W.multilinestring_to_wkb(lines)],
            }
        )

    return segs.groupBy("id").applyInPandas(assemble, out_schema)


# --------------------------------------------------------------------------
# clean_coverage
# --------------------------------------------------------------------------

MERGE_STRATEGIES = ("longest-border", "max-area", "min-area", "min-index")


def _snap_polys(polys, snap: float):
    if snap <= 0:
        return polys
    out = []
    for rings in polys:
        rr = []
        for ring in rings:
            r = np.round(np.asarray(ring, dtype=np.float64) / snap) * snap
            keep = [r[0]]
            for p in r[1:]:
                if not np.allclose(p, keep[-1]):
                    keep.append(p)
            r = np.array(keep)
            if len(r) >= 3 and not np.allclose(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            if len(r) >= 4 and abs(ring_area(r)) > 0:
                rr.append(r)
        if rr:
            out.append(rr)
    return out


def _border_lengths(piece: np.ndarray, A, B) -> tuple[float, float]:
    """Split the overlap piece's boundary length into the part lying on
    ∂B (adjacent to A's remainder → favors merging into A) and on ∂A
    (favors B) — the longest-border merge rule of GEOS CoverageClean."""
    r = C._open(piece)
    on_a = on_b = 0.0
    for i in range(len(r)):
        p, q = r[i], r[(i + 1) % len(r)]
        mid = (p + q) / 2.0
        ln = float(np.hypot(*(q - p)))
        mx, my = np.array([mid[0]]), np.array([mid[1]])
        if any(C.on_boundary(mx, my, rings, 1e-9)[0] for rings in B):
            on_b += ln
        elif any(C.on_boundary(mx, my, rings, 1e-9)[0] for rings in A):
            on_a += ln
    return on_a, on_b


def _merge_touching(polys: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """Union of interior-disjoint (edge-adjacent) polygons: node all
    boundary linework, drop segments whose midpoint lies on ≥2 input
    boundaries (internal shared edges), rebuild faces with hole
    nesting.  The XOR-edge union — exact for coverages."""
    from gdal_spark.geometry import noding as N

    if len(polys) <= 1:
        return polys
    lines = [np.vstack([C._open(r), C._open(r)[:1]]) for rings in polys for r in rings]
    segs = N.node_lines(lines)
    keep = []
    for a, b in segs:
        mid = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
        mx, my = np.array([mid[0]]), np.array([mid[1]])
        owners = sum(
            1
            for rings in polys
            if any(C.on_boundary(mx, my, [r], 1e-9)[0] for r in rings)
        )
        if owners == 1:
            keep.append(np.array([a, b], dtype=np.float64))
    merged = N.build_area(keep)
    return merged if merged else polys


def clean_coverage(
    df: DataFrame,
    id_col: str = "id",
    geom_col: str = "wkb",
    snapping_distance: float = 0.0,
    merge_strategy: str = "longest-border",
    maximum_gap_width: float = 0.0,
    cell_size: float | None = None,
) -> DataFrame:
    """'gdal vector clean-coverage' (gdalalg_vector_clean_coverage.cpp:
    34-46 — snapping-distance, merge-strategy choices longest-border/
    max-area/min-area/min-index, maximum-gap-width): snap vertices,
    assign each overlap region to exactly one neighbor by the merge
    strategy, and close narrow gaps into the longest-border neighbor.
    Returns (id, wkb) with the cleaned (multi)polygons.

    Overlap resolution is pairwise: the losing side subtracts the
    winner, so every doubly-covered region ends in exactly one feature
    (the strategy orders are total for min-index/max-area/min-area).
    Gap faces are found cell-locally — polygonize the cell's boundary
    linework, keep uncovered faces with width 2·area/perimeter ≤
    maximum-gap-width — and unioned into the winner via the XOR-edge
    merge."""
    if merge_strategy not in MERGE_STRATEGIES:
        raise ValueError(f"merge_strategy must be one of {MERGE_STRATEGIES}")
    spark = df.sparkSession
    snap = float(snapping_distance)

    # 1. snap pass (map-side)
    snap_schema = StructType(
        [StructField("fid", LongType()), StructField("g", BinaryType())]
    )

    def snap_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[id_col], pdf[geom_col]):
                polys = _snap_polys(_polys_of(bytes(buf)), snap)
                if polys:
                    rows.append(
                        (int(fid), W.multipolygon_to_wkb(polys))
                    )
            yield pd.DataFrame(rows, columns=["fid", "g"])

    snapped = df.select(id_col, geom_col).mapInPandas(snap_fn, snap_schema)
    cell = cell_size if cell_size is not None else _auto_cell(snapped, "fid", "g")

    # 2. overlap pair decisions → (loser, winner-geometry) rows
    pairs = _candidate_pairs(snapped, "fid", "g", cell)
    dec_schema = StructType(
        [
            StructField("loser", LongType()),
            StructField("winner_g", BinaryType()),
        ]
    )
    strategy = merge_strategy

    def decide(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a_fid, a_g, b_fid, b_g in zip(
                pdf["a_fid"], pdf["a_g"], pdf["b_fid"], pdf["b_g"]
            ):
                A, B = _polys_of(bytes(a_g)), _polys_of(bytes(b_g))
                inter = False
                pieces: list[np.ndarray] = []
                for ra in A:
                    for rb in B:
                        if C.poly_interiors_intersect(ra, rb):
                            inter = True
                            pieces.extend(
                                C.clip_general(C._ccw(ra[0]), C._ccw(rb[0]))
                            )
                if not inter:
                    continue
                area_a = sum(abs(ring_area(r[0])) for r in A)
                area_b = sum(abs(ring_area(r[0])) for r in B)
                if strategy == "min-index":
                    a_wins = a_fid < b_fid
                elif strategy == "max-area":
                    a_wins = (area_a, -int(a_fid)) > (area_b, -int(b_fid))
                elif strategy == "min-area":
                    a_wins = (area_a, int(a_fid)) < (area_b, int(b_fid))
                else:  # longest-border
                    on_a = on_b = 0.0
                    for p in pieces:
                        la, lb = _border_lengths(p, A, B)
                        on_a += la
                        on_b += lb
                    # piece boundary lying on ∂B borders A's remainder
                    a_wins = (on_b, -int(a_fid)) > (on_a, -int(b_fid))
                if a_wins:
                    rows.append((int(b_fid), bytes(a_g)))
                else:
                    rows.append((int(a_fid), bytes(b_g)))
            yield pd.DataFrame(rows, columns=["loser", "winner_g"])

    losses = pairs.mapInPandas(decide, dec_schema)

    # 3. gap faces (cell-local) → (winner fid, gap wkb)
    gaps_df = None
    if maximum_gap_width > 0:
        gaps_df = _find_gaps(snapped, cell, float(maximum_gap_width))

    # 4. assemble per feature: subtract losses, union gaps, merge
    losses_g = losses.groupBy("loser").agg(
        F.collect_list("winner_g").alias("winners")
    )
    joined = snapped.join(
        losses_g, snapped["fid"] == losses_g["loser"], "left"
    ).drop("loser")
    if gaps_df is not None:
        gaps_g = gaps_df.groupBy("winner").agg(
            F.collect_list("gap_g").alias("gaps")
        )
        joined = joined.join(
            gaps_g, joined["fid"] == gaps_g["winner"], "left"
        ).drop("winner")
    else:
        joined = joined.withColumn(
            "gaps", F.lit(None).cast("array<binary>")
        )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("wkb", BinaryType()),
            StructField("area", DoubleType()),
        ]
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, g, winners, gaps in zip(
                pdf["fid"], pdf["g"], pdf["winners"], pdf["gaps"]
            ):
                polys = _polys_of(bytes(g))
                if winners is not None and len(winners):
                    clips = [
                        C._ccw(r[0])
                        for wg in winners
                        for r in _polys_of(bytes(wg))
                    ]
                    new_polys = []
                    for rings in polys:
                        for piece in C.subtract_many(C._ccw(rings[0]), clips):
                            if abs(ring_area(piece)) > 1e-15:
                                new_polys.append([piece])
                    polys = new_polys
                if gaps is not None and len(gaps):
                    polys = polys + [
                        r for gg in gaps for r in _polys_of(bytes(gg))
                    ]
                    polys = _merge_touching(polys)
                if not polys:
                    continue
                rows.append(
                    (
                        int(fid),
                        W.multipolygon_to_wkb(polys),
                        float(
                            sum(
                                abs(ring_area(rings[0]))
                                - sum(abs(ring_area(h)) for h in rings[1:])
                                for rings in polys
                            )
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["id", "wkb", "area"])

    return joined.mapInPandas(assemble, out_schema)


def _find_gaps(snapped: DataFrame, cell: float, max_width: float) -> DataFrame:
    """Cell-local gap finder: polygonize each cell's boundary linework,
    keep bounded faces not covered by any feature whose width proxy
    2·area/perimeter ≤ max_width (the GEOS gap-width heuristic), and
    assign each to the neighbor sharing the longest border.  Faces are
    deduped by the representative-point-in-cell rule."""
    cells = _with_cells(snapped, "fid", "g", cell)
    grouped = cells.groupBy("cx", "cy").agg(
        F.collect_list("fid").alias("fids"),
        F.collect_list("g").alias("gs"),
    )
    schema = StructType(
        [
            StructField("winner", LongType()),
            StructField("gap_g", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.geometry import noding as N

        for pdf in batches:
            rows = []
            for cx, cy, fids, gs in zip(
                pdf["cx"], pdf["cy"], pdf["fids"], pdf["gs"]
            ):
                all_polys = [(int(f), _polys_of(bytes(g))) for f, g in zip(fids, gs)]
                lines = [
                    np.vstack([C._open(r), C._open(r)[:1]])
                    for _, polys in all_polys
                    for rings in polys
                    for r in rings
                ]
                for face in N.polygonize_lines(N.node_lines(lines)):
                    ip = C.interior_point([face])
                    if ip is None:
                        continue
                    # dedupe: owner cell of the representative point
                    if int(np.floor(ip[0] / cell)) != int(cx) or int(
                        np.floor(ip[1] / cell)
                    ) != int(cy):
                        continue
                    px, py = np.array([ip[0]]), np.array([ip[1]])
                    covered = any(
                        C.strictly_inside(px, py, rings, 1e-12)[0]
                        for _, polys in all_polys
                        for rings in polys
                    )
                    if covered:
                        continue
                    area = abs(ring_area(face))
                    per = sum(
                        float(np.hypot(*(face[i + 1] - face[i])))
                        for i in range(len(face) - 1)
                    )
                    if per <= 0 or 2.0 * area / per > max_width:
                        continue
                    # longest-border neighbor
                    best, best_len = None, -1.0
                    fr = C._open(face)
                    for fid, polys in all_polys:
                        ln = 0.0
                        for i in range(len(fr)):
                            p, q = fr[i], fr[(i + 1) % len(fr)]
                            mid = (p + q) / 2.0
                            mx, my = np.array([mid[0]]), np.array([mid[1]])
                            if any(
                                C.on_boundary(mx, my, rings, 1e-9)[0]
                                for rings in polys
                            ):
                                ln += float(np.hypot(*(q - p)))
                        if ln > best_len or (ln == best_len and (best is None or fid < best)):
                            best, best_len = fid, ln
                    if best is not None and best_len > 0:
                        rows.append((int(best), W.polygon_to_wkb([face])))
            yield pd.DataFrame(rows, columns=["winner", "gap_g"])

    return grouped.mapInPandas(fn, schema)


# --------------------------------------------------------------------------
# simplify_coverage
# --------------------------------------------------------------------------


def _vw_simplify(coords: np.ndarray, tol: float, closed: bool) -> np.ndarray:
    """Visvalingam-Whyatt: iteratively drop the vertex with the least
    effective triangle area while it is below tol² (the distance→area
    mapping GEOS TPVWSimplifier uses for CoverageSimplifyVW).  Chain
    endpoints are never dropped (open) / first vertex kept (closed)."""
    pts = [np.asarray(p, dtype=np.float64) for p in coords]
    thresh = float(tol) * float(tol)
    min_keep = 3 if closed else 2

    def tri_area(i: int, live: list[int]) -> float:
        k = live.index(i)
        if not closed and (k == 0 or k == len(live) - 1):
            return np.inf
        a = pts[live[k - 1]]
        b = pts[i]
        c = pts[live[(k + 1) % len(live)]]
        return abs(float(np.cross(b - a, c - a))) / 2.0

    live = list(range(len(pts)))
    while len(live) > min_keep:
        areas = [(tri_area(i, live), i) for i in live]
        amin, imin = min(areas)
        if amin >= thresh:
            break
        live.remove(imin)
    return np.array([pts[i] for i in live])


def _vkey(p) -> tuple:
    return (round(float(p[0]), _SNAP_DP), round(float(p[1]), _SNAP_DP))


def simplify_coverage(
    df: DataFrame,
    id_col: str = "id",
    geom_col: str = "wkb",
    tolerance: float = 0.0,
    preserve_boundary: bool = False,
) -> DataFrame:
    """'gdal vector simplify-coverage'
    (gdalalg_vector_simplify_coverage.cpp:34-43 — tolerance,
    preserve-boundary): topology-preserving simplification of a valid
    polygonal coverage.  Boundaries are decomposed into shared arcs;
    each arc is VW-simplified exactly once, so the two features either
    side of a shared boundary receive bit-identical coordinates and
    the coverage stays gap- and overlap-free by construction.  With
    preserve_boundary=True, arcs owned by a single feature (the
    coverage exterior) are left untouched — which also makes the SUM
    of feature areas an exact invariant (area lost by one neighbor
    along a shared arc is gained by the other).

    Distributed shape: segment explode (map) → owner resolution
    (groupBy seg key) → junction detection (groupBy vertex key) →
    arc assembly + simplify per owner-set group (applyInPandas,
    group size bounded by one feature pair's boundary) → ring
    reassembly per feature (groupBy fid).  4 shuffles, O(segments).
    """
    seg_schema = StructType(
        [
            StructField("seg", StringType()),
            StructField("fid", LongType()),
            StructField("part", IntegerType()),
            StructField("ring", IntegerType()),
            StructField("seq", IntegerType()),
            StructField("ax", DoubleType()),
            StructField("ay", DoubleType()),
            StructField("bx", DoubleType()),
            StructField("by", DoubleType()),
        ]
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[id_col], pdf[geom_col]):
                for pi, rings in enumerate(_polys_of(bytes(buf))):
                    for ri, ring in enumerate(rings):
                        r = C._open(ring)
                        for i in range(len(r)):
                            p, q = r[i], r[(i + 1) % len(r)]
                            ka, kb = _vkey(p), _vkey(q)
                            seg = (
                                f"{ka}|{kb}" if ka <= kb else f"{kb}|{ka}"
                            )
                            rows.append(
                                (
                                    seg, int(fid), pi, ri, i,
                                    float(p[0]), float(p[1]),
                                    float(q[0]), float(q[1]),
                                )
                            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "seg", "fid", "part", "ring", "seq",
                    "ax", "ay", "bx", "by",
                ],
            )

    segs = df.select(id_col, geom_col).mapInPandas(explode, seg_schema)

    owners = segs.groupBy("seg").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("fid").cast("string"))), ","
        ).alias("owner_key")
    )
    segs = segs.join(owners, "seg")

    # junction vertices: incident to >1 owner-set, or degree != 2
    verts = segs.select(
        "seg", "owner_key",
        F.concat_ws(",", F.round("ax", _SNAP_DP), F.round("ay", _SNAP_DP)).alias("v"),
    ).unionByName(
        segs.select(
            "seg", "owner_key",
            F.concat_ws(
                ",", F.round("bx", _SNAP_DP), F.round("by", _SNAP_DP)
            ).alias("v"),
        )
    )
    junctions = (
        verts.groupBy("v")
        .agg(
            F.countDistinct("owner_key").alias("n_ok"),
            F.countDistinct("seg").alias("n_seg"),
        )
        .where((F.col("n_ok") > 1) | (F.col("n_seg") != 2))
        .select("v")
        .withColumn("is_junction", F.lit(True))
    )
    with_j = (
        segs.withColumn(
            "va",
            F.concat_ws(",", F.round("ax", _SNAP_DP), F.round("ay", _SNAP_DP)),
        )
        .withColumn(
            "vb",
            F.concat_ws(",", F.round("bx", _SNAP_DP), F.round("by", _SNAP_DP)),
        )
        .join(
            junctions.withColumnRenamed("v", "va").withColumnRenamed(
                "is_junction", "ja"
            ),
            "va",
            "left",
        )
        .join(
            junctions.withColumnRenamed("v", "vb").withColumnRenamed(
                "is_junction", "jb"
            ),
            "vb",
            "left",
        )
        .fillna(False, ["ja", "jb"])
    )

    arc_schema = StructType(
        [
            StructField("fid", LongType()),
            StructField("part", IntegerType()),
            StructField("ring", IntegerType()),
            StructField("start_seq", IntegerType()),
            StructField("ls", BinaryType()),
        ]
    )
    tol = float(tolerance)
    keep_exterior = bool(preserve_boundary)

    def arcs(key, pdf):
        single_owner = "," not in key[0]
        cache: dict[tuple, np.ndarray] = {}
        rows = []
        for (fid, part, ring), grp in pdf.groupby(["fid", "part", "ring"]):
            g = grp.sort_values("seq")
            seqs = g["seq"].to_numpy()
            n_ring = None  # chains may not cover the full ring
            pts_a = g[["ax", "ay"]].to_numpy()
            pts_b = g[["bx", "by"]].to_numpy()
            ja = g["ja"].to_numpy()
            jb = g["jb"].to_numpy()
            # split the (sorted, possibly gapped) seq runs into chains
            # broken at junction vertices or seq discontinuities
            chains: list[list[int]] = []
            cur: list[int] = []
            for k in range(len(g)):
                if cur and (
                    seqs[k] != seqs[cur[-1]] + 1 or ja[k]
                ):
                    chains.append(cur)
                    cur = []
                cur.append(k)
                if jb[k]:
                    chains.append(cur)
                    cur = []
            if cur:
                chains.append(cur)
            # wrap-merge: last chain flows into first if the ring wraps
            # without a junction at vertex 0
            if (
                len(chains) > 1
                and seqs[chains[0][0]] == 0
                and not ja[chains[0][0]]
                and seqs[chains[-1][-1]] == len(grp) - 1
                and seqs[chains[-1][-1]] + 1 == (seqs.max() + 1)
                and not jb[chains[-1][-1]]
            ):
                chains = [chains[-1] + chains[0]] + chains[1:-1]
            del n_ring
            for ch in chains:
                coords = np.vstack(
                    [pts_a[ch[0]]] + [pts_b[k] for k in ch]
                )
                closed = _vkey(coords[0]) == _vkey(coords[-1])
                if single_owner and keep_exterior:
                    simp = coords
                elif tol <= 0:
                    simp = coords
                else:
                    canon = coords if not closed else _canon_closed(coords)
                    ck = tuple(_vkey(p) for p in canon)
                    rk = tuple(reversed(ck))
                    if ck in cache:
                        simp_c = cache[ck]
                        simp = simp_c
                    elif rk in cache:
                        simp = cache[rk][::-1]
                    else:
                        simp_c = _vw_simplify(canon, tol, closed)
                        cache[ck] = simp_c
                        simp = simp_c
                    if closed:
                        simp = _align_closed(simp, coords)
                    elif not np.allclose(simp[0], coords[0]):
                        simp = simp[::-1]
                rows.append(
                    (
                        int(fid), int(part), int(ring),
                        int(seqs[ch[0]]),
                        W.linestring_to_wkb(np.asarray(simp, dtype=np.float64)),
                    )
                )
        return pd.DataFrame(
            rows, columns=["fid", "part", "ring", "start_seq", "ls"]
        )

    arc_rows = with_j.groupBy("owner_key").applyInPandas(arcs, arc_schema)

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("wkb", BinaryType()),
            StructField("n_points", IntegerType()),
            StructField("area", DoubleType()),
        ]
    )

    def reassemble(key, pdf):
        fid = int(key[0])
        polys: dict[int, dict[int, np.ndarray]] = {}
        npts = 0
        for (part, ring), grp in pdf.groupby(["part", "ring"]):
            pieces = []
            for r in grp.sort_values("start_seq").itertuples():
                t, coords = W.parse_wkb(bytes(r.ls))
                pieces.append(np.asarray(coords, dtype=np.float64))
            ring_pts = [pieces[0]]
            for p in pieces[1:]:
                ring_pts.append(
                    p[1:] if np.allclose(p[0], ring_pts[-1][-1]) else p
                )
            rc = np.vstack(ring_pts)
            if not np.allclose(rc[0], rc[-1]):
                rc = np.vstack([rc, rc[:1]])
            if len(rc) < 4:
                continue
            polys.setdefault(int(part), {})[int(ring)] = rc
            npts += len(rc) - 1
        out = []
        for part in sorted(polys):
            rings = [polys[part][ri] for ri in sorted(polys[part])]
            out.append(rings)
        if not out:
            return pd.DataFrame(columns=["id", "wkb", "n_points", "area"])
        area = float(
            sum(
                abs(ring_area(rings[0]))
                - sum(abs(ring_area(h)) for h in rings[1:])
                for rings in out
            )
        )
        return pd.DataFrame(
            {
                "id": [fid],
                "wkb": [W.multipolygon_to_wkb(out)],
                "n_points": [npts],
                "area": [area],
            }
        )

    return arc_rows.groupBy("fid").applyInPandas(reassemble, out_schema)


def _canon_closed(coords: np.ndarray) -> np.ndarray:
    """Canonical form of a closed chain (both owners must derive the
    SAME vertex sequence): rotate the open ring to its lexicographic
    minimum vertex, orient so the successor is smaller than the
    predecessor."""
    r = coords[:-1] if _vkey(coords[0]) == _vkey(coords[-1]) else coords
    keys = [_vkey(p) for p in r]
    i = min(range(len(keys)), key=lambda k: keys[k])
    rot = np.vstack([r[i:], r[:i]])
    if _vkey(rot[1]) > _vkey(rot[-1]):
        rot = np.vstack([rot[:1], rot[1:][::-1]])
    return np.vstack([rot, rot[:1]])


def _align_closed(simp: np.ndarray, orig: np.ndarray) -> np.ndarray:
    """Map a canonically-simplified closed chain back into the owner's
    traversal: rotate to the owner's start vertex if it survived, and
    match the owner's orientation."""
    s = simp[:-1] if _vkey(simp[0]) == _vkey(simp[-1]) else simp
    skeys = [_vkey(p) for p in s]
    want = _vkey(orig[0])
    if want in skeys:
        i = skeys.index(want)
        s = np.vstack([s[i:], s[:i]])
    if _ring_orient(s) != _ring_orient(orig[:-1]):
        s = np.vstack([s[:1], s[1:][::-1]])
    return np.vstack([s, s[:1]])


def _ring_orient(r: np.ndarray) -> bool:
    return ring_area(np.vstack([r, r[:1]])) >= 0
