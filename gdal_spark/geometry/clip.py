"""Polygon clipping & constructive geometry — pure numpy, no GEOS.

The layer-algebra operators (SURVEY §2.3: OGRLayer::Intersection/Union/
SymDifference/Identity/Update/Clip/Erase, ogrlayer.cpp:5361-7822) need
pairwise polygon set operations. Strategy:

- A ∩ B for convex B: Sutherland–Hodgman clip of (possibly concave) A
  against each half-plane of B. Exact for our operand shapes.
- A − B for convex B with edges H_1..H_k: the standard half-plane
  decomposition  A − B = ⊎_i (A ∩ H̄_i ∩ H_1 ∩ … ∩ H_{i-1}),
  a disjoint piece per edge — emitted as a MultiPolygon.
- A ∪ B = (A − B) ⊎ B,  A △ B = (A − B) ⊎ (B − A).

The *_convex fast paths require a convex clip operand; the *_general
variants lift that restriction by ear-clipping the clip polygon into a
triangle partition and composing the convex machinery (subjects may
always be concave). All results are validated in tests against area
invariants (|A∩B| + |A−B| = |A|, |A∪B| = |A|+|B|−|A∩B|), golden
fixtures, and hypothesis-randomized star polygons.

KNOWN LIMITATION (documented contract): Sutherland–Hodgman on a concave
SUBJECT can emit a single ring that joins disjoint result pieces with
zero-width bridges along the clip edge. Such rings are area-correct and
render correctly under the even-odd rule, but are not guaranteed
OGC-simple; downstream consumers needing simple rings should pass
results through functions.st _is_simple / make_valid, or decompose via
triangulate(). The layer-algebra oracles compare areas/row sets, which
are invariant to the bridge representation.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.kernels import (
    points_in_rings,
    ring_area,
    ring_is_ccw,
)

_EPS_AREA = 1e-12


def _open(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    return r


def _ccw(ring: np.ndarray) -> np.ndarray:
    r = _open(ring)
    return r if ring_is_ccw(r) else r[::-1]


def clip_half_plane(ring: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Clip an open ring against the half-plane LEFT of directed edge
    a→b (inclusive). Returns an open ring (possibly empty).
    Sutherland–Hodgman step; vectorized classify, python loop only over
    the (small) vertex list for output assembly."""
    r = _open(ring)
    n = len(r)
    if n == 0:
        return r
    d = b - a
    # signed side: >0 strictly inside (left), 0 on boundary
    side = d[0] * (r[:, 1] - a[1]) - d[1] * (r[:, 0] - a[0])
    inside = side >= 0.0
    if inside.all():
        return r
    if not inside.any():
        return r[:0]
    out: list[np.ndarray] = []
    for i in range(n):
        j = (i + 1) % n
        pi, pj = r[i], r[j]
        si, sj = side[i], side[j]
        if inside[i]:
            out.append(pi)
            if not inside[j]:
                t = si / (si - sj)
                out.append(pi + t * (pj - pi))
        elif inside[j]:
            t = si / (si - sj)
            out.append(pi + t * (pj - pi))
    return np.array(out, dtype=np.float64)


def convex_edges(poly: np.ndarray):
    """(a, b) CCW directed edge pairs of a convex ring."""
    p = _ccw(poly)
    return [(p[i], p[(i + 1) % len(p)]) for i in range(len(p))]


def clip_convex(subject: np.ndarray, clip_poly: np.ndarray) -> np.ndarray:
    """subject ∩ clip_poly (clip convex). Open ring result ((0,2) if empty)."""
    r = _ccw(subject)
    for a, b in convex_edges(clip_poly):
        r = clip_half_plane(r, a, b)
        if len(r) < 3:
            return r[:0].reshape(0, 2)
    if abs(ring_area(r)) < _EPS_AREA:
        return r[:0].reshape(0, 2)
    return r


def difference_convex(subject: np.ndarray, clip_poly: np.ndarray) -> list[np.ndarray]:
    """subject − clip_poly (clip convex) as disjoint pieces (open rings).

    Half-plane decomposition: piece_i keeps what is OUTSIDE edge i but
    inside edges 1..i-1 — every output piece is disjoint and their union
    is exactly subject − clip."""
    pieces: list[np.ndarray] = []
    remaining = _ccw(subject)
    for a, b in convex_edges(clip_poly):
        outside = clip_half_plane(remaining, b, a)  # reversed edge = outside
        if len(outside) >= 3 and abs(ring_area(outside)) > _EPS_AREA:
            pieces.append(outside)
        remaining = clip_half_plane(remaining, a, b)
        if len(remaining) < 3:
            break
    return pieces


def union_convex(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    """a ∪ b as disjoint pieces (b convex)."""
    return difference_convex(a, b) + [_ccw(b)]


def sym_difference_convex(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    """a △ b as disjoint pieces (both convex for the b−a direction)."""
    return difference_convex(a, b) + difference_convex(b, a)


# --- predicates ---


def segments_intersect(p1, p2, q1, q2) -> bool:
    d1 = np.cross(q2 - q1, p1 - q1)
    d2 = np.cross(q2 - q1, p2 - q1)
    d3 = np.cross(p2 - p1, q1 - p1)
    d4 = np.cross(p2 - p1, q2 - p1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    return False


def rings_bbox_disjoint(a: np.ndarray, b: np.ndarray) -> bool:
    a = _open(a)
    b = _open(b)
    return (
        a[:, 0].max() < b[:, 0].min()
        or b[:, 0].max() < a[:, 0].min()
        or a[:, 1].max() < b[:, 1].min()
        or b[:, 1].max() < a[:, 1].min()
    )


def polygons_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """Exterior-ring intersects test: the reference's 3-stage contract
    (envelope reject → refine; ogrlayer.cpp:3981-4048) with the refine =
    any-edge-crossing OR containment either way."""
    a = _open(a)
    b = _open(b)
    if rings_bbox_disjoint(a, b):
        return False
    if points_in_rings(a[:1, 0], a[:1, 1], [b])[0]:
        return True
    if points_in_rings(b[:1, 0], b[:1, 1], [a])[0]:
        return True
    na, nb = len(a), len(b)
    for i in range(na):
        p1, p2 = a[i], a[(i + 1) % na]
        for j in range(nb):
            if segments_intersect(p1, p2, b[j], b[(j + 1) % nb]):
                return True
    return False


def polygon_contains(outer: np.ndarray, inner: np.ndarray) -> bool:
    """True if every vertex of `inner` is inside `outer` and no edges
    cross (sufficient for simple polygons)."""
    o = _open(outer)
    i = _open(inner)
    if not points_in_rings(i[:, 0], i[:, 1], [o]).all():
        return False
    no, ni = len(o), len(i)
    for x in range(ni):
        p1, p2 = i[x], i[(x + 1) % ni]
        for y in range(no):
            if segments_intersect(p1, p2, o[y], o[(y + 1) % no]):
                return False
    return True


# --- constructive ---


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain → CCW open ring. O(n log n) numpy sort +
    small python loop (driver/batch-side geometry counts are small)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        h: list[np.ndarray] = []
        for p in seq:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def simplify_dp(ring: np.ndarray, tol: float, closed: bool = True) -> np.ndarray:
    """Douglas–Peucker (same semantics as OGR Simplify: keep points
    farther than tol from the chord)."""
    pts = np.asarray(ring, dtype=np.float64)
    was_closed = len(pts) >= 2 and np.array_equal(pts[0], pts[-1])
    if closed and not was_closed:
        pts = np.vstack([pts, pts[:1]])

    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        ln = np.hypot(*seg)
        mid = pts[i + 1 : j]
        if ln == 0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            d = np.abs(np.cross(seg, mid - pts[i])) / ln
        m = int(np.argmax(d))
        if d[m] > tol:
            keep[i + 1 + m] = True
            stack.append((i, i + 1 + m))
            stack.append((i + 1 + m, j))
    out = pts[keep]
    if closed and not was_closed:
        out = out[:-1]
    return out


def segmentize(ring: np.ndarray, max_len: float, closed: bool = True) -> np.ndarray:
    """Insert vertices so no segment exceeds max_len (gdal vector
    segmentize, apps/gdalalg_vector_segmentize.cpp:33)."""
    pts = np.asarray(ring, dtype=np.float64)
    if closed and not np.array_equal(pts[0], pts[-1]):
        pts = np.vstack([pts, pts[:1]])
    out = [pts[0]]
    for i in range(1, len(pts)):
        a, b = pts[i - 1], pts[i]
        d = float(np.hypot(*(b - a)))
        n = max(1, int(np.ceil(d / max_len)))
        for s in range(1, n + 1):
            out.append(a + (b - a) * (s / n))
    res = np.array(out, dtype=np.float64)
    if closed:
        res = res[:-1]
    return res


def buffer_polygon(
    ring: np.ndarray, dist: float, quadrant_segments: int = 8
) -> np.ndarray:
    """Round-join outward buffer of a convex CCW ring (endcap/join per
    gdal vector buffer defaults, apps/gdalalg_vector_buffer.cpp:32-52).
    dist<0 erodes by intersecting inward-offset half-planes."""
    r = _ccw(ring)
    n = len(r)
    if dist == 0:
        return r
    if dist < 0:
        out = r
        for i in range(n):
            a, b = r[i], r[(i + 1) % n]
            e = b - a
            nrm = np.array([e[1], -e[0]])
            nrm = nrm / np.hypot(*nrm)  # outward for CCW
            out = clip_half_plane(out, a + nrm * dist, b + nrm * dist)
            if len(out) < 3:
                return out[:0].reshape(0, 2)
        return out
    pts: list[np.ndarray] = []
    for i in range(n):
        p_prev, p, p_next = r[i - 1], r[i], r[(i + 1) % n]
        e0, e1 = p - p_prev, p_next - p
        n0 = np.array([e0[1], -e0[0]]) / np.hypot(*e0)
        n1 = np.array([e1[1], -e1[0]]) / np.hypot(*e1)
        a0 = np.arctan2(n0[1], n0[0])
        a1 = np.arctan2(n1[1], n1[0])
        while a1 < a0:  # outward normals rotate CCW around a convex CCW ring
            a1 += 2 * np.pi
        steps = max(1, int(np.ceil((a1 - a0) / (np.pi / 2 / quadrant_segments))))
        angles = a0 + (a1 - a0) * np.arange(steps + 1) / steps
        for ang in angles:
            pts.append(p + dist * np.array([np.cos(ang), np.sin(ang)]))
    return np.array(pts, dtype=np.float64)


def buffer_point(x: float, y: float, dist: float, quadrant_segments: int = 8) -> np.ndarray:
    k = 4 * quadrant_segments
    ang = 2 * np.pi * np.arange(k) / k
    return np.column_stack([x + dist * np.cos(ang), y + dist * np.sin(ang)])


# --- distance ---


def point_segment_dist(px, py, a, b) -> np.ndarray:
    """Distance of points (px,py) to segment a-b, vectorized over points."""
    ab = b - a
    ap = np.column_stack([px - a[0], py - a[1]])
    denom = float(ab @ ab)
    t = np.clip((ap @ ab) / denom, 0.0, 1.0) if denom > 0 else np.zeros(len(ap))
    cx = a[0] + t * ab[0]
    cy = a[1] + t * ab[1]
    return np.hypot(px - cx, py - cy)


def polygon_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Min planar distance between polygon boundaries; 0 if they
    intersect or one contains the other (OGR Distance semantics)."""
    a = _open(a)
    b = _open(b)
    if polygons_intersect(a, b):
        return 0.0
    best = np.inf
    for i in range(len(b)):
        p, q = b[i], b[(i + 1) % len(b)]
        best = min(best, float(point_segment_dist(a[:, 0], a[:, 1], p, q).min()))
    for i in range(len(a)):
        p, q = a[i], a[(i + 1) % len(a)]
        best = min(best, float(point_segment_dist(b[:, 0], b[:, 1], p, q).min()))
    return best


# --- general (concave-capable) clipping via ear-clipping decomposition ---


def is_convex(ring: np.ndarray) -> bool:
    """True if the (open or closed) simple ring is convex."""
    r = _ccw(ring)
    n = len(r)
    if n < 4:
        return True
    v1 = np.roll(r, -1, axis=0) - r
    v2 = np.roll(r, -2, axis=0) - np.roll(r, -1, axis=0)
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    return bool((cross >= -1e-12 * np.abs(cross).max()).all())


def triangulate(ring: np.ndarray) -> list[np.ndarray]:
    """Ear-clipping triangulation of a simple polygon (CCW normalized).
    O(n²); robust for the small polygon sizes of geometry columns. The
    triangles PARTITION the polygon, which turns every general clip into
    a union of convex clips (see *_general below)."""
    r = _ccw(ring)
    n = len(r)
    if n < 3:
        return []
    if n == 3:
        return [r.copy()]
    idx = list(range(n))
    tris: list[np.ndarray] = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = r[i0], r[i1], r[i2]
            # convex corner?
            if np.cross(b - a, c - b) <= 1e-14:
                continue
            # no other active vertex inside the candidate ear
            tri = np.array([a, b, c])
            others = [j for j in idx if j not in (i0, i1, i2)]
            if others:
                pts = r[others]
                inside = points_in_rings(pts[:, 0], pts[:, 1], [tri])
                # also reject vertices exactly on the ear boundary that
                # the even-odd test misses (collinear degeneracies)
                if inside.any():
                    continue
            tris.append(tri)
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            # degenerate remainder (collinear runs): fall back to a fan —
            # area-correct for the remaining near-convex chain
            break
    rem = r[idx]
    for k in range(1, len(rem) - 1):
        t = np.array([rem[0], rem[k], rem[k + 1]])
        if abs(ring_area(t)) > _EPS_AREA:
            tris.append(t)
    return tris


def _convex_parts(poly: np.ndarray) -> list[np.ndarray]:
    return [ _ccw(poly) ] if is_convex(poly) else triangulate(poly)


def clip_general(subject: np.ndarray, clip_poly: np.ndarray) -> list[np.ndarray]:
    """subject ∩ clip_poly for ARBITRARY simple polygons: clip against
    each convex part of clip_poly — the parts partition it, so the
    result pieces are disjoint and their union is the intersection."""
    out: list[np.ndarray] = []
    for part in _convex_parts(clip_poly):
        r = clip_convex(subject, part)
        if len(r) >= 3 and abs(ring_area(r)) > _EPS_AREA:
            out.append(r)
    return out


def difference_general(
    subject: np.ndarray, clip_poly: np.ndarray
) -> list[np.ndarray]:
    """subject − clip_poly for arbitrary simple polygons: successively
    subtract each convex part."""
    pieces = [_ccw(subject)]
    for part in _convex_parts(clip_poly):
        nxt: list[np.ndarray] = []
        for p in pieces:
            nxt.extend(difference_convex(p, part))
        pieces = nxt
        if not pieces:
            break
    return pieces


def union_general(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    return difference_general(a, b) + _convex_parts(b)


def sym_difference_general(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    return difference_general(a, b) + difference_general(b, a)


# --- multi-ring (hole-aware) DE-9IM-style predicates ---------------------
# OGRGeometry::Intersects/Contains/Within/Touches/Crosses/Overlaps/Equals
# semantics (ogr/ogrgeometry.cpp:569-599, delegated to GEOS there) over
# full polygons = exterior + interior rings, even-odd containment.
# A "polygon" here is a list of open/closed rings; holes flip parity.


def segments_cross_strict(p1, p2, q1, q2) -> bool:
    """Transversal interior crossing only: shared endpoints / collinear
    touches do NOT count (used by the OGC proper-crossing tests)."""
    d1 = float(np.cross(q2 - q1, p1 - q1))
    d2 = float(np.cross(q2 - q1, p2 - q1))
    d3 = float(np.cross(p2 - p1, q1 - p1))
    d4 = float(np.cross(p2 - p1, q2 - p1))
    return d1 * d2 < 0 and d3 * d4 < 0


def _all_edges(rings) -> list[tuple[np.ndarray, np.ndarray]]:
    out = []
    for ring in rings:
        r = _open(ring)
        n = len(r)
        for i in range(n):
            out.append((r[i], r[(i + 1) % n]))
    return out


def _poly_bbox(rings) -> tuple[float, float, float, float]:
    c = np.vstack([_open(r) for r in rings])
    return (
        float(c[:, 0].min()),
        float(c[:, 1].min()),
        float(c[:, 0].max()),
        float(c[:, 1].max()),
    )


def _bbox_disjoint(A, B) -> bool:
    a, b = _poly_bbox(A), _poly_bbox(B)
    return a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1]


def _rel_eps(A, B) -> float:
    a, b = _poly_bbox(A), _poly_bbox(B)
    span = max(a[2] - a[0], a[3] - a[1], b[2] - b[0], b[3] - b[1], 1.0)
    return 1e-9 * span


def on_boundary(px: np.ndarray, py: np.ndarray, rings, eps: float) -> np.ndarray:
    """True where (px, py) lies within eps of any ring edge."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    hit = np.zeros(px.shape, dtype=bool)
    for p, q in _all_edges(rings):
        hit |= point_segment_dist(px, py, p, q) <= eps
    return hit


def strictly_inside(px: np.ndarray, py: np.ndarray, rings, eps: float) -> np.ndarray:
    from gdal_spark.geometry.kernels import points_in_rings

    return points_in_rings(px, py, rings) & ~on_boundary(px, py, rings, eps)


def inside_or_on(px: np.ndarray, py: np.ndarray, rings, eps: float) -> np.ndarray:
    from gdal_spark.geometry.kernels import points_in_rings

    return points_in_rings(px, py, rings) | on_boundary(px, py, rings, eps)


def _seg_seg_dist(p1, p2, q1, q2) -> float:
    if segments_intersect(p1, p2, q1, q2):
        return 0.0
    return float(
        min(
            point_segment_dist(np.array([p1[0]]), np.array([p1[1]]), q1, q2)[0],
            point_segment_dist(np.array([p2[0]]), np.array([p2[1]]), q1, q2)[0],
            point_segment_dist(np.array([q1[0]]), np.array([q1[1]]), p1, p2)[0],
            point_segment_dist(np.array([q2[0]]), np.array([q2[1]]), p1, p2)[0],
        )
    )


def edges_cross_properly(A, B) -> bool:
    """Any transversal (interior-to-interior) edge crossing between the
    boundary of A and the boundary of B."""
    eb = _all_edges(B)
    for p1, p2 in _all_edges(A):
        for q1, q2 in eb:
            if segments_cross_strict(p1, p2, q1, q2):
                return True
    return False


def boundaries_touch(A, B, eps: float) -> bool:
    """Boundaries share at least one point (endpoint touch, collinear
    overlap, or proper crossing)."""
    eb = _all_edges(B)
    for p1, p2 in _all_edges(A):
        for q1, q2 in eb:
            if _seg_seg_dist(p1, p2, q1, q2) <= eps:
                return True
    return False


def interior_point(rings) -> np.ndarray | None:
    """A point strictly inside the polygon (outside its holes): first
    ear-clip triangle centroid that passes the even-odd + off-boundary
    test."""
    eps = 1e-9 * max(
        1.0,
        float(np.abs(np.vstack([_open(r) for r in rings])).max()),
    )
    for tri in triangulate(rings[0]):
        c = tri.mean(axis=0)
        # centroid may land in a hole — also probe toward each vertex
        cands = [c] + [
            (1 - t) * v + t * c for v in tri for t in (0.1, 0.5, 0.9)
        ]
        for cand in cands:
            if strictly_inside(
                np.array([cand[0]]), np.array([cand[1]]), rings, eps
            )[0]:
                return cand
    return None


def poly_interiors_intersect(A, B) -> bool:
    if _bbox_disjoint(A, B):
        return False
    if edges_cross_properly(A, B):
        return True
    eps = _rel_eps(A, B)
    ip = interior_point(A)
    if ip is not None and strictly_inside(
        np.array([ip[0]]), np.array([ip[1]]), B, eps
    )[0]:
        return True
    ip = interior_point(B)
    if ip is not None and strictly_inside(
        np.array([ip[0]]), np.array([ip[1]]), A, eps
    )[0]:
        return True
    # partial overlap whose boundary contact is vertex-on-edge only:
    # check vertices and edge midpoints of each against the other
    for X, Y in ((A, B), (B, A)):
        for ring in X:
            r = _open(ring)
            mids = (r + np.roll(r, -1, axis=0)) / 2.0
            pts = np.vstack([r, mids])
            if strictly_inside(pts[:, 0], pts[:, 1], Y, eps).any():
                return True
    return False


def poly_intersects_full(A, B) -> bool:
    """Hole-aware Intersects: interiors or boundaries share a point."""
    if _bbox_disjoint(A, B):
        return False
    eps = _rel_eps(A, B)
    return boundaries_touch(A, B, eps) or poly_interiors_intersect(A, B)


def poly_touches(A, B) -> bool:
    """Boundaries meet, interiors do not (OGC Touches)."""
    if _bbox_disjoint(A, B):
        return False
    eps = _rel_eps(A, B)
    return boundaries_touch(A, B, eps) and not poly_interiors_intersect(A, B)


def poly_contains_full(A, B) -> bool:
    """A contains B (hole-aware): every B vertex/edge-midpoint inside-or-on
    A, no transversal boundary crossings, no hole of A swallowed by B, and
    B's interior actually inside A's."""
    if _bbox_disjoint(A, B):
        return False
    eps = _rel_eps(A, B)
    for ring in B:
        r = _open(ring)
        mids = (r + np.roll(r, -1, axis=0)) / 2.0
        pts = np.vstack([r, mids])
        if not inside_or_on(pts[:, 0], pts[:, 1], A, eps).all():
            return False
    if edges_cross_properly(A, B):
        return False
    # a hole of A strictly inside B would carve B's interior out of A
    for hole in A[1:]:
        h = _open(hole)
        if strictly_inside(h[:, 0], h[:, 1], B, eps).any():
            return False
    ip = interior_point(B)
    if ip is None:
        return False
    from gdal_spark.geometry.kernels import points_in_rings

    return bool(
        points_in_rings(np.array([ip[0]]), np.array([ip[1]]), A)[0]
        or on_boundary(np.array([ip[0]]), np.array([ip[1]]), A, eps)[0]
    )


def poly_overlaps(A, B) -> bool:
    """Interiors intersect but neither contains the other (OGC Overlaps,
    same-dimension operands)."""
    return (
        poly_interiors_intersect(A, B)
        and not poly_contains_full(A, B)
        and not poly_contains_full(B, A)
    )


def _norm_ring(ring: np.ndarray) -> tuple:
    """Orientation- and rotation-invariant canonical vertex tuple."""
    r = _ccw(ring)
    k = int(np.lexsort((r[:, 1], r[:, 0]))[0])
    r = np.roll(r, -k, axis=0)
    return tuple(map(tuple, r))


def poly_equals(A, B) -> bool:
    """Exact geometric equality modulo ring rotation/orientation."""
    if len(A) != len(B):
        return False
    sa = sorted(_norm_ring(r) for r in A)
    sb = sorted(_norm_ring(r) for r in B)
    return sa == sb


def line_crosses_polygon(line: np.ndarray, rings) -> bool:
    """OGC Crosses for line × polygon: the line has points in the
    polygon's interior AND points in its exterior."""
    pts = np.asarray(line, dtype=np.float64)
    eps = 1e-9 * max(1.0, float(np.abs(pts).max()))
    mids = (pts[:-1] + pts[1:]) / 2.0
    probe = np.vstack([pts, mids])
    inside = strictly_inside(probe[:, 0], probe[:, 1], rings, eps)
    from gdal_spark.geometry.kernels import points_in_rings

    outside = ~points_in_rings(probe[:, 0], probe[:, 1], rings) & ~on_boundary(
        probe[:, 0], probe[:, 1], rings, eps
    )
    return bool(inside.any() and outside.any())


def lines_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """OGC Crosses for line × line: a transversal interior crossing."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    for i in range(len(a) - 1):
        for j in range(len(b) - 1):
            if segments_cross_strict(a[i], a[i + 1], b[j], b[j + 1]):
                return True
    return False


# --- multi-part / line set-operation helpers ------------------------------


def subtract_many(subject: np.ndarray, clips: list[np.ndarray]) -> list[np.ndarray]:
    """subject − ∪clips as disjoint pieces; concave clips are decomposed
    into convex parts first (the layer-algebra Erase kernel, shared)."""
    pieces = [_ccw(subject)]
    for cl in clips:
        for part in _convex_parts(cl):
            nxt: list[np.ndarray] = []
            for p in pieces:
                nxt.extend(difference_convex(p, part))
            pieces = nxt
            if not pieces:
                return []
    return pieces


def clip_line_convex(line: np.ndarray, clip_ring: np.ndarray) -> list[np.ndarray]:
    """line ∩ convex polygon as a list of polylines (parametric
    Cyrus–Beck per segment; consecutive surviving pieces are stitched)."""
    line = np.asarray(line, dtype=np.float64)
    edges = convex_edges(clip_ring)
    out: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(line) - 1):
        p, q = line[i], line[i + 1]
        t0, t1 = 0.0, 1.0
        d = q - p
        ok = True
        for a, b in edges:
            nrm = np.array([-(b[1] - a[1]), b[0] - a[0]])  # inward normal
            denom = float(nrm @ d)
            num = float(nrm @ (a - p))
            if abs(denom) < 1e-300:
                # parallel: inside iff n·(p-a) >= 0 ⇔ num = n·(a-p) <= 0
                if num > 0:
                    ok = False
                    break
                continue
            t = num / denom
            if denom > 0:
                t0 = max(t0, t)
            else:
                t1 = min(t1, t)
            if t0 > t1:
                ok = False
                break
        if not ok:
            if len(cur) >= 2:
                out.append(cur)
            cur = []
            continue
        s, e = p + t0 * d, p + t1 * d
        if cur and np.allclose(cur[-1], s):
            cur.append(e)
        else:
            if len(cur) >= 2:
                out.append(cur)
            cur = [s, e]
        if t1 < 1.0:  # exits the polygon: close the piece
            if len(cur) >= 2:
                out.append(cur)
            cur = []
    if len(cur) >= 2:
        out.append(cur)
    return [np.array(p) for p in out]


# --- constructive: make_valid / delaunay / concave hull --------------------


def make_valid(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Light MakeValid (ogr/ogrgeometry.cpp MakeValid role for the
    common defects): drop consecutive duplicate vertices, drop rings
    with < 3 distinct vertices or ~zero area, orient exterior CCW and
    holes CW. Self-intersection repair is out of scope (documented)."""
    out: list[np.ndarray] = []
    for i, ring in enumerate(rings):
        r = _open(ring)
        if len(r) >= 2:
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = ~np.all(r[1:] == r[:-1], axis=1)
            r = r[keep]
            if len(r) >= 2 and np.array_equal(r[0], r[-1]):
                r = r[:-1]
        if len(r) < 3 or abs(ring_area(r)) <= _EPS_AREA:
            continue
        want_ccw = i == 0
        if ring_is_ccw(r) != want_ccw:
            r = r[::-1]
        out.append(r)
    return out


def _circumcircle_contains(a, b, c, p) -> bool:
    """p strictly inside the circumcircle of CCW triangle (a, b, c)."""
    ax, ay = a - p
    bx, by = b - p
    cx, cy = c - p
    det = (
        (ax * ax + ay * ay) * (bx * cy - by * cx)
        - (bx * bx + by * by) * (ax * cy - ay * cx)
        + (cx * cx + cy * cy) * (ax * by - ay * bx)
    )
    return det > 0


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson Delaunay triangulation → vertex-index triples into
    the deduplicated input (returned CCW). O(n²) — geometry-column point
    counts are small; the reference delegates to GEOS the same way
    (ogr/ogrgeometry.cpp DelaunayTriangulation)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 3:
        return []
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    span = max(float((hi - lo).max()), 1.0)
    mid = (lo + hi) / 2.0
    sup = np.array(
        [
            [mid[0] - 20 * span, mid[1] - 10 * span],
            [mid[0] + 20 * span, mid[1] - 10 * span],
            [mid[0], mid[1] + 20 * span],
        ]
    )
    allp = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]
    for pi in range(n):
        p = allp[pi]
        bad = []
        for t in tris:
            a, b, c = allp[t[0]], allp[t[1]], allp[t[2]]
            # ensure CCW for the incircle test
            if np.cross(b - a, c - a) < 0:
                a, c = c, a
            if _circumcircle_contains(a, b, c, p):
                bad.append(t)
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        tris = [t for t in tris if t not in bad]
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                tris.append((u, v, pi))
    out = []
    for t in tris:
        if s0 in t or s1 in t or s2 in t:
            continue
        a, b, c = allp[t[0]], allp[t[1]], allp[t[2]]
        if np.cross(b - a, c - a) < 0:
            t = (t[0], t[2], t[1])
        out.append(t)
    return out


def delaunay_coords(points: np.ndarray) -> list[np.ndarray]:
    """Delaunay triangles as CCW coordinate rings."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    return [pts[list(t)] for t in delaunay(pts)]


def concave_hull(points: np.ndarray, alpha: float) -> np.ndarray:
    """Alpha-shape concave hull: keep Delaunay triangles with
    circumradius ≤ alpha, take the once-used boundary edges, walk them
    into a ring (ogr ConcaveHull role; alpha plays the ratio knob)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    keep = []
    for t in delaunay(pts):
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        la, lb, lc = (
            np.hypot(*(b - c)),
            np.hypot(*(a - c)),
            np.hypot(*(a - b)),
        )
        area = abs(float(np.cross(b - a, c - a))) / 2.0
        if area <= 0:
            continue
        circ_r = la * lb * lc / (4.0 * area)
        if circ_r <= alpha:
            keep.append(t)
    if not keep:
        return convex_hull(pts)
    edge_count: dict[tuple[int, int], int] = {}
    for t in keep:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            edge_count[k] = edge_count.get(k, 0) + 1
    boundary = [e for e, c in edge_count.items() if c == 1]
    if not boundary:
        return convex_hull(pts)
    adj: dict[int, list[int]] = {}
    for u, v in boundary:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    start = boundary[0][0]
    ring = [start]
    prev = None
    cur = start
    while True:
        nxts = [v for v in adj[cur] if v != prev]
        if not nxts:
            break
        prev, cur = cur, nxts[0]
        if cur == start:
            break
        ring.append(cur)
    return _ccw(pts[ring])


def _seg_clip_t(p: np.ndarray, q: np.ndarray, clip_ring: np.ndarray):
    """Cyrus–Beck parameter interval [t0, t1] of segment p→q inside the
    convex ring, or None."""
    t0, t1 = 0.0, 1.0
    d = q - p
    for a, b in convex_edges(clip_ring):
        nrm = np.array([-(b[1] - a[1]), b[0] - a[0]])
        denom = float(nrm @ d)
        num = float(nrm @ (a - p))
        if abs(denom) < 1e-300:
            if num > 0:
                return None
            continue
        t = num / denom
        if denom > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return None
    return (t0, t1)


def _merge_intervals(iv: list[tuple[float, float]]) -> list[tuple[float, float]]:
    if not iv:
        return []
    iv = sorted(iv)
    out = [list(iv[0])]
    for a, b in iv[1:]:
        if a <= out[-1][1] + 1e-12:
            out[-1][1] = max(out[-1][1], b)
        else:
            out.append([a, b])
    return [(a, b) for a, b in out]


def _subtract_intervals(keep, cut):
    """keep − cut, both merged interval lists."""
    out = []
    for a, b in keep:
        cur = a
        for ca, cb in cut:
            if cb <= cur or ca >= b:
                continue
            if ca > cur:
                out.append((cur, min(ca, b)))
            cur = max(cur, cb)
            if cur >= b:
                break
        if cur < b:
            out.append((cur, b))
    return [(a, b) for a, b in out if b - a > 1e-12]


def clip_line_polygon_holes(
    line: np.ndarray, ext: np.ndarray, holes: list[np.ndarray]
) -> list[np.ndarray]:
    """line ∩ (polygon with holes) as polylines: per segment, the
    parameter intervals inside the exterior (union over its convex
    parts) minus the intervals inside any hole — pure interval
    arithmetic, then consecutive pieces stitch back into chains."""
    line = np.asarray(line, dtype=np.float64)
    ext_parts = _convex_parts(ext)
    hole_parts = [p for h in holes for p in _convex_parts(h)]
    out: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(line) - 1):
        p, q = line[i], line[i + 1]
        inside = _merge_intervals(
            [iv for part in ext_parts if (iv := _seg_clip_t(p, q, part))]
        )
        cut = _merge_intervals(
            [iv for part in hole_parts if (iv := _seg_clip_t(p, q, part))]
        )
        keep = _subtract_intervals(inside, cut)
        d = q - p
        for t0, t1 in keep:
            s, e = p + t0 * d, p + t1 * d
            if cur and np.allclose(cur[-1], s):
                cur.append(e)
            else:
                if len(cur) >= 2:
                    out.append(cur)
                cur = [s, e]
            if t1 < 1.0:
                if len(cur) >= 2:
                    out.append(cur)
                cur = []
    if len(cur) >= 2:
        out.append(cur)
    return [np.array(p) for p in out]


# --- styled buffers (apps/gdalalg_vector_buffer.cpp:32-56: endcap
# round/flat/square, join round/mitre/bevel + mitre-limit,
# quadrant-segments, side) ---------------------------------------------------


def _join_pts(p, n0, n1, dist, join, mitre_limit, quadrant_segments):
    """Vertex-join vertices between offset points p+d·n0 and p+d·n1
    (unit normals, convex sweep n0→n1). Returns the INTERIOR points only
    (the two offset endpoints are emitted by the caller)."""
    a0 = np.arctan2(n0[1], n0[0])
    a1 = np.arctan2(n1[1], n1[0])
    sweep = a1 - a0
    while sweep <= -np.pi:
        sweep += 2 * np.pi
    while sweep > np.pi:
        sweep -= 2 * np.pi
    if join == "bevel" or abs(sweep) < 1e-12:
        return []
    if join == "mitre":
        bis = n0 + n1
        nb = np.hypot(*bis)
        if nb < 1e-12:
            return []
        ratio = 2.0 / nb  # 1/cos(θ/2)
        if ratio > mitre_limit:
            return []  # GEOS clips the spike; bevel is the simple fallback
        return [p + dist * bis / nb * ratio]
    # round
    steps = max(1, int(np.ceil(abs(sweep) / (np.pi / 2 / quadrant_segments))))
    angs = a0 + sweep * np.arange(1, steps) / steps
    return [p + dist * np.array([np.cos(a), np.sin(a)]) for a in angs]


def _line_one_side(pts, dist, join, mitre_limit, quadrant_segments):
    """Left-offset polyline of pts at distance dist (>0), joins applied
    at corners convex on the left; concave corners use the offset-line
    intersection (simple, non-noded — adequate for non-self-intersecting
    inputs at moderate distances)."""
    segs = pts[1:] - pts[:-1]
    lens = np.hypot(segs[:, 0], segs[:, 1])
    nrm = np.column_stack([-segs[:, 1], segs[:, 0]]) / lens[:, None]
    out = [pts[0] + nrm[0] * dist]
    for i in range(len(segs)):
        out.append(pts[i + 1] + nrm[i] * dist)
        if i + 1 < len(segs):
            turn = float(np.cross(segs[i], segs[i + 1]))
            if turn < 0:  # right turn → left side is convex
                out.extend(
                    _join_pts(
                        pts[i + 1], nrm[i], nrm[i + 1], dist,
                        join, mitre_limit, quadrant_segments,
                    )
                )
                out.append(pts[i + 1] + nrm[i + 1] * dist)
            elif turn > 0:  # concave on the left: offset-line intersection
                d = np.cross(segs[i], segs[i + 1])
                a = pts[i] + nrm[i] * dist
                b = pts[i + 1] + nrm[i + 1] * dist
                t = np.cross(b - a, segs[i + 1]) / d
                out[-1] = a + segs[i] * t
            else:
                out.append(pts[i + 1] + nrm[i + 1] * dist)
    return out


def _cap_pts(p, n_in, dist, endcap, quadrant_segments, ahead):
    """End-cap vertices from p+d·n_in to p−d·n_in sweeping through the
    direction `ahead` (unit). flat → none, square → two extended points,
    round → semicircle."""
    if endcap == "flat":
        return []
    if endcap == "square":
        return [p + dist * n_in + dist * ahead, p - dist * n_in + dist * ahead]
    a0 = np.arctan2(n_in[1], n_in[0])
    am = np.arctan2(ahead[1], ahead[0])
    sweep = am - a0
    while sweep <= -np.pi:
        sweep += 2 * np.pi
    while sweep > np.pi:
        sweep -= 2 * np.pi
    steps = max(1, int(np.ceil(abs(np.pi) / (np.pi / 2 / quadrant_segments))))
    angs = a0 + (2 * sweep) * np.arange(1, steps) / steps
    return [p + dist * np.array([np.cos(a), np.sin(a)]) for a in angs]


def buffer_line(
    coords: np.ndarray,
    dist: float,
    quadrant_segments: int = 8,
    endcap: str = "round",
    join: str = "round",
    mitre_limit: float = 5.0,
    side: str = "both",
) -> np.ndarray:
    """LineString buffer outline with GEOS-parameter semantics
    (apps/gdalalg_vector_buffer.cpp:32-56). side='left'/'right' builds
    the single-sided buffer (flat-ended, bounded by the input line).
    Returns a CCW ring."""
    pts = np.asarray(coords, dtype=np.float64)
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = np.hypot(*(pts[1:] - pts[:-1]).T) > 1e-12
    pts = pts[keep]
    if len(pts) < 2:
        raise ValueError("buffer_line needs >= 2 distinct points")
    if side == "right":
        # right offset traversed end→start, closed along the input line
        left = _line_one_side(pts[::-1], dist, join, mitre_limit,
                              quadrant_segments)
        ring = np.array(left + list(pts), dtype=np.float64)
        return _ccw(ring)
    if side == "left":
        left = _line_one_side(pts, dist, join, mitre_limit,
                              quadrant_segments)
        ring = np.array(left + list(pts[::-1]), dtype=np.float64)
        return _ccw(ring)
    lf = _line_one_side(pts, dist, join, mitre_limit, quadrant_segments)
    rb = _line_one_side(pts[::-1], dist, join, mitre_limit,
                        quadrant_segments)
    e_last = pts[-1] - pts[-2]
    e_last = e_last / np.hypot(*e_last)
    n_last = np.array([-e_last[1], e_last[0]])
    e_first = pts[1] - pts[0]
    e_first = e_first / np.hypot(*e_first)
    n_first = np.array([-e_first[1], e_first[0]])
    cap_end = _cap_pts(pts[-1], n_last, dist, endcap, quadrant_segments,
                       e_last)
    cap_start = _cap_pts(pts[0], -n_first, dist, endcap, quadrant_segments,
                         -e_first)
    ring = np.array(lf + cap_end + rb + cap_start, dtype=np.float64)
    return _ccw(ring)


def buffer_polygon_styled(
    ring: np.ndarray,
    dist: float,
    quadrant_segments: int = 8,
    join: str = "round",
    mitre_limit: float = 5.0,
) -> np.ndarray:
    """buffer_polygon with join-style control at convex corners
    (round = existing arcs, mitre = spike to the offset-line
    intersection bounded by mitre_limit, bevel = straight connect)."""
    if join == "round" or dist <= 0:
        return buffer_polygon(ring, dist, quadrant_segments)
    r = _ccw(ring)
    n = len(r)
    pts: list[np.ndarray] = []
    for i in range(n):
        p_prev, p, p_next = r[i - 1], r[i], r[(i + 1) % n]
        e0, e1 = p - p_prev, p_next - p
        n0 = np.array([e0[1], -e0[0]]) / np.hypot(*e0)
        n1 = np.array([e1[1], -e1[0]]) / np.hypot(*e1)
        pts.append(p + dist * n0)
        pts.extend(
            _join_pts(p, n0, n1, dist, join, mitre_limit, quadrant_segments)
        )
        pts.append(p + dist * n1)
    return np.array(pts, dtype=np.float64)


def _open_ring_simple(r: np.ndarray) -> bool:
    """Open ring r (no closing vertex): no strict non-adjacent segment
    crossings (including the closure edge)."""
    n = len(r)
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # closure adjacency
            if segments_cross_strict(
                r[i], r[(i + 1) % n], r[j], r[(j + 1) % n]
            ):
                return True
    return False


def simplify_preserve_topology(
    ring: np.ndarray, tol: float, closed: bool = True
) -> np.ndarray:
    """Topology-preserving simplification (OGRGeometry::
    SimplifyPreserveTopology surface, ogr/ogr_geometry.h ~ GEOS
    TopologyPreservingSimplifier semantics at the single-ring level):
    Douglas-Peucker, then while the simplified ring self-intersects,
    re-add the farthest dropped original vertex inside one of the
    offending chords. Guarantees a simple output ring with >= 3 distinct
    vertices; plain simplify_dp can return a bowtie that the layer-
    algebra kernels reject."""
    pts = np.asarray(ring, dtype=np.float64)
    was_closed = len(pts) >= 2 and np.array_equal(pts[0], pts[-1])
    work = pts[:-1] if was_closed else pts
    n = len(work)
    if not closed or n <= 4:
        return simplify_dp(ring, tol, closed=closed)

    simp = simplify_dp(work, tol, closed=True)  # open result

    def indices_of(sub):
        idx, k = [], 0
        for p in sub:
            while not np.array_equal(work[k], p):
                k += 1
            idx.append(k)
            k += 1
        return idx

    for _ in range(n):  # each round re-adds one vertex → terminates
        if len(simp) >= 3 and not _open_ring_simple(simp):
            break
        idx = indices_of(simp)
        # farthest dropped vertex from its covering chord, globally
        best, bd = None, -1.0
        m = len(idx)
        for s in range(m):
            i0, i1 = idx[s], idx[(s + 1) % m]
            gap = (
                range(i0 + 1, i1) if i1 > i0 else
                list(range(i0 + 1, n)) + list(range(0, i1))
            )
            a, b = work[i0], work[i1]
            seg = b - a
            ln = np.hypot(*seg)
            for g in gap:
                d = (
                    np.hypot(*(work[g] - a)) if ln == 0
                    else abs(float(np.cross(seg, work[g] - a))) / ln
                )
                if d > bd:
                    bd, best = d, g
        if best is None:
            break
        keep = sorted(set(indices_of(simp)) | {best})
        simp = work[keep]
    if was_closed:
        simp = np.vstack([simp, simp[:1]])
    return simp
