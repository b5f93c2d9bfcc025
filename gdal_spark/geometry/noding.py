"""Linework noding, polygonization, area building, and constrained
Delaunay triangulation — numpy-only kernels behind the ST registry
entries st_polygonize / st_buildarea / st_constraineddelaunaytriangles
(reference: ogr/ogr_geometry.h:588-591 Polygonize/BuildArea/
ConstrainedDelaunayTriangulation, delegating to GEOS on the reference
side; re-implemented here from the published algorithms).

Pipeline: node (split every segment at every intersection, snap to a
1e-9 grid) → planar half-edge graph → face tracing (clockwise-next
rule; bounded faces come out CCW) → polygons, optionally nested into
shells + holes by containment depth (BuildArea). CDT = hole bridging +
ear clipping + Lawson edge flips restricted to non-constraint edges.

All kernels are per-geometry (row-local): they run inside Arrow-batched
pandas UDFs, so their O(n²) noding is bounded by single-geometry vertex
counts, never by table size.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.clip import _ccw, interior_point, triangulate
from gdal_spark.geometry.kernels import points_in_rings, ring_area

_SNAP = 1e-9


def _key(p) -> tuple[float, float]:
    """Snap a coordinate to the noding grid (vertex identity)."""
    return (round(float(p[0]), 9), round(float(p[1]), 9))


def _seg_cuts(p, q, r, u, eps=1e-12):
    """Parameters (t on pq, s on ru) of the intersection(s) of segments
    pq and ru, including endpoint touches and collinear overlaps.
    Returns (list_t, list_s)."""
    d1 = q - p
    d2 = u - r
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    w = r - p
    if abs(denom) > eps:
        t = (w[0] * d2[1] - w[1] * d2[0]) / denom
        s = (w[0] * d1[1] - w[1] * d1[0]) / denom
        if -eps <= t <= 1 + eps and -eps <= s <= 1 + eps:
            return [min(max(t, 0.0), 1.0)], [min(max(s, 0.0), 1.0)]
        return [], []
    # parallel: collinear overlap check
    if abs(w[0] * d1[1] - w[1] * d1[0]) > eps * max(1.0, np.abs(d1).max()):
        return [], []
    L2 = float(d1 @ d1)
    if L2 <= eps:
        return [], []
    ts, ss = [], []
    for pt, arr in ((r, ts), (u, ts)):
        t = float((pt - p) @ d1) / L2
        if -eps <= t <= 1 + eps:
            arr.append(min(max(t, 0.0), 1.0))
    M2 = float(d2 @ d2)
    if M2 > eps:
        for pt in (p, q):
            s = float((pt - r) @ d2) / M2
            if -eps <= s <= 1 + eps:
                ss.append(min(max(s, 0.0), 1.0))
    return ts, ss


def node_lines(lines: list[np.ndarray]) -> list[tuple[tuple, tuple]]:
    """Split every input segment at every pairwise intersection and snap
    endpoints to the grid; returns deduped undirected segments as
    coordinate-tuple pairs. This is the noding step GEOS runs before
    polygonizing (IteratedNoder role)."""
    segs = []
    for ln in lines:
        a = np.asarray(ln, dtype=np.float64)
        for i in range(len(a) - 1):
            if not np.allclose(a[i], a[i + 1]):
                segs.append((a[i].copy(), a[i + 1].copy()))
    cuts: list[set[float]] = [set((0.0, 1.0)) for _ in segs]
    for i in range(len(segs)):
        p, q = segs[i]
        for j in range(i + 1, len(segs)):
            r, u = segs[j]
            ts, ss = _seg_cuts(p, q, r, u)
            cuts[i].update(ts)
            cuts[j].update(ss)
    out = set()
    for (p, q), tv in zip(segs, cuts):
        d = q - p
        pts = [_key(p + t * d) for t in sorted(tv)]
        for a, b in zip(pts, pts[1:]):
            if a != b:
                out.add((a, b) if a < b else (b, a))
    return sorted(out)


def _half_edge_faces(segs: list[tuple[tuple, tuple]]) -> list[np.ndarray]:
    """Trace the faces of the noded planar graph. Dangling edges
    (degree-1 chains) are pruned first, mirroring GEOS Polygonizer's
    deleteDangles. Returns the closed CCW rings of all BOUNDED faces."""
    adj: dict[tuple, set[tuple]] = {}
    for a, b in segs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # prune dangles
    stack = [v for v, nb in adj.items() if len(nb) <= 1]
    while stack:
        v = stack.pop()
        if v not in adj or len(adj[v]) > 1:
            continue
        for w in list(adj[v]):
            adj[w].discard(v)
            if len(adj[w]) <= 1:
                stack.append(w)
        del adj[v]
    # neighbors sorted by angle (CCW)
    order: dict[tuple, list[tuple]] = {}
    for v, nb in adj.items():
        order[v] = sorted(
            nb, key=lambda w: np.arctan2(w[1] - v[1], w[0] - v[0])
        )
    visited: set[tuple[tuple, tuple]] = set()
    rings: list[np.ndarray] = []
    for v0 in order:
        for w0 in order[v0]:
            if (v0, w0) in visited:
                continue
            ring = [v0]
            u, v = v0, w0
            while True:
                visited.add((u, v))
                ring.append(v)
                nb = order[v]
                # clockwise-next rule: the edge after (v -> u) in CW
                # order, i.e. the PREDECESSOR of u in v's CCW ordering
                k = nb.index(u)
                w = nb[k - 1] if k > 0 else nb[-1]
                u, v = v, w
                if (u, v) == (v0, w0):
                    break
            r = np.array(ring[:-1], dtype=np.float64)
            if len(r) >= 3 and ring_area(r) > 1e-15:
                rings.append(np.vstack([r, r[:1]]))
    return rings


def polygonize_lines(lines: list[np.ndarray]) -> list[np.ndarray]:
    """GEOSPolygonize role: every bounded face of the noded linework as
    an independent CCW polygon ring (nested faces stay filled polygons —
    hole assignment is BuildArea's job)."""
    return _half_edge_faces(node_lines(lines))


def build_area(lines: list[np.ndarray]) -> list[list[np.ndarray]]:
    """GEOSBuildArea role: polygonize, then nest faces by containment
    depth — even depth = shell, odd depth = hole of its direct parent.
    Returns polygons as [shell, hole, ...] ring lists."""
    faces = polygonize_lines(lines)
    if not faces:
        return []
    reps = []
    for f in faces:
        ip = interior_point([f])
        reps.append(
            ip if ip is not None else f[:-1].mean(axis=0)
        )
    n = len(faces)
    areas = [ring_area(f) for f in faces]
    contains = np.zeros((n, n), dtype=bool)
    for i, f in enumerate(faces):
        for j in range(n):
            # faces never partially overlap (they are faces of one
            # planar subdivision), so ring-containment = strictly
            # larger area + representative point inside
            if i == j or areas[i] <= areas[j]:
                continue
            contains[i, j] = bool(
                points_in_rings(
                    np.array([reps[j][0]]), np.array([reps[j][1]]), [f]
                )[0]
            )
    depth = contains.sum(axis=0)
    polys: list[list[np.ndarray]] = []
    slot: dict[int, int] = {}
    for i in np.argsort(depth, kind="stable"):
        if depth[i] % 2 == 0:
            slot[i] = len(polys)
            polys.append([faces[i]])
        else:
            # direct parent: the deepest face containing i
            parents = [j for j in range(n) if contains[j, i]]
            parent = max(parents, key=lambda j: depth[j])
            # hole rings stored CW (OGC orientation)
            polys[slot[parent]].append(faces[i][::-1].copy())
    return polys


def _bridge_holes(shell: np.ndarray, holes: list[np.ndarray]) -> np.ndarray:
    """Connect holes to the shell with zero-width bridges (Held's
    two-duplicate-vertex construction) so one ear-clippable ring
    remains. Visibility is checked against every edge; O(n²) per
    geometry."""
    from gdal_spark.geometry.clip import segments_cross_strict

    ring = [tuple(p) for p in _open_ccw(shell)]
    hs = [[tuple(p) for p in _open_ccw(h)[::-1]] for h in holes]  # CW holes
    # process holes by max-x first (standard ordering: rightmost first)
    hs.sort(key=lambda h: -max(p[0] for p in h))
    for h in hs:
        mi = max(range(len(h)), key=lambda k: h[k])
        m = np.array(h[mi])
        all_edges = []
        for arr in (ring, h):
            for k in range(len(arr)):
                all_edges.append(
                    (np.array(arr[k]), np.array(arr[(k + 1) % len(arr)]))
                )
        best, bestd = None, np.inf
        for k, p in enumerate(ring):
            pv = np.array(p)
            d = float((pv - m) @ (pv - m))
            if d >= bestd:
                continue
            seg_ok = True
            for a, b in all_edges:
                if (np.allclose(a, pv) or np.allclose(b, pv)
                        or np.allclose(a, m) or np.allclose(b, m)):
                    continue
                if segments_cross_strict(m, pv, a, b):
                    seg_ok = False
                    break
            if seg_ok:
                best, bestd = k, d
        if best is None:  # fallback: nearest vertex regardless
            best = min(
                range(len(ring)),
                key=lambda k: (np.array(ring[k]) - m) @ (np.array(ring[k]) - m),
            )
        rotated = h[mi:] + h[:mi]
        ring = (
            ring[: best + 1] + rotated + [rotated[0], ring[best]]
            + ring[best + 1 :]
        )
    return np.array(ring, dtype=np.float64)


def _open_ccw(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if np.allclose(r[0], r[-1]):
        r = r[:-1]
    if ring_area(np.vstack([r, r[:1]])) < 0:
        r = r[::-1]
    return r


def _in_circumcircle(a, b, c, d) -> bool:
    """d strictly inside the circumcircle of CCW triangle (a,b,c)."""
    m = np.array(
        [
            [a[0] - d[0], a[1] - d[1], (a[0] - d[0]) ** 2 + (a[1] - d[1]) ** 2],
            [b[0] - d[0], b[1] - d[1], (b[0] - d[0]) ** 2 + (b[1] - d[1]) ** 2],
            [c[0] - d[0], c[1] - d[1], (c[0] - d[0]) ** 2 + (c[1] - d[1]) ** 2],
        ]
    )
    return float(np.linalg.det(m)) > 1e-12


def cdt_polygon(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Constrained Delaunay triangulation of a polygon (shell + holes):
    bridge holes into the shell, ear-clip, then Lawson-flip every
    interior non-constraint edge until locally Delaunay. The constraint
    edges (original polygon boundary) are never flipped — the defining
    property of a CDT. Returns CCW triangles partitioning the polygon."""
    shell = rings[0]
    holes = rings[1:]
    constraints = set()
    for rg in rings:
        r = _open_ccw(rg)
        for k in range(len(r)):
            a, b = _key(r[k]), _key(r[(k + 1) % len(r)])
            constraints.add((a, b) if a < b else (b, a))
    poly = _bridge_holes(shell, holes) if holes else _open_ccw(shell)
    tris = [t for t in triangulate(np.vstack([poly, poly[:1]]))
            if abs(ring_area(t)) > 1e-14]
    tris = [_ccw(t) for t in tris]
    # Lawson flips
    for _ in range(4 * max(1, len(tris))):
        edge_map: dict[tuple, list[int]] = {}
        for ti, t in enumerate(tris):
            for k in range(3):
                a, b = _key(t[k]), _key(t[(k + 1) % 3])
                e = (a, b) if a < b else (b, a)
                edge_map.setdefault(e, []).append(ti)
        flipped = False
        for e, owners in edge_map.items():
            if len(owners) != 2 or e in constraints:
                continue
            t1, t2 = tris[owners[0]], tris[owners[1]]
            ek = set(e)
            c = next(p for p in t1 if _key(p) not in ek)
            d = next(p for p in t2 if _key(p) not in ek)
            a = np.array(e[0])
            b = np.array(e[1])
            if not _in_circumcircle(*_ccw(np.array([a, b, c])), d):
                continue
            # flip only if the quad is convex (both new triangles CCW+)
            n1 = np.array([c, d, a])
            n2 = np.array([d, c, b])
            if ring_area(_ccw(n1)) <= 1e-14 or ring_area(_ccw(n2)) <= 1e-14:
                continue
            s1 = np.cross(d - c, a - c)
            s2 = np.cross(d - c, b - c)
            if s1 * s2 >= 0:  # a, b must straddle the new edge cd
                continue
            tris[owners[0]] = _ccw(n1)
            tris[owners[1]] = _ccw(n2)
            flipped = True
            break
        if not flipped:
            break
    return tris
