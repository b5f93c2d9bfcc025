"""Packed Hilbert R-tree — broadcast envelope index for the filter stage.

From-scratch numpy re-expression of the FlatGeobuf packed R-tree the
reference uses for spatial-filter pushdown
(ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-152: Hilbert-sorted leaf
items, node size 16, bottom-up level packing, bbox streamSearch).

Usage at scale: the driver builds the tree over the (small) polygon
layer's envelopes, Spark broadcasts it, and every executor probes it
inside a vectorized Arrow UDF. Queries are batch-vectorized: a frontier
of (query, node) pairs is expanded level by level with pure numpy —
zero per-row Python.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.cellindex.hilbert import hilbert_code

NODE_SIZE = 16  # parity: flatgeobuf packedrtree.h:140 default


def str_leaf_order(
    cx: np.ndarray, cy: np.ndarray, node_size: int = 10
) -> np.ndarray:
    """Leaf order of a Sort-Tile-Recursive packed tree (Leutenegger et
    al. 1997) — the packing GEOS STRtree uses, which `gdal vector sort
    --method strtree` iterates (apps/gdalalg_vector_sort.cpp:419
    GEOSSTRtree_create(10), :517 GEOSSTRtree_iterate). One x-sort into
    ceil(sqrt(P)) vertical slices of S*cap consecutive items, then a
    y-sort within each slice. Ties break on the original index (stable
    sorts), so callers pass items in a deterministic order. Returns the
    permutation mapping leaf slot -> item index."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    n = len(cx)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    pages = -(-n // node_size)
    s = int(np.ceil(np.sqrt(float(pages))))
    slice_sz = s * node_size
    by_x = np.argsort(cx, kind="stable")
    out = np.empty(n, dtype=np.int64)
    for i in range(0, n, slice_sz):
        sl = by_x[i:i + slice_sz]
        out[i:i + len(sl)] = sl[np.argsort(cy[sl], kind="stable")]
    return out


class PackedRTree:
    def __init__(
        self, boxes: np.ndarray, node_size: int = NODE_SIZE,
        method: str = "hilbert",
    ):
        """boxes: (N,4) [minx,miny,maxx,maxy]. Item order is
        Hilbert-sorted (flatgeobuf parity, default) or Sort-Tile-
        Recursive (method='str', GEOS STRtree parity); self.order maps
        tree leaf slot → original item index. Query semantics are
        identical either way — packing only affects leaf locality."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(boxes)
        self.node_size = node_size
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        if method == "str":
            self.order = str_leaf_order(cx, cy, node_size)
        else:
            ext = (
                float(boxes[:, 0].min()),
                float(boxes[:, 1].min()),
                float(boxes[:, 2].max()),
                float(boxes[:, 3].max()),
            )
            h = hilbert_code(cx, cy, ext[0], ext[1], ext[2], ext[3])
            self.order = np.argsort(h, kind="stable").astype(np.int64)
        # level 0 = sorted leaf boxes; parents = groupwise min/max of 16
        lvl = boxes[self.order]
        self.levels = [lvl]
        while len(lvl) > 1:
            m = len(lvl)
            pad = (-m) % node_size
            if pad:
                filler = np.empty((pad, 4))
                filler[:, :2] = np.inf
                filler[:, 2:] = -np.inf
                lvl = np.vstack([lvl, filler])
            g = lvl.reshape(-1, node_size, 4)
            lvl = np.column_stack(
                [
                    g[:, :, 0].min(axis=1),
                    g[:, :, 1].min(axis=1),
                    g[:, :, 2].max(axis=1),
                    g[:, :, 3].max(axis=1),
                ]
            )
            self.levels.append(lvl)

    def query_points(self, px, py) -> tuple[np.ndarray, np.ndarray]:
        """(query_idx, item_idx) candidate pairs where point ∈ item bbox."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        return self.query_boxes(px, py, px, py)

    def query_boxes(self, qminx, qminy, qmaxx, qmaxy):
        """(query_idx, item_idx) pairs with bbox overlap — streamSearch
        analog (packedrtree.h:150), but batched over all queries."""
        qminx = np.asarray(qminx, dtype=np.float64)
        nq = qminx.shape[0]
        if nq == 0 or not self.levels:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        qminy = np.asarray(qminy, dtype=np.float64)
        qmaxx = np.asarray(qmaxx, dtype=np.float64)
        qmaxy = np.asarray(qmaxy, dtype=np.float64)
        # frontier at top level: every (query, root-node) pair
        top = len(self.levels) - 1
        q = np.repeat(np.arange(nq, dtype=np.int64), len(self.levels[top]))
        nodes = np.tile(np.arange(len(self.levels[top]), dtype=np.int64), nq)
        for lev in range(top, -1, -1):
            b = self.levels[lev]
            keep = (
                (qminx[q] <= b[nodes, 2])
                & (qmaxx[q] >= b[nodes, 0])
                & (qminy[q] <= b[nodes, 3])
                & (qmaxy[q] >= b[nodes, 1])
            )
            q = q[keep]
            nodes = nodes[keep]
            if lev == 0:
                break
            # expand each surviving node into its node_size children
            child0 = nodes * self.node_size
            nchild = len(self.levels[lev - 1])
            offs = np.arange(self.node_size, dtype=np.int64)
            cand = (child0[:, None] + offs[None, :]).ravel()
            q = np.repeat(q, self.node_size)
            ok = cand < nchild
            q, nodes = q[ok], cand[ok]
        return q, self.order[nodes]


class GridIndex:
    """Uniform-grid bucket index over envelopes — the CPLQuadTree
    replacement tuned for BATCHED point probes. Build: each box
    registered in every grid cell it overlaps. Probe: points grouped by
    their cell key (one np.unique), then a dense vectorized bbox compare
    per occupied cell — ~20x faster than the level-wise R-tree walk for
    web-scale point batches, at the cost of the uniform-cell assumption
    (fine for city-clustered layers; the R-tree remains the fallback for
    wildly varying box sizes)."""

    MIX = 1_000_003  # cell key mixing prime

    def __init__(self, boxes: np.ndarray, cell: float | None = None):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.boxes = boxes
        if len(boxes) == 0:
            self.cell = 1.0
            self.keymap: dict[int, np.ndarray] = {}
            return
        if cell is None:
            w = np.median(boxes[:, 2] - boxes[:, 0])
            h = np.median(boxes[:, 3] - boxes[:, 1])
            cell = float(max(w, h, 1e-9))
        self.cell = cell
        kx0 = np.floor(boxes[:, 0] / cell).astype(np.int64)
        kx1 = np.floor(boxes[:, 2] / cell).astype(np.int64)
        ky0 = np.floor(boxes[:, 1] / cell).astype(np.int64)
        ky1 = np.floor(boxes[:, 3] / cell).astype(np.int64)
        buckets: dict[int, list[int]] = {}
        for i in range(len(boxes)):
            for cx in range(kx0[i], kx1[i] + 1):
                for cy in range(ky0[i], ky1[i] + 1):
                    buckets.setdefault(cx * self.MIX + cy, []).append(i)
        self.keymap = {
            k: np.array(v, dtype=np.int64) for k, v in buckets.items()
        }

    def query_points(self, px, py) -> tuple[np.ndarray, np.ndarray]:
        """(query_idx, item_idx) pairs where the point lies in the item
        bbox — same contract as PackedRTree.query_points."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if len(px) == 0 or not self.keymap:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        key = (
            np.floor(px / self.cell).astype(np.int64) * self.MIX
            + np.floor(py / self.cell).astype(np.int64)
        )
        order = np.argsort(key, kind="stable")
        ks = key[order]
        uniq, start = np.unique(ks, return_index=True)
        end = np.append(start[1:], len(ks))
        qs: list[np.ndarray] = []
        items: list[np.ndarray] = []
        B = self.boxes
        for u, s, e in zip(uniq, start, end):
            cand = self.keymap.get(int(u))
            if cand is None:
                continue
            pts = order[s:e]
            X = px[pts]
            Y = py[pts]
            bb = B[cand]
            m = (
                (X[:, None] >= bb[None, :, 0])
                & (X[:, None] <= bb[None, :, 2])
                & (Y[:, None] >= bb[None, :, 1])
                & (Y[:, None] <= bb[None, :, 3])
            )
            qq, ii = np.nonzero(m)
            if qq.size:
                qs.append(pts[qq])
                items.append(cand[ii])
        if not qs:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(qs), np.concatenate(items)
