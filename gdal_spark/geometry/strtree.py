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


class PackedRTree:
    def __init__(self, boxes: np.ndarray, node_size: int = NODE_SIZE):
        """boxes: (N,4) [minx,miny,maxx,maxy]. Item order is Hilbert-sorted;
        self.order maps tree leaf slot → original item index."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(boxes)
        self.node_size = node_size
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
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
