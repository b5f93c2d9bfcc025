"""Polygonize / sieve — connected same-value pixel regions, distributed.

The reference's polygonize (alg/polygonize.cpp: two-pass enumerator +
ring tracing) and sieve filter (alg/gdalsievefilter.cpp: merge regions
≤ threshold) are single-image algorithms. Distributed re-expression
(the "iterative block join" of SURVEY §2.5/§2.10):

1. PER-BLOCK CCL — numpy 4-connectivity min-label relaxation inside each
   block; provisional label = region's minimum global pixel index
   (deterministic, merge-friendly).
2. BORDER ADJACENCY — blocks emit border strips; same-value pixels
   facing each other across a block seam become (label_a, label_b)
   union edges. One equi-join on the seam key — no pixel re-read.
3. GLOBAL MERGE — distributed connected components over the edge list:
   alternating neighbor-min exchange + pointer jumping until fixpoint
   (the standard large/small-star style loop; also serves as the
   engine's generic CC — SURVEY §1.3 GNM ConnectedComponents note).
4. OUTPUT — (region_id, value, n_pixels, bbox) region table; sieve
   flags regions ≤ threshold (relabel-back is a join on the label
   raster, elided at fixture scale). Ring tracing to ISO-WKB polygons
   is the recorded v2 finalize step.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import model

REGION_SCHEMA = (
    "label long, value double, n_pixels long, "
    "minx long, miny long, maxx long, maxy long"
)
STRIP_SCHEMA = "side string, k long, pos long, label long, value double"


def _label_block(a: np.ndarray, x0: int, y0: int, width_full: int) -> np.ndarray:
    """4-connected CCL: label = min global pixel index of the region
    (iterative min relaxation; converges in O(region diameter) sweeps —
    block-local, so bounded by the block size)."""
    h, w = a.shape
    ys, xs = np.mgrid[0:h, 0:w]
    lab = ((ys + y0) * width_full + (xs + x0)).astype(np.int64)
    mh = a[:, 1:] == a[:, :-1]
    mv = a[1:, :] == a[:-1, :]
    while True:
        new = lab.copy()
        np.minimum(new[:, 1:], np.where(mh, lab[:, :-1], new[:, 1:]), out=new[:, 1:])
        np.minimum(new[:, :-1], np.where(mh, lab[:, 1:], new[:, :-1]), out=new[:, :-1])
        np.minimum(new[1:, :], np.where(mv, lab[:-1, :], new[1:, :]), out=new[1:, :])
        np.minimum(new[:-1, :], np.where(mv, lab[1:, :], new[:-1, :]), out=new[:-1, :])
        # propagate along rows/cols within the same sweep (running min
        # over equal-value runs) to cut iteration count
        if np.array_equal(new, lab):
            return lab
        lab = new


def block_regions(
    blocks: DataFrame, width_full: int, band: int = 1
) -> tuple[DataFrame, DataFrame]:
    """(regions, strips): per-block provisional regions and border strips."""

    def regs_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            regs = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                    np.float64
                )
                lab = _label_block(a, r.x0, r.y0, width_full)
                flat_l = lab.ravel()
                flat_v = a.ravel()
                ys, xs = np.mgrid[0 : r.height, 0 : r.width]
                gx = (xs + r.x0).ravel()
                gy = (ys + r.y0).ravel()
                order = np.argsort(flat_l, kind="stable")
                ls = flat_l[order]
                uniq, start = np.unique(ls, return_index=True)
                end = np.append(start[1:], len(ls))
                for u, s, e in zip(uniq, start, end):
                    sel = order[s:e]
                    regs.append(
                        (
                            int(u),
                            float(flat_v[sel[0]]),
                            int(e - s),
                            int(gx[sel].min()),
                            int(gy[sel].min()),
                            int(gx[sel].max()),
                            int(gy[sel].max()),
                        )
                    )
            yield pd.DataFrame(
                regs,
                columns=[
                    "label", "value", "n_pixels", "minx", "miny", "maxx", "maxy",
                ],
            )

    def strips_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                    np.float64
                )
                lab = _label_block(a, r.x0, r.y0, width_full)
                ypos = np.arange(r.height) + r.y0
                xpos = np.arange(r.width) + r.x0
                emits = [
                    # (side tag, seam coordinate, positions, labels, values)
                    ("v+", r.x0 + r.width, ypos, lab[:, -1], a[:, -1]),
                    ("v-", r.x0, ypos, lab[:, 0], a[:, 0]),
                    ("h+", r.y0 + r.height, xpos, lab[-1, :], a[-1, :]),
                    ("h-", r.y0, xpos, lab[0, :], a[0, :]),
                ]
                for side, k, pos, labs, vals in emits:
                    for p, l, v in zip(pos, labs, vals):
                        rows.append((side, int(k), int(p), int(l), float(v)))
            yield pd.DataFrame(
                rows, columns=["side", "k", "pos", "label", "value"]
            )

    src = blocks.where(F.col("band") == band)
    return src.mapInPandas(regs_fn, REGION_SCHEMA), src.mapInPandas(
        strips_fn, STRIP_SCHEMA
    )


def seam_edges(strips: DataFrame) -> DataFrame:
    """(la, lb) union edges: a block's outgoing seam ('v+': its right
    edge at x = x0+width) meets the neighbor's incoming seam ('v-' at
    the same x) at equal pos & value."""
    out = strips.where(F.col("side").isin("v+", "h+")).withColumn(
        "axis", F.expr("substring(side, 1, 1)")
    )
    inc = strips.where(F.col("side").isin("v-", "h-")).withColumn(
        "axis", F.expr("substring(side, 1, 1)")
    )
    return (
        out.alias("a")
        .join(
            inc.alias("b"),
            (F.col("a.axis") == F.col("b.axis"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.value") == F.col("b.value")),
        )
        .select(F.col("a.label").alias("la"), F.col("b.label").alias("lb"))
        .where("la <> lb")
        .distinct()
    )


def connected_components(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """(label, root) — min label of each component. Alternating
    neighbor-min exchange + pointer jumping; each round at least halves
    chain lengths, so fixpoint in O(log n) rounds."""
    sym = edges.unionByName(
        edges.select(F.col("lb").alias("la"), F.col("la").alias("lb"))
    ).distinct()
    mapping = (
        sym.groupBy("la")
        .agg(F.min("lb").alias("nb"))
        .select(F.col("la").alias("label"), F.least("la", "nb").alias("root"))
        .persist()
    )
    for _ in range(max_iters):
        # neighbor exchange: root ← min(root, roots of neighbors)
        nbr = (
            sym.alias("e")
            .join(mapping.alias("m"), F.col("e.lb") == F.col("m.label"))
            .groupBy(F.col("e.la").alias("label"))
            .agg(F.min("m.root").alias("nb_root"))
        )
        ex = (
            mapping.alias("m")
            .join(nbr.alias("n"), "label", "left")
            .select(
                "label",
                F.least(
                    F.col("m.root"), F.coalesce(F.col("n.nb_root"), F.col("m.root"))
                ).alias("root"),
            )
        )
        # pointer jump: root ← root's root
        jumped = (
            ex.alias("x")
            .join(
                ex.alias("r"),
                F.col("x.root") == F.col("r.label"),
                "left",
            )
            .select(
                F.col("x.label").alias("label"),
                F.coalesce(F.col("r.root"), F.col("x.root")).alias("root"),
            )
            .persist()
        )
        changed = (
            jumped.alias("j")
            .join(mapping.alias("o"), "label")
            .where(F.col("j.root") != F.col("o.root"))
            .count()
        )
        mapping.unpersist()
        mapping = jumped
        if changed == 0:
            break
    return mapping


def polygonize(blocks: DataFrame, width_full: int, band: int = 1) -> DataFrame:
    """(region_id, value, n_pixels, minx, miny, maxx, maxy) — global
    connected same-value regions."""
    regs, strips = block_regions(blocks, width_full, band)
    mapping = connected_components(seam_edges(strips))
    return (
        regs.alias("r")
        .join(mapping.alias("m"), F.col("r.label") == F.col("m.label"), "left")
        .select(
            F.coalesce(F.col("m.root"), F.col("r.label")).alias("region_id"),
            "value",
            "n_pixels",
            "minx",
            "miny",
            "maxx",
            "maxy",
        )
        .groupBy("region_id", "value")
        .agg(
            F.sum("n_pixels").alias("n_pixels"),
            F.min("minx").alias("minx"),
            F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"),
            F.max("maxy").alias("maxy"),
        )
    )


def sieve(
    blocks: DataFrame, width_full: int, threshold: int, band: int = 1
) -> DataFrame:
    """(region_id, value, n_pixels, keep) — regions ≤ threshold flagged
    for merge (alg/gdalsievefilter.cpp contract)."""
    p = polygonize(blocks, width_full, band)
    return p.select(
        "region_id",
        "value",
        "n_pixels",
        (F.col("n_pixels") > threshold).alias("keep"),
    )
