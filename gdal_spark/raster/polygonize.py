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
   (exterior + holes) is the finalize step below (trace_region_rings /
   polygonize_wkb).
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
    chain lengths, so fixpoint in O(log n) rounds.

    Iteration state is localCheckpoint()ed (eager), not persist()ed:
    persist keeps the full LINEAGE, and because each round references
    the previous `ex` twice the logical plan doubles per round — with
    the cache not always substituted under AQE, round walls grew
    geometrically (measured 12 s → 21 s → 82 s on a 4-round fixture;
    flat ~1 s/round after the change). Checkpointing truncates the
    lineage so every round's plan is O(1) regardless of round count —
    the standard discipline for iterative DataFrame algorithms. (The
    earlier gate fixtures all converged in ≤2 rounds, which is why the
    growth stayed invisible until a deeper-converging input hit it.)
    Trade: checkpointed blocks are not recomputable on executor loss;
    a production run with flaky executors should use a reliable
    checkpoint dir instead."""
    sym = (
        # symmetrize with ONE scan of edges (explode both directions
        # from each row) — a union of edges with its flipped self would
        # compute the upstream edge pipeline twice when it has no
        # shuffle boundary of its own (e.g. minhash_bands' map-only
        # signature phase feeding dedup_clusters)
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("la"), F.col("lb")),
                    F.struct(
                        F.col("lb").alias("la"), F.col("la").alias("lb")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.la", "_e.lb")
        .distinct()
        .localCheckpoint()
    )
    mapping = (
        sym.groupBy("la")
        .agg(F.min("lb").alias("nb"))
        .select(F.col("la").alias("label"), F.least("la", "nb").alias("root"))
        .localCheckpoint()
    )
    return _cc_iterate(sym, mapping, max_iters)


def _cc_iterate(sym: DataFrame, mapping: DataFrame, max_iters: int) -> DataFrame:
    """The CC fixpoint loop over localCheckpoint()ed state: each
    round's `jumped` truncates its lineage eagerly, so plan size and
    round wall stay constant; superseded checkpoint blocks are freed
    when their RDDs are garbage-collected."""
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
            # eager lineage cut — see connected_components docstring
            .localCheckpoint()
        )
        changed = (
            jumped.alias("j")
            .join(mapping.alias("o"), "label")
            .where(F.col("j.root") != F.col("o.root"))
            .count()
        )
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


# --- ring tracing finalize (region mask → WKB polygon with holes) ---

_DIRS = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}
_VECS = [(1, 0), (0, 1), (-1, 0), (0, -1)]


def trace_region_rings(mask: np.ndarray) -> list[np.ndarray]:
    """Boundary rings of a pixel mask in pixel-corner coordinates
    (x right, y down). Walks the directed boundary-edge graph keeping
    the region on the RIGHT, preferring the sharpest right turn at
    checkerboard corners, so every cycle is simple. First ring returned
    is the exterior (largest |area|); the rest are holes. This is the
    finalize step of polygonize (alg/polygonize_polygonizer.cpp TwoArm
    tracing analog)."""
    h, w = mask.shape
    edges: dict[tuple[int, int, int], tuple[int, int]] = {}
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if y == 0 or not mask[y - 1, x]:
            edges[(x, y, 0)] = (x + 1, y)        # top, walk +x
        if x == w - 1 or not mask[y, x + 1]:
            edges[(x + 1, y, 1)] = (x + 1, y + 1)  # right, walk +y
        if y == h - 1 or not mask[y + 1, x]:
            edges[(x + 1, y + 1, 2)] = (x, y + 1)  # bottom, walk -x
        if x == 0 or not mask[y, x - 1]:
            edges[(x, y + 1, 3)] = (x, y)          # left, walk -y
    by_start: dict[tuple[int, int], list[int]] = {}
    for (sx, sy, d) in edges:
        by_start.setdefault((sx, sy), []).append(d)
    rings: list[np.ndarray] = []
    visited: set[tuple[int, int, int]] = set()
    for start_key in list(edges):
        if start_key in visited:
            continue
        ring = []
        key = start_key
        while key not in visited:
            visited.add(key)
            sx, sy, d = key
            ring.append((sx, sy))
            nxt = edges[key]
            outs = by_start.get(nxt, [])
            # turn priority: sharp right (d-1), straight (d), left (d+1)
            for cand in ((d - 1) % 4, d, (d + 1) % 4):
                if cand in outs and (nxt[0], nxt[1], cand) not in visited:
                    key = (nxt[0], nxt[1], cand)
                    break
            else:
                break  # cycle closed
        if len(ring) >= 4:
            rings.append(np.array(ring, dtype=np.float64))
    rings.sort(key=lambda r: -abs(
        float(np.sum(r[:, 0] * np.roll(r[:, 1], -1)
                     - np.roll(r[:, 0], -1) * r[:, 1])) / 2.0
    ))
    return rings


def region_wkb(mask: np.ndarray) -> bytes:
    """Region mask → WKB Polygon (exterior + holes), pixel-corner
    coordinates. st_area(result) == mask.sum() exactly."""
    from gdal_spark.geometry.wkb import polygon_to_wkb

    rings = trace_region_rings(mask)
    return polygon_to_wkb(rings)


MASK_SCHEMA = (
    "label long, value double, x0 long, y0 long, h long, w long, mask binary"
)


def region_masks(blocks: DataFrame, width_full: int, band: int = 1) -> DataFrame:
    """Per-block packed sub-masks, one row per (block, provisional label):
    the region's pixels inside this block, bit-packed over the label's
    block-local bounding box. The shuffle payload for the distributed
    ring-tracing finalize — 1 bit/pixel, bounded by block size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype)).astype(
                    np.float64
                )
                lab = _label_block(a, r.x0, r.y0, width_full)
                for u in np.unique(lab):
                    m = lab == u
                    ys, xs = np.nonzero(m)
                    y0, y1 = int(ys.min()), int(ys.max()) + 1
                    x0, x1 = int(xs.min()), int(xs.max()) + 1
                    sub = m[y0:y1, x0:x1]
                    rows.append(
                        (
                            int(u),
                            float(a[ys[0], xs[0]]),
                            int(r.x0 + x0),
                            int(r.y0 + y0),
                            int(sub.shape[0]),
                            int(sub.shape[1]),
                            np.packbits(sub).tobytes(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["label", "value", "x0", "y0", "h", "w", "mask"]
            )

    return blocks.where(F.col("band") == band).mapInPandas(fn, MASK_SCHEMA)


def polygonize_wkb(blocks: DataFrame, width: int, height: int, band: int = 1) -> DataFrame:
    """Distributed finalize: (region_id, value, n_pixels, wkb) with traced
    ring geometry. Blocks emit per-label packed sub-masks (region_masks);
    the global label mapping joins them to region ids; ONE shuffle keyed by
    region_id groups each region's sub-masks into an applyInPandas task
    that reassembles only that region's bounding box and traces its rings
    (alg/polygonize.cpp finalize analog). No row data touches the driver;
    memory per task is one region's bbox, the same bound the reference's
    per-polygon ring builder has."""
    _, strips = block_regions(blocks, width_full=width, band=band)
    mapping = connected_components(seam_edges(strips))
    masks = region_masks(blocks, width_full=width, band=band)
    joined = (
        masks.alias("x")
        .join(mapping.alias("m"), F.col("x.label") == F.col("m.label"), "left")
        .select(
            F.coalesce(F.col("m.root"), F.col("x.label")).alias("region_id"),
            "value",
            "x0",
            "y0",
            "h",
            "w",
            "mask",
        )
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(key[0])
        minx, miny = int(pdf["x0"].min()), int(pdf["y0"].min())
        maxx = int((pdf["x0"] + pdf["w"]).max())
        maxy = int((pdf["y0"] + pdf["h"]).max())
        canvas = np.zeros((maxy - miny, maxx - minx), dtype=bool)
        for r in pdf.itertuples():
            sub = np.unpackbits(
                np.frombuffer(r.mask, dtype=np.uint8), count=r.h * r.w
            ).reshape(r.h, r.w).astype(bool)
            canvas[
                r.y0 - miny : r.y0 - miny + r.h, r.x0 - minx : r.x0 - minx + r.w
            ] |= sub
        rings = [r + np.array([minx, miny]) for r in trace_region_rings(canvas)]
        from gdal_spark.geometry.wkb import polygon_to_wkb

        return pd.DataFrame(
            [
                (
                    rid,
                    float(pdf["value"].iloc[0]),
                    int(canvas.sum()),
                    polygon_to_wkb(rings),
                )
            ],
            columns=["region_id", "value", "n_pixels", "wkb"],
        )

    return joined.groupBy("region_id").applyInPandas(
        assemble, "region_id long, value double, n_pixels long, wkb binary"
    )


def binarize(blocks: DataFrame, nodata: float, band: int = 1) -> DataFrame:
    """data/nodata mask blocks: 1.0 where value != nodata else 0.0."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                a = model.decode((r.buf, r.height, r.width, r.dtype))
                m = (a != nodata).astype(np.float64)
                d = r._asdict()
                d.pop("Index", None)
                d["dtype"] = "float64"
                d["buf"] = np.ascontiguousarray(m).tobytes()
                out.append(d)
            yield pd.DataFrame(out)

    return blocks.where(F.col("band") == band).mapInPandas(
        fn, model.BLOCK_SCHEMA
    )


def footprint(
    blocks: DataFrame,
    width: int,
    height: int,
    band: int = 1,
    nodata: float = 0.0,
) -> DataFrame:
    """Footprint (apps/gdal_footprint_lib.cpp): outline polygons of the
    valid-data mask. Binarize → the distributed CCL + per-region ring
    tracing pipeline (polygonize_wkb) → keep the data-valued regions.
    Returns (region_id, n_pixels, wkb) with holes where nodata islands
    sit inside data regions — the same geometry the reference's
    GDALFootprint produces in pixel-corner coordinates."""
    masked = binarize(blocks, nodata, band)
    wkb = polygonize_wkb(masked, width, height, band)
    return wkb.where(F.col("value") == 1.0).select(
        "region_id", "n_pixels", "wkb"
    )
