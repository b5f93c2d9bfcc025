"""Layer algebra — the reference's 7 two-layer spatial overlay operators
(OGRLayer::Intersection/Union/SymDifference/Identity/Update/Clip/Erase,
ogr/ogrsf_frmts/generic/ogrlayer.cpp:5361-7822; CLI
apps/gdalalg_vector_layer_algebra.cpp:38-41) re-expressed as:

  broadcast(method layer) → envelope pre-test (the reference's own
  pre-test, ogrlayer.cpp:5443-5460) → per-pair convex clip kernels
  (geometry.clip) inside ONE mapInPandas over the input layer.

No shuffle at all when the method layer broadcasts (the common GDAL
shape: big input × small polygon layer). For huge method layers the
cell-key join strategy of operators.spatial_join generalizes — the
refine kernel here is strategy-independent.

Result schemas follow set_result_schema (ogrlayer.cpp:5093): input
fields ++ method fields (prefixed), NULL-padded where a side is absent.
Concave method geometries are handled by ear-clipping decomposition
(geometry.clip *_general); convex methods take the direct fast path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from gdal_spark.geometry import clip as C
from gdal_spark.geometry import wkb as W
from gdal_spark.geometry.kernels import ring_area

OPS = (
    "intersection",
    "union",
    "sym_difference",
    "identity",
    "update",
    "clip",
    "erase",
)


def _area_of(pieces: list[np.ndarray]) -> float:
    return float(sum(abs(ring_area(p)) for p in pieces))


def _bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def _subtract_all(subject: np.ndarray, clips: list[np.ndarray]) -> list[np.ndarray]:
    """subject − ∪clips as disjoint pieces (clips may be concave —
    decomposed to convex parts first)."""
    pieces = [subject]
    for cl in clips:
        for part in C._convex_parts(cl):
            nxt: list[np.ndarray] = []
            for p in pieces:
                nxt.extend(C.difference_convex(p, part))
            pieces = nxt
            if not pieces:
                break
        if not pieces:
            break
    return pieces


def _disjoint_intersections(
    subject: np.ndarray, clips: list[tuple[int, np.ndarray]]
) -> list[tuple[int, list[np.ndarray]]]:
    """[(method_id, pieces)] with overlapping-method double-cover removed
    in method-id order (first method wins the shared region) — used by
    clip so the result area equals |A ∩ ∪B|."""
    consumed: list[np.ndarray] = []
    out: list[tuple[int, list[np.ndarray]]] = []
    for mid, cl in clips:
        inters = C.clip_general(subject, cl)
        if not inters:
            continue
        pieces: list[np.ndarray] = []
        for inter in inters:
            pieces.extend(_subtract_all(inter, consumed) if consumed else [inter])
        if pieces:
            out.append((mid, pieces))
        consumed.append(cl)
    return out


def layer_algebra(
    op: str,
    input_df: DataFrame,
    method_payload: list[tuple[int, np.ndarray]],
    id_col: str = "polygon_id",
    geom_col: str = "geometry",
) -> DataFrame:
    """Run one layer-algebra op.

    input_df: (id_col long, geom_col binary WKB polygon).
    method_payload: [(method_id, convex_ring ndarray)] — broadcast.
    Returns (input_id, method_id, geometry wkb, area) rows; input_id or
    method_id is NULL where that side contributes nothing (per-op schema
    notes in the module docstring).
    """
    if op not in OPS:
        raise ValueError(f"unknown op {op}")
    spark = input_df.sparkSession
    bc = spark.sparkContext.broadcast(
        [(int(m), np.asarray(r, dtype=np.float64).tolist()) for m, r in method_payload]
    )

    schema = StructType(
        [
            StructField("input_id", LongType(), True),
            StructField("method_id", LongType(), True),
            StructField("geometry", BinaryType(), True),
            StructField("area", DoubleType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        methods = [
            (m, C._ccw(np.asarray(r, dtype=np.float64))) for m, r in bc.value
        ]
        mboxes = np.array([_bbox(r) for _, r in methods]).reshape(-1, 4)
        for pdf in batches:
            rows: list[tuple] = []
            for iid, gwkb in zip(pdf[id_col], pdf[geom_col]):
                subject = C._ccw(W.polygon_rings(bytes(gwkb))[0])
                sb = _bbox(subject)
                cand = np.nonzero(
                    ~(
                        (mboxes[:, 0] > sb[2])
                        | (mboxes[:, 2] < sb[0])
                        | (mboxes[:, 1] > sb[3])
                        | (mboxes[:, 3] < sb[1])
                    )
                )[0]
                mlist = [methods[i] for i in cand]
                rows.extend(_one(op, int(iid), subject, mlist))
            yield pd.DataFrame(
                rows, columns=["input_id", "method_id", "geometry", "area"]
            )

    out = input_df.select(id_col, geom_col).mapInPandas(fn, schema)
    if op in ("union", "sym_difference", "update"):
        # method-side leftovers need the method layer itself; compute the
        # complement pieces once on the driver list (method layer is the
        # broadcast side, i.e. small by contract) and union them in.
        extra = _method_side_rows(op, input_df, method_payload, id_col, geom_col)
        if extra is not None:
            out = out.unionByName(extra)
    return out


def _emit(iid, mid, pieces: list[np.ndarray]) -> list[tuple]:
    if not pieces:
        return []
    wkb = (
        W.polygon_to_wkb([pieces[0]])
        if len(pieces) == 1
        else W.multipolygon_to_wkb([[p] for p in pieces])
    )
    return [(iid, mid, wkb, _area_of(pieces))]


def _one(
    op: str, iid: int, subject: np.ndarray, methods: list[tuple[int, np.ndarray]]
) -> list[tuple]:
    rows: list[tuple] = []
    clips = [r for _, r in methods]
    if op == "intersection" or op == "identity" or op == "union":
        for mid, cl in methods:
            pieces = C.clip_general(subject, cl)
            if pieces:
                rows.extend(_emit(iid, mid, pieces))
    if op in ("identity", "union", "sym_difference", "erase", "update"):
        left = _subtract_all(subject, clips)
        if left:
            rows.extend(_emit(iid, None, left))
    if op == "clip":
        for mid, pieces in _disjoint_intersections(subject, methods):
            rows.extend(_emit(iid, mid, pieces))
    return rows


def _method_side_rows(
    op: str,
    input_df: DataFrame,
    method_payload: list[tuple[int, np.ndarray]],
    id_col: str,
    geom_col: str,
):
    """Rows contributed by the method layer alone:
    union/sym_difference → method − ∪inputs; update → method as-is."""
    spark = input_df.sparkSession
    if op == "update":
        rows = []
        for mid, r in method_payload:
            ring = C._ccw(np.asarray(r, dtype=np.float64))
            rows.extend(
                [(None, int(mid), W.polygon_to_wkb([ring]), _area_of([ring]))]
            )
        return spark.createDataFrame(
            rows, "input_id long, method_id long, geometry binary, area double"
        )
    # union / sym_difference: method − ∪inputs, fully distributed.
    # Stage 1 (mapInPandas over the input layer, zero shuffle): each input
    # ring is bbox-tested against the broadcast method envelopes and emitted
    # once per overlapping method_id.  Stage 2 (one shuffle keyed by
    # method_id): applyInPandas subtracts every candidate input from that
    # method polygon.  Methods with no candidate at all are emitted whole via
    # a left-anti join — no row data ever crosses the driver.
    from pyspark.sql import functions as F

    bc = spark.sparkContext.broadcast(
        [(int(m), np.asarray(r, dtype=np.float64).tolist()) for m, r in method_payload]
    )

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        methods = [(m, C._ccw(np.asarray(r, dtype=np.float64))) for m, r in bc.value]
        mboxes = np.array([_bbox(r) for _, r in methods]).reshape(-1, 4)
        mids = [m for m, _ in methods]
        for pdf in batches:
            rows: list[tuple] = []
            for gwkb in pdf[geom_col]:
                ring = np.ascontiguousarray(
                    C._ccw(W.polygon_rings(bytes(gwkb))[0])
                )
                sb = _bbox(ring)
                cand = np.nonzero(
                    ~(
                        (mboxes[:, 0] > sb[2])
                        | (mboxes[:, 2] < sb[0])
                        | (mboxes[:, 1] > sb[3])
                        | (mboxes[:, 3] < sb[1])
                    )
                )[0]
                payload = ring.tobytes()
                for i in cand:
                    rows.append((int(mids[i]), payload))
            yield pd.DataFrame(rows, columns=["method_id", "ring"])

    cand = input_df.select(geom_col).mapInPandas(pairs, "method_id long, ring binary")

    out_schema = "input_id long, method_id long, geometry binary, area double"

    def subtract(key, pdf: pd.DataFrame) -> pd.DataFrame:
        mid = int(key[0])
        mring = next(
            C._ccw(np.asarray(r, dtype=np.float64)) for m, r in bc.value if m == mid
        )
        inputs = [
            np.frombuffer(b, dtype=np.float64).reshape(-1, 2) for b in pdf["ring"]
        ]
        rows = _emit(None, mid, _subtract_all(mring, inputs))
        return pd.DataFrame(
            rows, columns=["input_id", "method_id", "geometry", "area"]
        )

    matched = cand.groupBy("method_id").applyInPandas(subtract, out_schema)

    whole = spark.createDataFrame(
        [
            (
                None,
                int(m),
                W.polygon_to_wkb([C._ccw(np.asarray(r, dtype=np.float64))]),
                _area_of([C._ccw(np.asarray(r, dtype=np.float64))]),
            )
            for m, r in method_payload
        ],
        out_schema,
    )
    untouched = whole.join(
        cand.select("method_id").distinct(), "method_id", "left_anti"
    ).select("input_id", "method_id", "geometry", "area")
    return matched.unionByName(untouched)


def explode_collections(
    df: DataFrame, id_col: str = "polygon_id", geom_col: str = "geometry"
) -> DataFrame:
    """explode-collections (apps/gdalalg_vector_explode_collections.cpp):
    one output row per member geometry of a Multi*/Collection; simple
    geometries pass through with part = 0."""
    from typing import Iterator

    from gdal_spark.geometry import wkb as W2

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                gid = getattr(r, id_col)
                t, payload = W2.parse_wkb(bytes(getattr(r, geom_col)))
                if t == W2.MULTIPOLYGON:
                    for part, (_, rings) in enumerate(payload):
                        rows.append(
                            (gid, part, W2.polygon_to_wkb(rings))
                        )
                elif t in (W2.MULTIPOINT, W2.MULTILINESTRING, W2.COLLECTION):
                    for part, child in enumerate(payload):
                        ct, cp = child
                        if ct == W2.POINT:
                            rows.append(
                                (gid, part,
                                 W2.points_to_wkb([cp[0, 0]], [cp[0, 1]])[0])
                            )
                        elif ct == W2.LINESTRING:
                            rows.append((gid, part, W2.linestring_to_wkb(cp)))
                        else:
                            rows.append((gid, part, W2.polygon_to_wkb(cp[1])))
                else:
                    rows.append((gid, 0, bytes(getattr(r, geom_col))))
            yield pd.DataFrame(
                rows, columns=[id_col, "part", geom_col]
            )

    return df.select(id_col, geom_col).mapInPandas(
        fn, f"{id_col} long, part int, {geom_col} binary"
    )


def vector_tile_index(layers: list[tuple[str, DataFrame]]) -> DataFrame:
    """`gdal vector index` (ogrtindex; apps/gdalalg_vector_index.h:29):
    one row per source layer — location name, feature count, and the
    layer extent (OGREnvelope of all features). Each layer's envelope
    is a distributed min/max aggregation over per-feature envelope
    accessors (functions.st st_xmin/...): map-side partials, one
    O(layers)-row result, never a collect of features. Layers are
    unioned AFTER aggregation so the result is one tiny frame."""
    from pyspark.sql import functions as F

    outs = []
    for loc, df in layers:
        g = "geometry"
        outs.append(
            df.select(
                F.expr(f"st_xmin({g})").alias("_x0"),
                F.expr(f"st_ymin({g})").alias("_y0"),
                F.expr(f"st_xmax({g})").alias("_x1"),
                F.expr(f"st_ymax({g})").alias("_y1"),
            ).agg(
                F.count("*").alias("n_features"),
                F.round(F.min("_x0"), 6).alias("minx"),
                F.round(F.min("_y0"), 6).alias("miny"),
                F.round(F.max("_x1"), 6).alias("maxx"),
                F.round(F.max("_y1"), 6).alias("maxy"),
            ).select(F.lit(loc).alias("location"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
