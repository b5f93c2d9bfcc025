"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata (training-data pipeline surface).

The decode step is STUBBED (no image/audio libraries in this container):
`decode_media` raises NotImplementedError unless `fake=True`, which
substitutes a deterministic hash-derived pixel/sample tensor with the
declared shape — making the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) real and testable end-to-end.

Operators:
- attach_media: derive a media table (doc_id, media_type, width, height,
  n_frames, payload binary) from documents (deterministic synth payload).
- decode_media: mapInPandas binary → feature rows (stub/fake decode).
- media_features: per-media deterministic feature vector (mean/std/
  histogram over the fake tensor) — the feature-extraction stage shape.
- frame_sample: metadata-level transforms (true decode stubbed; the
  plumbing — row explosion per sampled frame — is real).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_frames int, "
    "payload binary"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media rows: one per doc, type cycles
    image/audio/video; payload = md5-chained bytes of the doc text."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        types = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                t = types[int(r.doc_id) % 3]
                seed = hashlib.md5(str(r.text).encode()).digest()
                payload = (seed * 64)[:1024]
                w, h, nf = (16, 16, 1) if t == "image" else (
                    (256, 1, 1) if t == "audio" else (8, 8, 4)
                )
                rows.append((int(r.doc_id), t, w, h, nf, payload))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "width",
                    "height",
                    "n_frames",
                    "payload",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(fn, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int, nf: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: tile the payload bytes
    into the declared (nf, h, w) tensor."""
    need = nf * h * w
    raw = (payload * ((need // len(payload)) + 1))[:need]
    return np.frombuffer(raw, dtype=np.uint8).reshape(nf, h, w)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary → decoded tensor stats. With fake=False this raises at
    execution time: the real decoder (PIL/ffmpeg) is not available in
    this environment — the STUB boundary is explicit."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg; "
                        "run with fake=True for the deterministic stub"
                    )
                t = _fake_decode(bytes(r.payload), r.width, r.height, r.n_frames)
                rows.append(
                    (
                        int(r.doc_id),
                        r.media_type,
                        float(t.mean()),
                        float(t.std()),
                        int(t.min()),
                        int(t.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "mean", "std", "vmin", "vmax"],
            )

    return media.mapInPandas(
        fn,
        "doc_id long, media_type string, mean double, std double, "
        "vmin int, vmax int",
    )


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Video rows explode to one row per sampled frame (metadata-level;
    per-frame payload slicing uses the same fake-decode tensor)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                nf = int(r.n_frames)
                for fidx in range(0, nf, every):
                    t = _fake_decode(
                        bytes(r.payload), r.width, r.height, r.n_frames
                    )
                    rows.append(
                        (int(r.doc_id), fidx, float(t[fidx].mean()))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame", "frame_mean"])

    return media.where(F.col("media_type") == "video").mapInPandas(
        fn, "doc_id long, frame int, frame_mean double"
    )
