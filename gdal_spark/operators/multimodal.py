"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata (training-data pipeline surface).

REAL from-scratch codecs (no PIL/ffmpeg needed) cover every
uncompressed container: netpbm P5/P6 and PNG (zlib + full filter set)
images, PCM WAV audio, and uncompressed RIFF/AVI video (raw BGR24 'DIB '
frames). `attach_media_real` builds a media table whose payloads are
genuine container bytes; `decode_media_real` dispatches on magic bytes
and surfaces compressed-codec failures per-row in an `error` column
(poison-pill tolerance). Baseline JPEG is a real from-scratch codec too
(operators/jpeg.py — T.81 Huffman + DCT); only MP3/H.264-class codecs
remain behind the NotImplementedError boundary, stated per-format.

The original `attach_media`/`decode_media(fake=True)` pair keeps the
hash-derived-tensor variant for schema/plumbing tests.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary → decoded stats. The DEFAULT is the REAL codec path
    (decode_media_real: netpbm/PNG/JPEG/WAV/AVI from-scratch decoders,
    per-row `error` column for the remaining compressed-codec
    boundaries). Pass fake=True — or call decode_media_synthetic — for
    the deterministic hash-tensor stand-in used by schema/plumbing
    tests. NOTE the two paths return different schemas: real emits
    (doc_id, kind, mean, std, rate, error); synthetic emits
    (doc_id, media_type, mean, std, vmin, vmax)."""
    if not fake:
        return decode_media_real(media)
    return decode_media_synthetic(media)


def decode_media_synthetic(media: DataFrame) -> DataFrame:
    """binary → tensor stats over the deterministic _fake_decode tensor
    (payload bytes tiled to the declared shape) — the schema/plumbing
    variant; real codecs live in decode_media_real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
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


# --- real decoders for uncompressed container formats ----------------------
# No PIL/ffmpeg in this environment, but the classic UNCOMPRESSED formats
# are pure header-parse + frombuffer — so these are REAL decoders, not
# stubs: binary PPM/PGM (netpbm P5/P6) images and PCM WAV audio. The
# NotImplementedError boundary now applies only to compressed codecs
# (JPEG/PNG/MP3/H.264), stated per-format.


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P5 (grayscale) → (h, w), P6 (RGB) → (h, w, 3),
    uint8. Pure header parse + one frombuffer."""
    if not payload[:2] in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM (P5/P6) payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return data.reshape((h, w, 3) if ch == 3 else (h, w))


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PGM (P5)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV (RIFF) → (samples[n, channels] float64 in [-1, 1],
    sample_rate). 8/16/32-bit integer PCM; compressed codecs raise."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(
            f"compressed WAV (fmt {audio_fmt}) needs a codec library"
        )
    dt = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    x = np.frombuffer(data, dtype=dt).astype(np.float64)
    if bits == 8:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (bits - 1))
    return x.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float64 in [-1, 1] → 16-bit PCM WAV."""
    import struct

    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    n_ch = s.shape[1]
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_media_real(media: DataFrame) -> DataFrame:
    """Real decode for uncompressed payloads: netpbm images → pixel
    stats, PCM WAV → sample stats + rate. Per-format dispatch on the
    payload magic; compressed codecs surface their NotImplementedError
    in an `error` column instead of failing the job (poison-pill
    tolerance a 100 TB media crawl needs)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                p = bytes(r.payload)
                kind = mean = std = rate = None
                err = None
                try:
                    if p[:2] in (b"P5", b"P6"):
                        t = decode_ppm(p).astype(np.float64)
                        kind, mean, std = "image", float(t.mean()), float(t.std())
                    elif p[:8] == b"\x89PNG\r\n\x1a\n":
                        t = decode_png(p).astype(np.float64)
                        kind, mean, std = "image", float(t.mean()), float(t.std())
                    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        x, sr = decode_wav(p)
                        kind, mean, std, rate = (
                            "audio",
                            float(x.mean()),
                            float(x.std()),
                            int(sr),
                        )
                    elif p[:3] == b"\xff\xd8\xff":
                        from gdal_spark.operators.jpeg import decode_jpeg

                        t = decode_jpeg(p).astype(np.float64)
                        kind, mean, std = "image", float(t.mean()), float(t.std())
                    elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                        fr, fps = decode_avi(p)
                        t = fr.astype(np.float64)
                        kind, mean, std, rate = (
                            "video",
                            float(t.mean()),
                            float(t.std()),
                            int(fps),
                        )
                    else:
                        raise NotImplementedError(
                            "compressed/unknown codec: needs PIL/ffmpeg"
                        )
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error) as e:
                    err = str(e)
                rows.append((int(r.doc_id), kind, mean, std, rate, err))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "mean", "std", "rate", "error"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        fn,
        "doc_id long, kind string, mean double, std double, rate int, "
        "error string",
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Pure stdlib-zlib + numpy PNG decoder: 8-bit greyscale/RGB/RGBA/
    grey+alpha, non-interlaced (the overwhelming majority of real PNGs).
    Implements the full filter set (None/Sub/Up/Average/Paeth) per the
    PNG spec. Palette/16-bit/interlaced raise NotImplementedError."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, cid = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif cid == b"IDAT":
            idat.extend(body)
        elif cid == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth}")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise NotImplementedError(f"PNG color type {color_type} (palette)")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    data = arr[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = filters[y]
        row = data[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        else:
            cur = row
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                if f == 1:  # Sub
                    cur[x] = (cur[x] + a) & 0xFF
                elif f == 3:  # Average
                    cur[x] = (cur[x] + (a + b) // 2) & 0xFF
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pr) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
    img = out.astype(np.uint8).reshape(h, w, nch)
    return img[:, :, 0] if nch == 1 else img


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 → PNG (filter 0 rows, one zlib stream)."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- real video container: uncompressed AVI (RIFF 'AVI ', raw BGR24
# 'DIB ' frames) — public format (Microsoft RIFF/AVI spec); codec-free,
# so frame-sampling runs on REAL container bytes with no external libs.


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """frames (n, h, w, 3) uint8 RGB → minimal uncompressed AVI bytes
    (raw BGR24, bottom-up rows, 4-byte-aligned — the BMP/DIB layout)."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    row = w * 3
    pad = (-row) % 4
    frame_size = (row + pad) * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = struct.pack(
        "<14I",
        1000000 // fps,  # microseconds per frame
        frame_size * fps,  # max bytes per sec
        0, 0x10,  # padding, flags (AVIF_HASINDEX off)
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    # standard AVISTREAMHEADER: fcc, handler, flags, priority, language,
    # initialFrames, scale, rate, start, length, sugbuf, quality,
    # sampleSize, rcFrame
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      frame_size, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       frame_size, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi_frames = []
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
        if pad:
            padded = np.zeros((h, row + pad), dtype=np.uint8)
            padded[:, :row] = bgr.reshape(h, row)
            body = padded.tobytes()
        else:
            body = np.ascontiguousarray(bgr).tobytes()
        movi_frames.append(chunk(b"00db", body))
    movi = lst(b"movi", b"".join(movi_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Minimal RIFF/AVI walk → (frames (n, h, w, 3) uint8 RGB, fps).
    Accepts only uncompressed 24-bit 'DIB ' streams ('00db' chunks);
    anything else raises (the poison-pill error-column contract)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    rate = scale = None
    frames: list[bytes] = []

    def walk(buf: bytes, off: int, end: int):
        nonlocal w, h, rate, scale
        while off + 8 <= end:
            tag = buf[off : off + 4]
            size = struct.unpack_from("<I", buf, off + 4)[0]
            body0 = off + 8
            if tag == b"LIST":
                walk(buf, body0 + 4, body0 + size)
            elif tag == b"avih":
                vals = struct.unpack_from("<14I", buf, body0)
                w, h = vals[8], vals[9]  # dwWidth, dwHeight
            elif tag == b"strh":
                fcc = buf[body0 : body0 + 4]
                if fcc == b"vids":
                    handler = buf[body0 + 4 : body0 + 8]
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                        raise ValueError(
                            f"compressed AVI stream {handler!r} unsupported"
                        )
                    # dwScale/dwRate at +20/+24 past fcc+handler+flags+
                    # priority+language+initialFrames
                    s, r = struct.unpack_from("<II", buf, body0 + 20)
                    scale, rate = s, r
            elif tag in (b"00db", b"00dc"):
                frames.append(buf[body0 : body0 + size])
            off = body0 + size + (size % 2)

    walk(payload, 12, len(payload))
    if w is None or not frames:
        raise ValueError("AVI: no video frames found")
    row = w * 3
    pad = (-row) % 4
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        a = np.frombuffer(fb, dtype=np.uint8).reshape(h, row + pad)[:, :row]
        out[i] = a.reshape(h, w, 3)[::-1, :, ::-1]  # flip rows, BGR→RGB
    fps = (rate / scale) if (rate and scale) else 0.0
    return out, float(fps)


def attach_media_real(docs: DataFrame) -> DataFrame:
    """Like attach_media but every payload is a REAL container:
    PGM image / PCM WAV / uncompressed AVI, deterministic from the doc
    text — so the full decode pipeline runs on genuine bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        types = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                t = types[int(r.doc_id) % 3]
                seed = hashlib.md5(str(r.text).encode()).digest()
                raw = np.frombuffer((seed * 64)[:1024], dtype=np.uint8)
                if t == "image":
                    w, h, nf = 16, 16, 1
                    payload = encode_pgm(raw[: w * h].reshape(h, w))
                elif t == "audio":
                    w, h, nf = 256, 1, 1
                    samples = (
                        raw[:256].astype(np.int16) - 128
                    ) * 256
                    payload = encode_wav(samples, 8000)
                else:
                    w, h, nf = 8, 8, 4
                    frames = np.resize(raw, nf * h * w * 3).reshape(
                        nf, h, w, 3
                    )
                    payload = encode_avi(frames, fps=10)
                rows.append((int(r.doc_id), t, w, h, nf, payload))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height",
                    "n_frames", "payload",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(fn, MEDIA_SCHEMA)


def frame_sample_real(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling over REAL AVI payloads: decode the container once
    per row, emit one row per sampled frame with its pixel mean."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                frames, _fps = decode_avi(bytes(r.payload))
                for fidx in range(0, len(frames), every):
                    rows.append(
                        (
                            int(r.doc_id),
                            fidx,
                            float(frames[fidx].astype(np.float64).mean()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame", "frame_mean"]
            )

    return media.where(F.col("media_type") == "video").mapInPandas(
        fn, "doc_id long, frame int, frame_mean double"
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte image dispatch shared by resize/feature extraction:
    netpbm / PNG / baseline JPEG → uint8 array (H, W) or (H, W, C).
    Compressed/unknown codecs raise NotImplementedError (poison-pill
    callers surface it per row)."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from gdal_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError("compressed/unknown image codec")


def bilinear_resize(a: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pixel-center-aligned bilinear resize of a (H, W[, C]) uint8
    array — the same sampling convention as the raster warp kernels
    (dst center maps to src at (i+0.5)·scale−0.5, edge-clamped), so an
    image resize and a raster 'resize' agree on the grid."""
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot resize an empty image")
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    af = a.astype(np.float64)
    if af.ndim == 2:
        af = af[:, :, None]
    rows0, rows1 = af[y0], af[y1]
    top = rows0[:, x0] * (1 - fx)[None, :, None] + rows0[:, x1] * fx[None, :, None]
    bot = rows1[:, x0] * (1 - fx)[None, :, None] + rows1[:, x1] * fx[None, :, None]
    out = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    out = np.floor(out + 0.5).astype(np.uint8)
    return out[:, :, 0] if a.ndim == 2 else out


def resize_media(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Image rows resized to (out_w, out_h) — the thumbnail/normalize
    step of a multimodal training pipeline.  One Arrow pass (decode →
    bilinear kernel); non-image rows and undecodable payloads surface
    in the `error` column (poison-pill tolerance).  Returns
    (doc_id, out_w, out_h, mean, resized_md5, error) — the md5 is over
    the RAW resized uint8 array bytes (row-major, channels-last), so
    the exact tensor is pinned without shipping it to the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                mean = md5 = err = None
                try:
                    a = decode_image(bytes(r.payload))
                    t = bilinear_resize(a, out_w, out_h)
                    mean = float(np.floor(t.astype(np.float64).mean() * 1e6)
                                 / 1e6)
                    md5 = hashlib.md5(
                        np.ascontiguousarray(t).tobytes()
                    ).hexdigest()
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error) as e:
                    err = str(e)
                rows.append((int(r.doc_id), out_w, out_h, mean, md5, err))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "out_w", "out_h", "mean", "resized_md5",
                         "error"],
            )

    return media.where(F.col("media_type") == "image").select(
        "doc_id", "payload"
    ).mapInPandas(
        fn,
        "doc_id long, out_w int, out_h int, mean double, "
        "resized_md5 string, error string",
    )


def image_features(media: DataFrame) -> DataFrame:
    """Classical image features per row — the cheap feature-extract
    stage (dedup/quality signals before any model): per-channel mean,
    contrast (std), Sobel edge energy, and a 16-bin intensity-histogram
    entropy.  One Arrow pass, numpy only; errors per row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                mean = std = edge = ent = None
                err = None
                try:
                    a = decode_image(bytes(r.payload)).astype(np.float64)
                    g = a if a.ndim == 2 else a.mean(axis=2)
                    mean = float(g.mean())
                    std = float(g.std())
                    if min(g.shape) < 3:
                        # no 3x3 Sobel window fits: edge energy is 0 by
                        # definition, not NaN (the row is NOT an error)
                        edge = 0.0
                    else:
                        gx = (
                            g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:]
                            - g[:-2, :-2] - 2 * g[1:-1, :-2] - g[2:, :-2]
                        )
                        gy = (
                            g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                            - g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:]
                        )
                        edge = float(np.sqrt(gx * gx + gy * gy).mean())
                    hist = np.bincount(
                        (g.ravel() / 16).astype(np.int64).clip(0, 15),
                        minlength=16,
                    )
                    p = hist[hist > 0] / hist.sum()
                    ent = float(-(p * np.log2(p)).sum())
                except (NotImplementedError, ValueError, KeyError,
                        IndexError, struct.error, zlib.error) as e:
                    err = str(e)
                rows.append((int(r.doc_id), mean, std, edge, ent, err))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mean", "contrast", "edge_energy",
                         "hist_entropy", "error"],
            )

    return media.where(F.col("media_type") == "image").select(
        "doc_id", "payload"
    ).mapInPandas(
        fn,
        "doc_id long, mean double, contrast double, edge_energy double, "
        "hist_entropy double, error string",
    )
