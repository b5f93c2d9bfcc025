"""Checkpoint/resume, multimodal plumbing, streaming ingest, kNN ring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.geometry.kernels import haversine_m
from gdal_spark.operators import checkpoint as CP
from gdal_spark.operators import multimodal as MM
from gdal_spark.operators.knn import knn_ring_join


# --- checkpoint / resume ---


def test_resumable_write_and_resume(spark, tmp_path):
    path = str(tmp_path / "out")
    df = spark.range(100).select(
        (F.col("id") % 4).alias("part"), F.col("id").alias("v")
    )
    rid, n = CP.resumable_write(df, path, ["part"])
    assert rid is not None and n == 100
    m = CP.read_manifest(spark, path)
    rows = {r.part: r for r in m.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(r.n_rows == 25 for r in rows.values())
    assert all(r.n_bytes > 0 for r in rows.values())
    assert all(r.run_id == rid for r in rows.values())
    # second run: everything checkpointed → no-op
    rid2, n2 = CP.resumable_write(df, path, ["part"])
    assert rid2 is None and n2 == 0
    # partial new data: only the new partition is written
    df2 = spark.range(100, 110).select(
        F.lit(9).alias("part"), F.col("id").alias("v")
    )
    rid3, n3 = CP.resumable_write(df.unionByName(df2), path, ["part"])
    assert n3 == 10
    back = spark.read.parquet(path)
    assert back.count() == 110
    assert CP.read_manifest(spark, path).count() == 5


def test_vector_partition_splits_and_schemes(spark, tmp_path):
    """--feature-limit / --max-file-size splits + hive/flat scheme
    layout (VERDICT r4 next #5, apps/gdalalg_vector_partition.cpp:
    85-96,158-204)."""
    import os

    df = spark.range(250).select(
        (F.when(F.col("id") < 130, "a").otherwise("b")).alias("grp"),
        F.col("id").alias("v"),
    )
    # feature-limit 50: grp a (130 rows) -> parts 50/50/30; b (120) -> 50/50/20
    hive = str(tmp_path / "hive")
    CP.write_vector_partitioned(
        df, hive, ["grp"], order_col="v", feature_limit=50
    )
    m = {
        (r.grp, r.part_seq): r.n_rows
        for r in CP.read_manifest(spark, hive).collect()
    }
    assert m == {("a", 0): 50, ("a", 1): 50, ("a", 2): 30,
                 ("b", 0): 50, ("b", 1): 50, ("b", 2): 20}
    assert sorted(os.listdir(os.path.join(hive, "grp=a"))) == [
        "part_0000000000.parquet", "part_0000000001.parquet",
        "part_0000000002.parquet",
    ]
    back = spark.read.parquet(hive)
    assert back.count() == 250
    assert back.where("grp = 'a'").count() == 130
    # split assignment is deterministic in order_col: rows 0..49 -> seq 0
    from gdal_spark.operators.checkpoint import split_partitions

    s = split_partitions(df, ["grp"], "v", feature_limit=50)
    rows = {r.v: r.part_seq for r in s.collect()}
    assert rows[0] == 0 and rows[49] == 0 and rows[50] == 1 and rows[129] == 2

    # flat scheme: value + seq in the FILENAME, field kept in the file
    flat = str(tmp_path / "flat")
    CP.write_vector_partitioned(
        df, flat, ["grp"], order_col="v", scheme="flat",
        feature_limit=100, layer_name="pages", digits=4,
    )
    names = sorted(
        f for f in os.listdir(flat) if not f.startswith("_")
    )
    assert names == [
        "pages_a_0000.parquet", "pages_a_0001.parquet",
        "pages_b_0000.parquet", "pages_b_0001.parquet",
    ]
    one = spark.read.parquet(os.path.join(flat, "pages_b_0001.parquet"))
    assert one.columns == ["grp", "v"] or set(one.columns) == {"grp", "v"}
    assert one.count() == 20 and one.select("grp").distinct().collect()[0].grp == "b"

    # max-file-size: byte-budget bins never split a row and only the
    # last part of each value may be under-full
    sized = split_partitions(df, ["grp"], "v", max_file_size=400)
    agg = sized.groupBy("grp", "part_seq").count().collect()
    assert all(r["count"] >= 1 for r in agg)
    nparts = {r.grp: 0 for r in agg}
    for r in agg:
        nparts[r.grp] = max(nparts[r.grp], r.part_seq + 1)
    assert nparts["a"] > 1 and nparts["b"] > 1
    with pytest.raises(ValueError):
        split_partitions(df, ["grp"], "v")
    with pytest.raises(ValueError):
        split_partitions(df, ["grp"], "v", feature_limit=1, max_file_size=1)


def test_transaction_rollback_leaves_pre_state(spark, tmp_path):
    """OGR Start/Commit/RollbackTransaction over the manifest (VERDICT
    r4 next #4): a transaction that fails BETWEEN partition writes and
    rolls back leaves committed readers seeing exactly the pre-state;
    a committed transaction publishes atomically via the manifest
    append."""
    path = str(tmp_path / "tx")
    base = spark.range(20).select(
        (F.col("id") % 2).alias("part"), F.col("id").alias("v")
    )
    # pre-state: one committed transaction
    t0 = CP.start_transaction(spark, path)
    assert t0.write(base, ["part"]) == 20
    rid0 = t0.commit()
    assert rid0 is not None
    pre = CP.read_committed(spark, path, ["part"])
    assert pre.count() == 20

    # failing transaction: writes partition 5, "crashes" before 6
    t1 = CP.start_transaction(spark, path)
    t1.write(
        spark.range(7).select(F.lit(5).alias("part"), F.col("id").alias("v")),
        ["part"],
    )
    # mid-txn: committed readers see NONE of the staged rows
    assert CP.read_committed(spark, path, ["part"]).count() == 20
    t1.rollback()
    after = CP.read_committed(spark, path, ["part"])
    assert after.count() == 20
    assert sorted(r.part for r in after.select("part").distinct().collect()) == [0, 1]
    # manifest unchanged; staging gone
    assert CP.read_manifest(spark, path).count() == 2
    import os

    assert not os.path.exists(os.path.join(path, "_staging"))
    # writes after close are refused (ogrlayer.cpp: no txn in progress)
    with pytest.raises(RuntimeError):
        t1.write(base, ["part"])

    # committed transaction: both partitions publish together
    t2 = CP.start_transaction(spark, path)
    t2.write(
        spark.range(3).select(F.lit(6).alias("part"), F.col("id").alias("v")),
        ["part"],
    )
    t2.write(
        spark.range(4).select(F.lit(7).alias("part"), F.col("id").alias("v")),
        ["part"],
    )
    rid2 = t2.commit()
    got = CP.read_committed(spark, path, ["part"])
    assert got.count() == 27
    m = {r.part: r for r in CP.read_manifest(spark, path).collect()}
    assert m[6].n_rows == 3 and m[7].n_rows == 4 and m[6].run_id == rid2
    # resume interop: the committed partitions anti-join away
    assert CP.resume_antijoin(got, path, ["part"]).count() == 0
    # empty transaction commits to None
    t3 = CP.start_transaction(spark, path)
    assert t3.commit() is None


# --- multimodal stubs ---


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(12)],
        "doc_id long, text string",
    )
    return MM.attach_media(docs)


def test_media_schema_and_determinism(spark, media):
    rows = media.collect()
    assert len(rows) == 12
    by_type = {}
    for r in rows:
        by_type.setdefault(r.media_type, []).append(r)
        assert len(bytes(r.payload)) == 1024
    assert set(by_type) == {"image", "audio", "video"}
    again = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert all(bytes(r.payload) == again[r.doc_id] for r in rows)


def test_decode_synthetic_and_real_default(spark, media):
    feats = MM.decode_media_synthetic(media).collect()
    assert len(feats) == 12
    for f in feats:
        assert 0 <= f.vmin <= f.vmax <= 255
        assert f.vmin <= f.mean <= f.vmax
    # fake=True routes to the same synthetic path
    legacy = MM.decode_media(media, fake=True).collect()
    assert {(r.doc_id, r.mean) for r in legacy} == {
        (r.doc_id, r.mean) for r in feats
    }
    # DEFAULT is the real-codec path: synthetic payloads are not valid
    # containers, so every row lands in the poison-pill `error` column
    # instead of failing the job (schema: doc_id, kind, ..., error)
    real = MM.decode_media(media).collect()
    assert len(real) == 12
    assert all(r.error is not None and r.kind is None for r in real)


def test_frame_sample(spark, media):
    frames = MM.frame_sample(media, every=2).collect()
    vids = media.where("media_type = 'video'").count()
    assert len(frames) == vids * 2  # 4 frames sampled every 2
    assert {f.frame for f in frames} == {0, 2}


# --- streaming ---


def test_streaming_ingest(spark, tmp_path):
    from gdal_spark.streaming.ingest import run_ingest_once

    n = run_ingest_once(spark, str(tmp_path / "inbox"), n=500)
    assert n == 500
    t = spark.table("stream_tiles")
    assert {"url", "lat", "lon", "tile_x", "tile_y"} <= set(t.columns)
    # tile ids valid at z12
    bad = t.where(
        "tile_x < 0 or tile_x >= 4096 or tile_y < 0 or tile_y >= 4096"
    ).count()
    assert bad == 0


# --- kNN ring expansion ---


def test_knn_ring_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    tlat = rng.uniform(-60, 60, 200)
    tlon = rng.uniform(-170, 170, 200)
    targets = [(i, float(tlat[i]), float(tlon[i])) for i in range(200)]
    qlat = rng.uniform(-55, 55, 40)
    qlon = rng.uniform(-160, 160, 40)
    pts = spark.createDataFrame(
        [(f"q{i}", float(qlat[i]), float(qlon[i])) for i in range(40)],
        "url string, lat double, lon double",
    )
    got = knn_ring_join(pts, targets, k=3, cell_deg=5.0).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.url, []).append((r.rnk, r.target_id, r.dist_m))
    for i in range(40):
        d = haversine_m(qlat[i], qlon[i], tlat, tlon)
        order = np.lexsort((np.arange(200), d))[:3]
        want = [(int(t), float(d[t])) for t in order]
        rows = sorted(by_q[f"q{i}"])
        assert [t for _, t, _ in rows] == [t for t, _ in want]
        for (_, _, dd), (_, wd) in zip(rows, want):
            assert dd == pytest.approx(wd, rel=1e-12)


def test_knn_hex_ring_matches_bruteforce(spark):
    """Hex k-ring kNN (north-rule "H3 k-ring expansion") vs brute
    force — random fixture incl. a k > buckets-per-ring regime and a
    k >= n_targets full-scan path."""
    from gdal_spark.operators.knn import knn_hex_ring_join

    rng = np.random.default_rng(13)
    tlat = rng.uniform(-60, 60, 150)
    tlon = rng.uniform(-170, 170, 150)
    targets = [(i, float(tlat[i]), float(tlon[i])) for i in range(150)]
    qlat = rng.uniform(-55, 55, 30)
    qlon = rng.uniform(-160, 160, 30)
    pts = spark.createDataFrame(
        [(f"q{i}", float(qlat[i]), float(qlon[i])) for i in range(30)],
        "url string, lat double, lon double",
    )
    for k in (3, 7):
        got = knn_hex_ring_join(pts, targets, k=k, size=400000.0).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.url, []).append((r.rnk, r.target_id, r.dist_m))
        for i in range(30):
            d = haversine_m(qlat[i], qlon[i], tlat, tlon)
            order = np.lexsort((np.arange(150), d))[:k]
            want = [(int(t), float(d[t])) for t in order]
            rows = sorted(by_q[f"q{i}"])
            assert [t for _, t, _ in rows] == [t for t, _ in want]
            for (_, _, dd), (_, wd) in zip(rows, want):
                assert dd == pytest.approx(wd, rel=1e-12)
    # k >= n_targets: full scan returns everything, still exact order
    few = targets[:4]
    got = knn_hex_ring_join(pts, few, k=9, size=400000.0).collect()
    assert {r.url for r in got} == {f"q{i}" for i in range(30)}
    assert all(len([g for g in got if g.url == f"q{i}"]) == 4
               for i in range(30))
    # lat-cap contract is enforced
    import pytest as _pt
    with _pt.raises(ValueError):
        knn_hex_ring_join(pts, [(0, 80.0, 0.0)], k=1)


# --- graph: shortest paths (GNM parity note) ---


def test_shortest_paths(spark):
    from gdal_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [
            (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0),     # path 0→3 cost 3
            (0, 3, 5.0),                                 # worse direct edge
            (3, 4, 1.0), (0, 4, 2.5),                    # 0→4 direct wins
            (7, 8, 1.0),                                 # unreachable island
        ],
        "src long, dst long, w double",
    )
    d = {r.node: r.dist for r in shortest_paths(edges, source=0).collect()}
    assert d == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 2.5}


# --- pansharpen / color map ---


def test_pansharpen_brovey(spark):
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.ops import pansharpen_brovey

    blocks = model.synth_blocks(spark, model.grad100_spec())
    out = pansharpen_brovey(blocks, pan_band=3, rgb_bands=[1, 2])
    rows = out.collect()
    assert {r.band for r in rows} == {1, 2}
    g1 = model.value_grid(0, 0, 100, 100, 1).astype(np.float64)
    g2 = model.value_grid(0, 0, 100, 100, 2).astype(np.float64)
    g3 = model.value_grid(0, 0, 100, 100, 3).astype(np.float64)
    pseudo = 0.5 * g1 + 0.5 * g2
    want1 = np.where(pseudo != 0, g1 * np.divide(g3, pseudo, out=np.zeros_like(g3), where=pseudo != 0), 0)
    full = np.zeros((100, 100))
    for r in rows:
        if r.band != 1:
            continue
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    assert np.allclose(full, want1, atol=1e-9)


def test_color_map(spark):
    import numpy as np

    from gdal_spark.raster import model
    from gdal_spark.raster.ops import color_map

    blocks = model.synth_blocks(spark, model.plane_spec())
    out = color_map(blocks, breaks=[100.0, 250.0], colors=[1, 2, 3])
    full = np.zeros((60, 60), dtype=np.int64)
    for r in out.collect():
        a = model.decode((r.buf, r.height, r.width, r.dtype))
        full[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = a
    ys, xs = np.mgrid[0:60, 0:60]
    z = 3.0 * xs + 4.0 * ys
    want = np.select([z <= 100.0, z <= 250.0], [1, 2], default=3)
    assert np.array_equal(full, want)


def test_streaming_windowed_tile_counts(spark, tmp_path):
    """Watermark + event-time windowed per-tile counts (SURVEY §2.12 row
    78): run the stateful aggregation as an availableNow micro-batch and
    check the windowed totals against the equivalent batch rollup."""
    from gdal_spark.streaming.ingest import (
        geocode_and_tile,
        stage_page_files,
        synthetic_page_stream,
        windowed_tile_counts,
    )

    path = str(tmp_path / "inbox")
    stage_page_files(spark, path, n=400)
    stream = windowed_tile_counts(
        geocode_and_tile(synthetic_page_stream(spark, path))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_tile_counts")
        .outputMode("complete")  # append would hold back windows newer
        .trigger(availableNow=True)  # than the final watermark
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.start, r.tile_x, r.tile_y): r.n_pages
        for r in spark.table("stream_tile_counts").collect()
    }
    # batch equivalent on the same files
    import pyspark.sql.functions as F

    batch = geocode_and_tile(
        spark.read.parquet(path)
    ).groupBy(
        F.window("warc_ts", "10 seconds").alias("w"), "tile_x", "tile_y"
    ).agg(F.count("*").alias("n_pages"))
    want = {
        (r.w.start, r.tile_x, r.tile_y): r.n_pages for r in batch.collect()
    }
    assert got == want and len(got) > 10


def test_real_uncompressed_media_decode(spark):
    """PPM/PGM + PCM WAV are REAL pure-numpy decoders (round-trip
    exact); compressed payloads surface an error column instead of
    failing the job."""
    import numpy as np

    from gdal_spark.operators.multimodal import (
        decode_media_real,
        decode_ppm,
        decode_wav,
        encode_pgm,
        encode_wav,
    )

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    assert np.array_equal(decode_ppm(encode_pgm(img)), img)
    t = np.sin(np.linspace(0, 20, 1000))[:, None]
    dec, rate = decode_wav(encode_wav(t, 8000))
    assert rate == 8000 and np.abs(dec - t).max() < 1e-4

    from gdal_spark.operators.multimodal import decode_png, encode_png

    png_img = (np.arange(96, dtype=np.uint8).reshape(8, 12) * 5) % 241
    assert np.array_equal(decode_png(encode_png(png_img)), png_img)
    rows = [
        (1, bytearray(encode_pgm(img))),
        (2, bytearray(encode_wav(t, 16000))),
        (3, bytearray(b"GIF89a not supported")),
        (4, bytearray(encode_png(png_img))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_media_real(media).collect()}
    assert got[1].kind == "image" and abs(got[1].mean - img.mean()) < 1e-9
    assert got[2].kind == "audio" and got[2].rate == 16000
    assert got[3].kind is None and "codec" in got[3].error
    assert got[4].kind == "image" and abs(got[4].mean - png_img.mean()) < 1e-9


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState custom stateful operator (SURVEY §2.12):
    gap-based per-host sessions; closed sessions from the micro-batch
    match the batch-computed sessions (each host's final session stays
    open in state and is excluded from the comparison)."""
    import pandas as pd

    from gdal_spark.streaming.ingest import sessionize_stream

    # 3 hosts, deterministic gaps: host h0 fetches at t=0..4 (gap 1s),
    # then a 100s gap, then t=104..106; h1 one burst; h2 two bursts
    rows = []
    for h, bursts in [
        ("h0", [(0, 5), (104, 3)]),
        ("h1", [(10, 4)]),
        ("h2", [(0, 2), (200, 2), (400, 1)]),
    ]:
        for start, n in bursts:
            for i in range(n):
                rows.append(
                    (f"https://{h}/p{start}_{i}",
                     pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=start + i))
                )
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
    inbox = str(tmp_path / "inbox")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(inbox)

    stream = spark.readStream.schema("url string, warc_ts timestamp").parquet(
        inbox
    )
    q = (
        sessionize_stream(stream, gap_seconds=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.session_start.second + 60 * r.session_start.minute,
         r.n_pages)
        for r in spark.table("sessions").collect()
    }
    # every burst is its own session: gap-closed ones emit in the data
    # micro-batch, the still-open ones emit when the processing-time
    # timeout fires before availableNow termination
    want = {
        ("h0", 0, 5), ("h0", 104, 3),
        ("h1", 10, 4),
        ("h2", 0, 2), ("h2", 200, 2), ("h2", 400, 1),
    }
    assert got == want, got


def test_multimodal_real_end_to_end(spark):
    """attach_media_real → decode_media_real over GENUINE container
    bytes for all three modalities (PGM / WAV / AVI), plus real
    AVI frame sampling; a corrupted payload lands in the error column
    instead of failing the job."""
    import numpy as np

    from gdal_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(9)],
        "doc_id long, text string",
    )
    media = M.attach_media_real(docs)
    got = {r.doc_id: r for r in M.decode_media_real(media).collect()}
    assert len(got) == 9
    for i in range(9):
        r = got[i]
        assert r.error is None, r.error
        assert r.kind == ["image", "audio", "video"][i % 3]
        if r.kind == "video":
            assert r.rate == 10  # fps from the AVI stream header
        if r.kind == "audio":
            assert r.rate == 8000

    # real frame sampling: 4-frame AVIs sampled every 2 → frames 0, 2
    fs = M.frame_sample_real(media, every=2).collect()
    by_doc = {}
    for r in fs:
        by_doc.setdefault(r.doc_id, []).append(r.frame)
    assert all(sorted(v) == [0, 2] for v in by_doc.values())
    # frame means match a direct decode
    one = media.where("media_type = 'video'").limit(1).collect()[0]
    frames, fps = M.decode_avi(bytes(one.payload))
    direct = float(frames[0].astype(np.float64).mean())
    got_mean = [r.frame_mean for r in fs if r.doc_id == one.doc_id and r.frame == 0]
    assert abs(got_mean[0] - direct) < 1e-12

    # poison pill: truncated AVI → error column, job survives
    bad = spark.createDataFrame(
        [(99, bytearray(b"RIFF\x08\x00\x00\x00AVI x"))],
        "doc_id long, payload binary",
    )
    r = M.decode_media_real(bad).collect()[0]
    assert r.error is not None and r.kind is None


def test_jpeg_codec_roundtrip_and_dispatch(spark):
    """Baseline JPEG (T.81) from-scratch codec: flat images near-exact,
    smooth content within quantization error for 4:4:4 and 4:2:0;
    decode_media_real dispatches on the JPEG magic."""
    import numpy as np

    from gdal_spark.operators import multimodal as M
    from gdal_spark.operators.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((16, 24), 130, dtype=np.uint8)
    assert np.abs(
        decode_jpeg(encode_jpeg(flat, 90)).astype(int) - 130
    ).max() <= 1

    rng = np.random.default_rng(0)
    smooth = rng.integers(60, 200, (3, 4, 3)).astype(np.float64)
    big = np.kron(smooth, np.ones((12, 12, 1)))[:34, :44].astype(np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(big, quality=95, subsample=sub))
        err = np.abs(out.astype(int) - big.astype(int))
        assert out.shape == big.shape
        assert err.mean() < 3.0 and err.max() < 25, (sub, err.max())

    # progressive marker rejected by name
    import pytest as _pt

    bad = bytearray(encode_jpeg(flat, 90))
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with _pt.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(bad))

    # media dispatch
    media = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(big, 90)))],
        "doc_id long, payload binary",
    )
    r = M.decode_media_real(media).collect()[0]
    assert r.kind == "image" and r.error is None
    assert abs(r.mean - big.astype(np.float64).mean()) < 3.0


def test_k_shortest_paths_yen(spark):
    """Yen's classic example (gnm/gnmgraph.cpp:247 KShortestPaths):
    C=0 D=1 E=2 F=3 G=4 H=5; the 3 best loopless C→H paths are
    C-E-F-H (5), C-E-G-H (7), C-D-F-H (8)."""
    from gdal_spark.operators.graph import (
        k_shortest_paths,
        shortest_path_with_route,
    )

    edges = spark.createDataFrame(
        [
            (0, 1, 3.0), (0, 2, 2.0), (1, 3, 4.0), (2, 1, 1.0),
            (2, 3, 2.0), (2, 4, 3.0), (3, 4, 2.0), (3, 5, 1.0),
            (4, 5, 2.0),
        ],
        "src long, dst long, w double",
    )
    # route-carrying SSSP agrees with the dist-only one
    routes = {
        r.node: (r.dist, r.path)
        for r in shortest_path_with_route(edges, 0).collect()
    }
    assert routes[5] == (5.0, [0, 2, 3, 5])

    got = k_shortest_paths(edges, source=0, target=5, k=3)
    assert got == [
        (5.0, [0, 2, 3, 5]),
        (7.0, [0, 2, 4, 5]),
        (8.0, [0, 1, 3, 5]),
    ]
    # K larger than the number of distinct paths: returns what exists
    got_all = k_shortest_paths(edges, source=0, target=5, k=5)
    assert len(got_all) == 5
    assert got_all[:3] == got
    costs = [c for c, _ in got_all]
    assert costs == sorted(costs)
    # no path → empty; k=0 → empty
    assert k_shortest_paths(edges, source=5, target=0, k=3) == []
    assert k_shortest_paths(edges, source=0, target=5, k=0) == []


def test_multi_source_sssp_batches_spurs(spark):
    """VERDICT r4 next #7: one relaxation loop solves MANY sources with
    per-source exclusions — each sid sees its own filtered graph."""
    from gdal_spark.operators.graph import (
        multi_source_shortest_paths,
        shortest_path_with_route,
    )

    edges = spark.createDataFrame(
        [
            (0, 1, 3.0), (0, 2, 2.0), (1, 3, 4.0), (2, 1, 1.0),
            (2, 3, 2.0), (2, 4, 3.0), (3, 4, 2.0), (3, 5, 1.0),
            (4, 5, 2.0),
        ],
        "src long, dst long, w double",
    )
    # sid 0: plain from 0; sid 1: from 0 minus edge (2,3);
    # sid 2: from 2 with node 0 removed (a no-op for forward reach)
    res = multi_source_shortest_paths(
        edges,
        [(0, 0), (1, 0), (2, 2)],
        excluded_edges=[(1, 2, 3)],
        excluded_nodes=[(2, 0)],
    )
    got = {
        (r.sid, r.node): (r.dist, list(r.path)) for r in res.collect()
    }
    # sid 0 matches the single-source solver on every node
    single = {
        r.node: (r.dist, list(r.path))
        for r in shortest_path_with_route(edges, 0).collect()
    }
    assert {n: got[(0, n)] for (s, n) in got if s == 0} == single
    # sid 1: without (2,3), best 0->5 detours via 4: 0-2-4-5 = 7
    assert got[(1, 5)] == (7.0, [0, 2, 4, 5])
    # sid 2: from node 2, 2-3-5 = 3
    assert got[(2, 5)] == (3.0, [2, 3, 5])


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based streaming exact dedup
    (streaming analog of dedup_exact): a re-crawl drop with duplicated
    page text emits each distinct fingerprint once."""
    import pandas as pd

    from gdal_spark.streaming.ingest import dedup_stream

    rows = [
        (f"https://h{i % 4}/p{i}",
         pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i),
         f"content {i % 25}")  # 100 pages, 25 distinct texts
        for i in range(100)
    ]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    inbox = str(tmp_path / "inbox_dedup")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(inbox)

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).parquet(inbox)
    q = (
        dedup_stream(stream, key="text", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_pages")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_pages").toPandas()
    assert len(got) == 25
    assert sorted(got.text.unique()) == sorted(
        f"content {i}" for i in range(25)
    )


def test_read_committed_as_of_time_travel(spark, tmp_path):
    """Iceberg-style time travel over the transaction manifest: as_of a
    committed run_id reads exactly that snapshot's FILES — later
    appends to the SAME partition are invisible, which partition-value
    filtering cannot express."""
    path = str(tmp_path / "tt")
    t1 = CP.start_transaction(spark, path)
    t1.write(
        spark.range(10).select(
            (F.col("id") % 2).alias("part"), F.col("id").alias("v")
        ),
        ["part"],
    )
    rid1 = t1.commit()
    t2 = CP.start_transaction(spark, path)
    t2.write(
        spark.range(100, 106).select(
            F.lit(0).alias("part"), F.col("id").alias("v")  # SAME partition
        ),
        ["part"],
    )
    t2.write(
        spark.range(200, 203).select(
            F.lit(7).alias("part"), F.col("id").alias("v")  # new partition
        ),
        ["part"],
    )
    rid2 = t2.commit()

    snap1 = CP.read_committed(spark, path, ["part"], as_of=rid1)
    assert snap1.count() == 10
    assert sorted(r.v for r in snap1.collect()) == list(range(10))
    snap2 = CP.read_committed(spark, path, ["part"], as_of=rid2)
    assert snap2.count() == 19
    head = CP.read_committed(spark, path, ["part"])
    assert head.count() == 19
    # monotone snapshot sequence recorded per commit
    m = CP.read_manifest(spark, path)
    seqs = {r.run_id: r.seq for r in m.collect()}
    assert seqs[rid1] < seqs[rid2]
    with pytest.raises(ValueError):
        CP.read_committed(spark, path, ["part"], as_of="nope")


def test_streaming_windowed_hex_counts(spark, tmp_path):
    """H3-style hex binning under structured streaming: the cube-round
    cell SQL shared with batch runs in an availableNow micro-batch;
    windowed per-cell totals equal the batch rollup over the same
    files, and cells match the batch hex assignment exactly."""
    from gdal_spark import portable
    from gdal_spark.streaming.ingest import (
        stage_page_files,
        synthetic_page_stream,
        windowed_hex_counts,
    )

    path = str(tmp_path / "inbox_hex")
    stage_page_files(spark, path, n=400)
    stream = windowed_hex_counts(synthetic_page_stream(spark, path))
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_hex_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.start, r.hex_q, r.hex_r): r.n_pages
        for r in spark.table("stream_hex_counts").collect()
    }
    batch_geo = spark.read.parquet(path).selectExpr(
        "url", "warc_ts", *portable.geocode_cols_list("spark")
    )
    batch_geo.createOrReplaceTempView("_batch_geo_pages")
    hexed = spark.sql(
        portable.hex_cells_sql(
            "select * from _batch_geo_pages", 100000.0,
            cols=("url", "warc_ts"),
        )
    )
    want = {
        (r.w.start, r.hex_q, r.hex_r): r.n_pages
        for r in hexed.groupBy(
            F.window("warc_ts", "10 seconds").alias("w"), "hex_q", "hex_r"
        ).agg(F.count("*").alias("n_pages")).collect()
    }
    assert got == want and len(got) > 5


def test_streaming_spatial_join_matches_batch(spark, tmp_path):
    """The flagship geocode→tile→broadcast-R-tree PIP join runs as a
    stream-static join (stateless mapInPandas per micro-batch) and
    produces exactly the batch flagship's row set over the same files."""
    from gdal_spark import tables
    from gdal_spark.operators.spatial_join import broadcast_pip_join
    from gdal_spark.streaming.ingest import (
        geocode_and_tile,
        spatial_join_stream,
        stage_page_files,
        synthetic_page_stream,
    )

    path = str(tmp_path / "inbox_sj")
    stage_page_files(spark, path, n=500)
    q = (
        spatial_join_stream(synthetic_page_stream(spark, path))
        .writeStream.format("memory")
        .queryName("stream_sjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.url, r.polygon_id, r.tile_x, r.tile_y)
        for r in spark.table("stream_sjoin").collect()
    }
    batch = broadcast_pip_join(
        geocode_and_tile(spark.read.parquet(path)), tables.polygons_local()
    )
    want = {
        (r.url, r.polygon_id, r.tile_x, r.tile_y) for r in batch.collect()
    }
    assert got == want and len(got) > 50


def test_stream_to_table_exactly_once(spark, tmp_path):
    """foreachBatch → Transaction sink: committed table equals the
    batch input, and a full replay (fresh stream checkpoint, same
    stream_id → same deterministic run_ids) publishes NOTHING new."""
    from gdal_spark.operators import checkpoint as CP
    from gdal_spark.streaming.ingest import (
        stage_page_files,
        stream_to_table,
        synthetic_page_stream,
    )

    inbox = str(tmp_path / "inbox_tbl")
    table = str(tmp_path / "table")
    stage_page_files(spark, inbox, n=300)

    def run(ckpt: str) -> None:
        q = (
            stream_to_table(
                synthetic_page_stream(spark, inbox),
                table,
                ["lang"],
                str(tmp_path / ckpt),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    got = CP.read_committed(spark, table, ["lang"])
    want = spark.read.parquet(inbox)
    assert got.count() == want.count() == 300
    assert (
        got.select("url").subtract(want.select("url")).count() == 0
    )
    manifest_runs = {
        r.run_id for r in CP.read_manifest(spark, table).select("run_id").collect()
    }
    assert all(r.startswith("stream-") for r in manifest_runs)

    # replay: new checkpoint forces every file through foreachBatch
    # again with the same batch ids — the sink must skip them all
    run("ck2")
    assert CP.read_committed(spark, table, ["lang"]).count() == 300
    assert {
        r.run_id for r in CP.read_manifest(spark, table).select("run_id").collect()
    } == manifest_runs


def test_compact_table_small_files(spark, tmp_path):
    """Compaction rewrites the streamed table to one file per partition
    value, keeps the committed rows bit-identical, and expires prior
    snapshots (as_of on a pre-compaction run_id raises)."""
    import glob
    import os

    from gdal_spark.operators import checkpoint as CP
    from gdal_spark.streaming.ingest import stage_page_files, stream_to_table, synthetic_page_stream

    inbox = str(tmp_path / "inbox_cmp")
    table = str(tmp_path / "table_cmp")
    # three separate staged drops → three micro-batches → 3× file sets
    for i, n in enumerate((100, 120, 80)):
        stage_page_files(spark, os.path.join(inbox, f"d{i}"), n=n)
    q = (
        stream_to_table(
            synthetic_page_stream(spark, inbox + "/*"), table, ["lang"],
            str(tmp_path / "ck_cmp"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def data_files():
        return [
            f
            for f in glob.glob(os.path.join(table, "lang=*", "*"))
            if not os.path.basename(f).startswith(("_", "."))
        ]

    before_files = data_files()
    before = sorted(
        (r.url, r.lang)
        for r in CP.read_committed(spark, table, ["lang"]).collect()
    )
    old_runs = [
        r.run_id for r in CP.read_manifest(spark, table).select("run_id").distinct().collect()
    ]
    n_langs = len({lang for _u, lang in before})
    assert len(before_files) > n_langs  # genuinely fragmented

    rid = CP.compact_table(spark, table, ["lang"])
    after_files = data_files()
    assert len(after_files) == n_langs  # one file per partition value
    after = sorted(
        (r.url, r.lang)
        for r in CP.read_committed(spark, table, ["lang"]).collect()
    )
    assert after == before
    # as_of: compaction snapshot readable, prior snapshots expired
    assert CP.read_committed(spark, table, ["lang"], as_of=rid).count() == len(before)
    with pytest.raises(ValueError):
        CP.read_committed(spark, table, ["lang"], as_of=old_runs[0])
    # idempotent: a second compaction is a no-op file-count-wise
    CP.compact_table(spark, table, ["lang"])
    assert len(data_files()) == n_langs
    assert CP.read_committed(spark, table, ["lang"]).count() == len(before)


def test_vacuum_table_orphans(spark, tmp_path):
    """vacuum removes crash leftovers (orphan part files + dead staging
    dirs) and nothing else; the committed view is unchanged."""
    import os

    from gdal_spark.operators import checkpoint as CP

    table = str(tmp_path / "table_vac")
    txn = CP.start_transaction(spark, table)
    txn.write(
        spark.range(50).selectExpr("id", "cast(id % 3 as string) g"), ["g"]
    )
    txn.commit()
    before = sorted(r.id for r in CP.read_committed(spark, table, ["g"]).collect())

    # crash artifacts: an orphan part file inside a live partition dir
    # and a dead staging tree from a writer that never committed
    orphan = os.path.join(table, "g=1", "part-orphan.parquet")
    spark.range(5).selectExpr("id", "'x' extra").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "junk"))
    import glob, shutil
    src = glob.glob(str(tmp_path / "junk" / "part-*.parquet"))[0]
    shutil.copy(src, orphan)
    os.makedirs(os.path.join(table, "_staging", "deadtxn"), exist_ok=True)
    shutil.copy(src, os.path.join(table, "_staging", "deadtxn", "p.parquet"))

    removed = CP.vacuum_table(spark, table)
    assert "_staging" in removed and os.path.join("g=1", "part-orphan.parquet") in removed
    assert not os.path.exists(orphan)
    after = sorted(r.id for r in CP.read_committed(spark, table, ["g"]).collect())
    assert after == before
    # second vacuum: nothing left to remove
    assert CP.vacuum_table(spark, table) == []


def test_streaming_decontaminate_batch_parity(spark, tmp_path):
    """decontaminate_stream drops exactly the pages the batch
    lsh_decontaminate flags — fuzzy decontamination at ingest time is
    stateless, so streaming and batch answers are identical row sets."""
    from gdal_spark.operators.webtext import lsh_decontaminate
    from gdal_spark.streaming.ingest import (
        decontaminate_stream,
        stage_page_files,
        synthetic_page_stream,
    )

    path = str(tmp_path / "inbox_dc")
    stage_page_files(spark, path, n=300)
    batch = spark.read.parquet(path)
    bench = batch.where("cast(split(text, ' ')[2] as int) % 7 = 0").select("text")
    q = (
        decontaminate_stream(synthetic_page_stream(spark, path), bench, k=3)
        .writeStream.format("memory")
        .queryName("stream_decon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url for r in spark.table("stream_decon").collect()}
    flagged = lsh_decontaminate(batch, bench, k=3)
    want = {r.url for r in flagged.where("not contaminated").collect()}
    assert got == want
    assert 0 < len(got) < 300  # benchmark members really were dropped
    # schema unchanged by the filter
    assert spark.table("stream_decon").columns == batch.columns


def test_streaming_near_dup_simhash(spark, tmp_path):
    """Streaming SimHash near-dup suppression keeps exactly one page
    per signature, and every surviving page carries the signature the
    batch dedup_simhash path computes for it."""
    from gdal_spark.operators.dedup import simhash
    from gdal_spark.streaming.ingest import (
        near_dup_stream,
        stage_page_files,
        synthetic_page_stream,
    )

    path = str(tmp_path / "inbox_nd")
    stage_page_files(spark, path, n=400)
    q = (
        near_dup_stream(synthetic_page_stream(spark, path), bits=12)
        .writeStream.format("memory")
        .queryName("stream_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("stream_neardup").collect()
    batch = spark.read.parquet(path).withColumnRenamed("url", "doc_id")
    want_sigs = {r.simhash for r in simhash(batch, bits=12).collect()}
    got_sigs = {r.simhash for r in out}
    assert got_sigs == want_sigs          # one survivor per distinct signature
    assert len(out) == len(want_sigs)     # and ONLY one
    assert 0 < len(out) < 400             # 12-bit sigs on 3-token docs do collide
    by_url = {r.doc_id: r.simhash for r in simhash(batch, bits=12).collect()}
    assert all(by_url[r.url] == r.simhash for r in out)


def test_pagerank_matches_reference_iteration(spark):
    """pagerank vs an independent plain-Python power iteration with the
    same dangling handling (node 5 is dangling; node 9 has no in-links
    but emits one, exercising both boundary shapes)."""
    from gdal_spark.operators.graph import pagerank

    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 5),
        (9, 1), (2, 3),  # parallel edge: counts with multiplicity
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: float(r["pr"])
        for r in pagerank(e, iters=5).collect()
    }

    nodes = sorted({n for ab in edges for n in ab})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        dmass = sum(pr[v] for v in nodes if v not in outdeg)
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] / outdeg[s]
        pr = {
            v: 0.15 / n + 0.85 * (contrib[v] + dmass / n) for v in nodes
        }
    assert set(out) == set(nodes)
    for v in nodes:
        assert out[v] == pytest.approx(pr[v], abs=1e-9)


def test_pagerank_mass_conserved(spark):
    from gdal_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(20) if i % 4 != 0],
        "src long, dst long",
    )
    prs = [float(r["pr"]) for r in pagerank(e, iters=4).collect()]
    assert sum(prs) == pytest.approx(1.0, abs=1e-6)


def test_resize_media_and_image_features(spark):
    """Resize: identity at source size, exact 2x2 block average at
    half-scale on a planted checkerboard; features: constants on flat
    and step images; non-decodable payloads poison-pill per row."""
    import hashlib

    import numpy as np

    from gdal_spark.operators import multimodal as M

    flat = np.full((16, 16), 100, dtype=np.uint8)
    step = np.zeros((16, 16), dtype=np.uint8)
    step[:, 8:] = 200
    rows = [
        (1, "image", 16, 16, 1, bytearray(M.encode_pgm(flat))),
        (2, "image", 16, 16, 1, bytearray(M.encode_pgm(step))),
        (3, "image", 16, 16, 1, bytearray(b"GIF89a not supported")),
        (4, "audio", 256, 1, 1, bytearray(M.encode_wav(
            np.zeros(256, dtype=np.int16), 8000))),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)

    # identity resize: bytes round-trip exactly
    ident = {r.doc_id: r for r in M.resize_media(media, 16, 16).collect()}
    assert ident[1].resized_md5 == hashlib.md5(flat.tobytes()).hexdigest()
    assert ident[2].resized_md5 == hashlib.md5(step.tobytes()).hexdigest()
    assert ident[3].error and ident[3].resized_md5 is None
    assert 4 not in ident  # audio rows filtered out

    # half-scale of a 2x2-constant image == block average (bilinear at
    # exact center sampling); flat stays flat
    half = {r.doc_id: r for r in M.resize_media(media, 8, 8).collect()}
    assert half[1].mean == 100.0
    got = M.bilinear_resize(step, 8, 8)
    want = step.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    assert np.array_equal(got.astype(np.float64), want)

    feats = {r.doc_id: r for r in M.image_features(media).collect()}
    assert feats[1].contrast == 0.0 and feats[1].edge_energy == 0.0
    assert feats[1].hist_entropy == 0.0  # single bin
    assert feats[2].edge_energy > 0.0 and feats[2].contrast == 100.0
    assert feats[3].error


def test_resize_poison_pills_and_tiny_images(spark):
    """Truncated/corrupt containers land in the error column (not a
    stage failure); sub-3x3 images get edge_energy 0.0, not NaN."""
    import numpy as np

    from gdal_spark.operators import multimodal as M

    tiny = np.array([[10, 200], [60, 90]], dtype=np.uint8)
    rows = [
        (1, "image", 2, 2, 1, bytearray(M.encode_pgm(tiny))),
        (2, "image", 16, 16, 1, bytearray(b"\x89PNG\r\n\x1a\n\x00\x00")),
        (3, "image", 16, 16, 1, bytearray(b"\xff\xd8\xff\xc0\x00")),
        (4, "image", 0, 0, 1, bytearray(b"P5\n0 0\n255\n")),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    res = {r.doc_id: r for r in M.resize_media(media, 4, 4).collect()}
    assert res[1].error is None and res[1].resized_md5
    assert res[2].error and res[3].error and res[4].error
    feats = {r.doc_id: r for r in M.image_features(media).collect()}
    assert feats[1].edge_energy == 0.0 and feats[1].error is None
    assert feats[1].contrast > 0.0
    assert feats[2].error and feats[3].error

def test_dbscan_matches_brute_force_and_is_layout_stable(spark):
    """Planted two dense blobs + sparse noise: cluster sets, roles and
    labels equal the O(n^2) brute-force reference; identical output
    under a different partitioning; border points take the MIN cluster
    among their core neighbors."""
    import numpy as np

    from gdal_spark.operators.dbscan import dbscan

    rng = np.random.default_rng(11)
    blob_a = rng.normal((0.0, 0.0), 0.05, size=(30, 2))
    blob_b = rng.normal((3.0, 3.0), 0.05, size=(25, 2))
    # fringe points: placed 0.19 beyond each blob's outermost-x member,
    # so they reach exactly that member (a core point) but are far too
    # sparse to be core themselves -> border by construction
    fringe = np.array(
        [
            blob_a[blob_a[:, 0].argmax()] + [0.19, 0.0],
            blob_b[blob_b[:, 0].argmax()] + [0.19, 0.0],
        ]
    )
    noise = np.array([[10.0, -5.0], [-8.0, 7.0], [6.0, -6.0]])
    pts = np.vstack([blob_a, blob_b, fringe, noise])
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    eps, min_pts = 0.2, 4
    got = {r.id: r for r in dbscan(df, eps, min_pts).collect()}

    # brute force reference with the SAME deterministic rules
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    nbrm = (d2 <= eps * eps) & ~np.eye(len(pts), dtype=bool)
    core = nbrm.sum(1) + 1 >= min_pts
    # components over core-core adjacency
    label = {i: i for i in range(len(pts)) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in label:
            for j in label:
                if nbrm[i, j] and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    want = {}
    for i in range(len(pts)):
        if core[i]:
            want[i] = (label[i], "core")
        else:
            cn = [label[j] for j in label if nbrm[i, j]]
            want[i] = (min(cn), "border") if cn else (None, "noise")
    for i, (cl, role) in want.items():
        assert (got[i].cluster_id, got[i].role) == (cl, role), i
    roles = {v[1] for v in want.values()}
    assert roles == {"core", "border", "noise"}, roles  # fixture sanity
    assert len({v[0] for v in want.values() if v[0] is not None}) == 2

    got2 = {r.id: r for r in dbscan(df.repartition(13), eps, min_pts).collect()}
    assert {k: (v.cluster_id, v.role) for k, v in got.items()} == {
        k: (v.cluster_id, v.role) for k, v in got2.items()
    }
