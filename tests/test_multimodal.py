"""Multimodal header decode: byte-level parser edge cases the registry
oracle (which only sees well-formed synthesized containers) can't reach —
truncated headers, SOF-less JPEGs, empty payloads, multi-segment scans."""

from __future__ import annotations

import struct

import pytest

from questdb_spark.pipeline import multimodal
from questdb_spark.pipeline.multimodal import _gif, _jpeg, _png, _scan_jpeg_sof


def test_jpeg_scan_skips_multiple_segments():
    # SOI + APP0 + two COM segments of different lengths before SOF0
    body = b"\xff\xd8"
    body += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    body += b"\xff\xfe" + struct.pack(">H", 5) + b"abc"
    body += b"\xff\xfe" + struct.pack(">H", 2)
    body += (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    assert _scan_jpeg_sof(body) == (640, 480)


def test_jpeg_scan_progressive_sof2():
    body = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 17) + b"\x08"
    body += struct.pack(">HH", 32, 64) + b"\x00" * 10
    assert _scan_jpeg_sof(body) == (64, 32)


def test_jpeg_scan_no_sof_returns_sentinel():
    assert _scan_jpeg_sof(b"\xff\xd8\xff\xd9") == (-1, -1)
    assert _scan_jpeg_sof(b"\xff\xd8") == (-1, -1)
    assert _scan_jpeg_sof(b"\xff\xd8\xff\xda\x00\x04ab") == (-1, -1)
    # garbage after SOI (no 0xFF marker prefix)
    assert _scan_jpeg_sof(b"\xff\xd8zzzz") == (-1, -1)


def test_builders_roundtrip_dimensions():
    assert _png(1920, 1080, b"x")[16:24] == struct.pack(">II", 1920, 1080)
    g = _gif(320, 200, b"")
    assert struct.unpack("<HH", g[6:10]) == (320, 200)
    assert _scan_jpeg_sof(_jpeg(123, 45, b"some body bytes")) == (123, 45)


@pytest.mark.usefixtures("spark")
def test_decode_image_edge_payloads(spark):
    rows = [
        (0, _png(640, 480, b"body")),
        (1, _jpeg(100, 50, b"")),
        (2, _gif(10, 20, b"tail")),
        (3, b""),                      # empty payload
        (4, b"\x89PNG\r\n\x1a\n short"),  # truncated PNG (< 24 bytes)
        (5, b"\xff\xd8\xff\xd9"),      # JPEG with no SOF → unknown fallback
        (6, b"plain text, no magic"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.decode_image(df).collect()}

    assert (out[0]["format"], out[0]["width"], out[0]["height"]) == ("png", 640, 480)
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("jpeg", 100, 50)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("gif", 10, 20)
    assert out[0]["checksum"] is None and out[2]["checksum"] is None

    for bad in (3, 4, 5, 6):
        assert out[bad]["width"] is None and out[bad]["height"] is None
        assert out[bad]["checksum"] is not None
    assert out[3]["checksum"] == 0
    assert out[5]["format"] == "jpeg"  # magic says jpeg even without SOF
    assert out[6]["format"] == "unknown"
    assert out[6]["n_bytes"] == len(b"plain text, no magic")


def test_video_frame_sampling_and_resize(spark):
    """r9 frame pipeline: container build → every-2nd frame explode →
    header-true half resize → decode reads the resized dims from bytes."""
    from pyspark.sql import functions as F

    from questdb_spark.pipeline import multimodal as mm
    from questdb_spark.sources.parquet import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    vids = mm.synthesize_video(docs)
    frames = mm.sample_frames(vids, every=2)
    rows = frames.select("doc_id", "n_frames", "frame_idx").collect()
    for r in rows:
        assert r["n_frames"] == 2 + r["doc_id"] % 4
        assert r["frame_idx"] % 2 == 0 and r["frame_idx"] < r["n_frames"]
    # per-doc sampled count = ceil(n_frames / 2)
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    for d, n in per_doc.items():
        assert n == (2 + d % 4 + 1) // 2
    # resize halves the header dims; decode reads them back from bytes
    small = mm.resize_image(frames, num=1, den=2)
    dec = mm.decode_image(
        small.select(
            (F.col("doc_id") * 8 + F.col("frame_idx")).alias("doc_id"),
            F.col("frame").alias("payload"),
        )
    )
    for r in dec.collect():
        d, i = r["doc_id"] // 8, r["doc_id"] % 8
        w, h = mm._frame_dims(d, i)
        assert r["format"] == "png"
        assert (r["width"], r["height"]) == (w // 2, h // 2)


def test_frame_features_byte_histogram(spark):
    """frame_features equals a python-side byte histogram, L1-normalized."""
    import numpy as np

    from questdb_spark.pipeline import multimodal as mm
    from questdb_spark.sources.parquet import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    frames = mm.sample_frames(mm.synthesize_video(docs), every=2)
    feats = mm.frame_features(frames, bins=16)
    got = {
        (r["doc_id"], r["frame_idx"]): r["features"] for r in feats.collect()
    }
    raw = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in frames.collect()}
    assert set(got) == set(raw)
    for k, buf in raw.items():
        a = np.frombuffer(buf, dtype=np.uint8)
        hist = np.bincount(a // 16, minlength=16)[:16]
        want = (hist / hist.sum()).tolist()
        assert np.allclose(got[k], want)
        assert abs(sum(got[k]) - 1.0) < 1e-9


def test_raster_resize_pixel_true(spark):
    """QR01 nearest-neighbor resample is pixel-exact: downscale 1/2 picks
    source (2y,2x); upscale 2/1 repeats each pixel; odd dims floor."""
    import numpy as np
    import struct
    from questdb_spark.pipeline import multimodal as mm

    df = spark.createDataFrame([(3,), (4,)], ["doc_id"])
    rasters = mm.synthesize_raster(df)
    rows = {r.doc_id: bytes(r.payload) for r in rasters.collect()}
    for doc_id, buf in rows.items():
        w, h = struct.unpack(">II", buf[4:12])
        assert w == 8 + doc_id * 7 % 24 and h == 8 + doc_id * 13 % 16
        px = np.frombuffer(buf[12:], dtype=np.uint8)
        assert px.size == w * h
        assert (px == (doc_id + np.arange(w * h) * 31) % 251).all()
    # downscale: every resized pixel equals the formula at (2y, 2x)
    small = {r.doc_id: bytes(r.payload)
             for r in mm.resize_image(rasters, 1, 2, "payload").collect()}
    for doc_id, buf in small.items():
        w = 8 + doc_id * 7 % 24
        w2, h2 = struct.unpack(">II", buf[4:12])
        got = np.frombuffer(buf[12:], dtype=np.uint8).reshape(h2, w2)
        for y in (0, h2 - 1):
            for x in (0, w2 - 1):
                assert got[y, x] == (doc_id + (2 * y * w + 2 * x) * 31) % 251
    # upscale 2/1 repeats pixels: out(y,x) = in(y//2, x//2)
    big = {r.doc_id: bytes(r.payload)
           for r in mm.resize_image(rasters, 2, 1, "payload").collect()}
    for doc_id, buf in big.items():
        w = 8 + doc_id * 7 % 24
        w2, h2 = struct.unpack(">II", buf[4:12])
        assert w2 == 2 * w
        got = np.frombuffer(buf[12:], dtype=np.uint8).reshape(h2, w2)
        assert got[1, 1] == got[0, 0] == doc_id % 251


def test_audio_features_windowed(spark):
    """QA01 PCM container: frame energy / strict zero-crossings / peak are
    integer-exact vs a direct numpy recomputation; trailing partial frames
    drop; corrupt payloads skip rows instead of failing the job."""
    import numpy as np
    import struct
    from questdb_spark.pipeline import multimodal as mm

    df = spark.createDataFrame([(2,), (9,)], ["doc_id"])
    audio = mm.synthesize_audio(df)
    rows = mm.audio_features(audio, frame=128).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        n = 256 + doc_id % 7 * 64
        assert len(frames) == n // 128
        smp = ((doc_id + np.arange(n, dtype=np.int64) * 37) % 199) - 99
        for r in sorted(frames, key=lambda r: r.frame_idx):
            a = smp[r.frame_idx * 128 : (r.frame_idx + 1) * 128]
            assert r.energy == int((a * a).sum())
            assert r.zero_crossings == int(((a[:-1] * a[1:]) < 0).sum())
            assert r.peak == int(np.abs(a).max())
            assert r.sample_rate == 8000 + doc_id % 3 * 4000
    # corrupt container: declared n_samples past the buffer -> row skipped
    bad = spark.createDataFrame(
        [(1, mm.AUDIO_MAGIC + struct.pack(">II", 8000, 10_000) + b"xy")],
        "doc_id long, payload binary",
    )
    assert mm.audio_features(bad).count() == 0
