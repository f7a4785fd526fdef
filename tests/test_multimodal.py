"""Multimodal plumbing: binary payload columns + Arrow-batched REAL decode.

Round 4: the codecs are real (operators/codecs.py — pure-stdlib PNG, BMP,
WAV writers/parsers), so these tests check actual container round-trips,
cross-codec agreement, foreign-encoder decode (all five PNG filter types),
golden byte fixtures, and fail-loud behavior on corrupt payloads — on top
of the Spark surface (schema, mapInPandas batching, determinism)."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import codecs, multimodal
from bigdata_googleplaystore_spark.sources import load_table


# ----------------------------------------------------------------------
# Codec unit level (no Spark): round-trips, goldens, foreign inputs
# ----------------------------------------------------------------------


def test_codec_roundtrips_pixel_exact():
    data = bytes(range(200)) + b"hello world"
    for enc, dec, kind in [
        (codecs.encode_png_gray, codecs.decode_png_gray, "png"),
        (codecs.encode_bmp_gray, codecs.decode_bmp_gray, "bmp"),
    ]:
        payload = enc(data, 16)
        assert codecs.sniff(payload) == kind
        w, h, px = dec(payload)
        assert (w, h) == (16, -(-len(data) // 16))
        assert px == data.ljust(16 * h, b"\x00")


def test_wav_roundtrip_and_stdlib_wave_agreement():
    """Our RIFF writer must parse back sample-exact AND be readable by
    the stdlib `wave` module (independent spec conformance check)."""
    import io
    import wave

    import numpy as np

    samples = [(x - 128) * 128 for x in bytes(range(256))]
    payload = codecs.encode_wav_pcm16(samples, 8000)
    assert codecs.sniff(payload) == "wav"
    rate, out = codecs.decode_wav_pcm16(payload)
    assert rate == 8000 and out.tolist() == samples
    wf = wave.open(io.BytesIO(payload))
    assert (wf.getnchannels(), wf.getsampwidth(), wf.getframerate()) == (1, 2, 8000)
    assert np.frombuffer(wf.readframes(wf.getnframes()), "<i2").tolist() == samples


def test_wav_decoder_skips_foreign_chunks():
    """A LIST chunk between fmt and data (common in real files) must be
    walked over, not crash the parse."""
    payload = codecs.encode_wav_pcm16([1, -2, 3], 8000)
    fmt_at = payload.index(b"fmt ")
    data_at = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    hacked = payload[:data_at] + extra + payload[data_at:]
    hacked = hacked[:4] + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    assert fmt_at < data_at
    rate, out = codecs.decode_wav_pcm16(hacked)
    assert rate == 8000 and out.tolist() == [1, -2, 3]


def test_png_decoder_handles_all_filter_types():
    """Decode a hand-built PNG whose five rows use filter types 0-4 —
    proves the parser reads third-party encodings, not just its own
    filter-0 output."""
    w = 4
    rows = [
        bytes([10, 20, 30, 40]),
        bytes([5, 5, 5, 5]),
        bytes([1, 2, 3, 4]),
        bytes([100, 100, 100, 100]),
        bytes([7, 8, 9, 10]),
    ]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw, prev = b"", None
    for ftype, line in enumerate(rows):
        enc = bytearray([ftype])
        for i, x in enumerate(line):
            left = line[i - 1] if i else 0
            up = prev[i] if prev else 0
            ul = prev[i - 1] if (prev and i) else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) // 2,
                4: paeth(left, up, ul),
            }[ftype]
            enc.append((x - pred) & 0xFF)
        raw += bytes(enc)
        prev = line
    png = (
        codecs.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, len(rows), 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert codecs.decode_png_gray(png) == (w, len(rows), b"".join(rows))


def test_golden_bytes_stable():
    """Byte-level goldens: the encoders' output for a fixed input is
    pinned, so silent format drift (header field, filter choice,
    compression level) is caught as a diff, not discovered downstream."""
    import hashlib

    data = b"spark-graft golden fixture"
    assert hashlib.md5(codecs.encode_png_gray(data, 16)).hexdigest() == (
        _GOLDEN["png"]
    )
    assert hashlib.md5(codecs.encode_bmp_gray(data, 16)).hexdigest() == (
        _GOLDEN["bmp"]
    )
    samples = [(b - 128) * 128 for b in data]
    assert hashlib.md5(codecs.encode_wav_pcm16(samples, 8000)).hexdigest() == (
        _GOLDEN["wav"]
    )


_GOLDEN = {
    "png": "d516f404a950940043b4b2c05f20f6cd",
    "bmp": "8ae22bbcaac5bddf50c66ccc5234eabe",
    "wav": "4ea1a9994697a43f27004154c29ab791",
}


def test_corrupt_payloads_fail_loudly():
    good = codecs.encode_png_gray(b"abcdef", 4)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte of IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png_gray(bytes(bad_crc))
    with pytest.raises(ValueError, match="magic"):
        codecs.decode_bmp_gray(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav_pcm16(b"nope")
    truncated = codecs.encode_bmp_gray(b"abcdef", 4)[:-8]
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_bmp_gray(truncated)


# ----------------------------------------------------------------------
# Spark surface: schema, batching, determinism, fail-loud
# ----------------------------------------------------------------------


def test_payload_roundtrip_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_media_payload(docs, "text", "doc_id")
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload"]

    feats = multimodal.decode_features(media)
    assert feats.schema == multimodal.FEATURE_SCHEMA

    # decoded metadata equals an independent driver-side computation
    rows = {r["doc_id"]: r["text"] for r in docs.limit(6).collect()}
    got = {r["media_id"]: r for r in feats.collect()}
    for doc_id, text in rows.items():
        data = text.encode("utf-8")
        r = got[doc_id]
        if doc_id % 3 == 2:
            assert r["media_type"] == "audio/wav"
            assert r["n_samples"] == len(data)
            assert r["sample_sum"] == sum((b - 128) * 128 for b in data)
            assert r["width"] is None and r["px_sum"] is None
        else:
            h = -(-len(data) // 16)
            assert r["media_type"] == ("image/png" if doc_id % 3 == 0 else "image/bmp")
            assert (r["width"], r["height"]) == (16, h)
            assert r["px_sum"] == sum(data)
            assert r["n_samples"] is None


def test_decode_raises_on_corrupt_payload(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = multimodal.attach_media_payload(docs, "text", "doc_id").withColumn(
        "payload", F.lit(b"not a container").cast("binary")
    )
    with pytest.raises(Exception, match="unknown or absent container"):
        multimodal.decode_features(media).collect()


def test_resize_images_real_nearest_neighbor(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 != 2).limit(40)
    media = multimodal.attach_media_payload(d, "text", "doc_id")
    out = multimodal.resize_images(media, out_w=8, out_h=8)
    rows = out.collect()
    assert len(rows) == 40
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for r in rows:
        assert r["out_w"] == 8 and r["out_h"] == 8
        w, h, px = codecs.decode_png_gray(bytes(r["payload"]))
        assert (w, h) == (8, 8)
        # verify against a driver-side nearest-neighbor reimplementation
        data = texts[r["media_id"]].encode("utf-8")
        src_h = -(-len(data) // 16)
        grid = data.ljust(16 * src_h, b"\x00")
        expect = bytes(
            grid[((rr * src_h) // 8) * 16 + ((cc * 16) // 8)]
            for rr in range(8)
            for cc in range(8)
        )
        assert px == expect


def test_sample_frames_fanout(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 != 2).limit(20)
    media = multimodal.attach_media_payload(d, "text", "doc_id")
    frames = multimodal.sample_frames(media, n_frames=4)
    per_media = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert len(per_media) == 20
    # docs are >= 48 bytes -> >= 3 rows tall; fan-out = min(4, height)
    heights = {
        r["doc_id"]: -(-len(r["text"].encode()) // 16) for r in d.collect()
    }
    for r in per_media:
        assert r["n"] == min(4, heights[r["media_id"]])


def test_observe_metrics_no_extra_scan(spark, sf_dir):
    """quality.with_metrics: metrics come from the SAME pass that produced
    the output and match a direct aggregate."""
    from bigdata_googleplaystore_spark.operators import quality

    d = load_table(spark, sf_dir, "documents")
    observed, obs = quality.with_metrics(
        d,
        "doc_metrics",
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_text"),
    )
    kept = observed.filter(F.col("source").isNotNull()).count()
    m = obs.get
    assert m["n_rows"] == d.count()  # observed BEFORE the filter
    assert m["null_text"] == d.filter(F.col("text").isNull()).count()
    assert kept <= m["n_rows"]


def test_audio_window_rms_matches_numpy(spark, sf_dir):
    """Windowed PCM RMS/peak must equal a numpy reimplementation over the
    same (byte-128)*128 samples, with the exact ceil(n/256) fan-out —
    independent of the SQL oracle."""
    import numpy as np

    from bigdata_googleplaystore_spark.catalog import QUERIES

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    got: dict = {}
    for r in QUERIES["multimodal_audio_rms"].fn(spark, sf_dir).collect():
        got[(r["media_id"], r["window_idx"])] = r
    for doc_id, text in texts.items():
        x = np.array([(b - 128) * 128 for b in text.encode("utf-8")], dtype=np.int64)
        n_win = (x.size + 255) // 256
        for wi in range(n_win):
            w = x[wi * 256 : (wi + 1) * 256]
            r = got[(doc_id, wi)]
            assert r["n_samples"] == w.size
            assert r["peak"] == int(np.abs(w).max())
            assert abs(
                r["rms"] - round(float(np.sqrt(np.mean(w.astype(np.float64) ** 2))), 6)
            ) < 1e-9
        assert (doc_id, n_win) not in got  # no extra windows


def test_image_ahash_matches_pure_python_reference(spark):
    """Property check: Spark's Arrow-batched aHash equals an independent
    pure-Python re-derivation (plain loops, no numpy) on 40 random gray
    images of varied size — catching resample index drift, mean-threshold
    tie handling, and bit-packing order."""
    import random

    from bigdata_googleplaystore_spark.operators import codecs, multimodal

    rng = random.Random(0xA5A5)
    rows, expected = [], {}
    for mid in range(40):
        w = rng.choice([8, 11, 16, 16, 23])
        h = rng.randrange(8, 40)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        rows.append((mid, "image/png", codecs.encode_png_gray(px, w)))
        # independent reference: nearest-neighbor grid, exact-int mean test,
        # MSB-first row-major packing, signed-64 wrap
        grid = 8
        cells = []
        for i in range(grid):
            for j in range(grid):
                cells.append(px[((i * h) // grid) * w + (j * w) // grid])
        total, n = sum(cells), len(cells)
        val = 0
        for c in cells:
            val = (val << 1) | (1 if c * n > total else 0)
        if val >= 1 << 63:
            val -= 1 << 64
        expected[mid] = val
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["ahash"] for r in multimodal.image_ahash(media).collect()}
    assert got == expected


def test_image_ahash_rejects_oversized_grid(spark):
    import pytest

    from bigdata_googleplaystore_spark.operators import multimodal

    media = spark.createDataFrame([], multimodal.MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="64 bits"):
        multimodal.image_ahash(media, grid=9)
