"""Multimodal plumbing: binary payload columns + Arrow-batched decode.

The decode itself is stubbed (no codec libs in this container); what's
under test is the real Spark surface: schema, mapInPandas batching,
determinism, and null/corrupt handling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import multimodal
from bigdata_googleplaystore_spark.sources import load_table


def test_payload_roundtrip_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs, "text", "doc_id")
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload"]

    feats = multimodal.decode_features(media)
    assert feats.schema == multimodal.FEATURE_SCHEMA

    # deterministic: features equal an independent driver-side computation
    # for a sample row
    row = docs.orderBy("doc_id").first()
    got = feats.filter(F.col("media_id") == row["doc_id"]).first()
    payload = row["text"].encode("utf-8")
    assert got["n_bytes"] == len(payload)
    assert got["sha_prefix"] == hashlib.sha256(payload).hexdigest()[:8]
    assert got["feat_mean"] == sum(payload[:64]) // max(1, min(len(payload), 64))


def test_decode_raises_on_corrupt_payload(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = multimodal.attach_binary_payload(docs, "text", "doc_id").withColumn(
        "payload", F.lit(None).cast("binary")
    )
    with pytest.raises(Exception, match="real decoder required"):
        multimodal.decode_features(media).collect()


def test_resize_images_schema_and_determinism(spark, sf_dir):
    from bigdata_googleplaystore_spark.operators import multimodal
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    media = multimodal.attach_binary_payload(d, "text", "doc_id")
    out = multimodal.resize_images(media, out_w=8, out_h=8)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["out_w"] == 8 and r["out_h"] == 8
        assert r["payload"] is not None and len(r["payload"]) <= 64
    # deterministic: second run byte-identical
    again = {r["media_id"]: bytes(r["payload"]) for r in out.collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in rows)


def test_sample_frames_fanout(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import multimodal
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.attach_binary_payload(d, "text", "doc_id")
    frames = multimodal.sample_frames(media, n_frames=4)
    per_media = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert len(per_media) == 20
    assert all(r["n"] == 4 for r in per_media)  # docs are >=4 bytes
    idx = frames.select("frame_idx").distinct().collect()
    assert sorted(r["frame_idx"] for r in idx) == [0, 1, 2, 3]


def test_observe_metrics_no_extra_scan(spark, sf_dir):
    """quality.with_metrics: metrics come from the SAME pass that produced
    the output and match a direct aggregate."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import quality
    from bigdata_googleplaystore_spark.sources import load_table

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
    same payload bytes, with the exact ceil(samples/256) fan-out."""
    import numpy as np

    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.sources import load_table
    from pyspark.sql import functions as F

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    got: dict = {}
    for r in QUERIES["multimodal_audio_rms"].fn(spark, sf_dir).collect():
        got[(r["media_id"], r["window_idx"])] = r
    seen_media = {k[0] for k in got}
    for doc_id, text in texts.items():
        b = text.encode("utf-8")
        b = b[: len(b) // 2 * 2]
        x = np.frombuffer(b, dtype="<i2").astype(np.int64)
        n_win = (x.size + 255) // 256
        if x.size == 0:
            assert doc_id not in seen_media
            continue
        for wi in range(n_win):
            w = x[wi * 256 : (wi + 1) * 256]
            r = got[(doc_id, wi)]
            assert r["n_samples"] == w.size
            assert r["peak"] == int(np.abs(w).max())
            assert abs(r["rms"] - round(float(np.sqrt(np.mean(w.astype(np.float64) ** 2))), 6)) < 1e-9
        assert (doc_id, n_win) not in got  # no extra windows
