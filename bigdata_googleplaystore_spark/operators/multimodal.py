"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's contract for image/audio/video data at 100 TB:

- payloads live in a `binary` column next to typed metadata columns
  (media_type, width/height/duration, codec) — never parsed strings;
- all decode / feature-extraction happens in Arrow-batched functions over
  `mapInPandas` so bytes move executor-side in columnar batches, never
  through the driver and never row-at-a-time;
- partitioning by a content-hash prefix spreads large payloads evenly
  (payload sizes are skewed; key-salting by digest prefix is free here).

The image/audio codec libraries are not available in this container, so
`decode_image_batch` is a clearly-marked STUB wired through the real Spark
plumbing (schema, batching, partitioning are all live and tested); swap
`_fake_decode` for a real decoder (PIL/ffmpeg) in production images.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha_prefix", StringType(), True),
        StructField("feat_mean", LongType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from a text table for testing: payload =
    utf-8 bytes (a deterministic stand-in for image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder: deterministic byte statistics standing in for a real
    image decode (PIL etc. not installed in this container). Raises on
    None payloads like a real decoder would on corrupt bytes."""
    if payload is None:
        raise NotImplementedError("corrupt/absent payload: real decoder required")
    return {"n_bytes": len(payload), "feat_mean": sum(payload[:64]) // max(1, min(len(payload), 64))}


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    Real plumbing: columnar batches executor-side, output schema typed and
    stable; only `_fake_decode` is a stub. Payload-skew note: upstream
    should repartition by sha_prefix for even batch sizes."""
    import hashlib

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [],
                "sha_prefix": [],
                "feat_mean": [],
            }
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else None
                feats = _fake_decode(b)
                out["n_bytes"].append(feats["n_bytes"])
                out["sha_prefix"].append(hashlib.sha256(b).hexdigest()[:8])
                out["feat_mean"].append(feats["feat_mean"])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("out_w", LongType(), True),
        StructField("out_h", LongType(), True),
    ]
)


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Resize stage: STUB transform (deterministic byte subsample standing
    in for a real PIL/opencv resize — libs absent in this container); the
    Spark plumbing (Arrow batches in, binary column out, stable typed
    schema) is the real contract a production decoder drops into."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        target = out_w * out_h
        for pdf in it:
            payloads = []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    continue
                b = bytes(p)
                stride = max(1, len(b) // target)
                payloads.append(b[::stride][:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (media_id, frame_idx, frame bytes). STUB frame extraction
    (equal-size byte slices in place of ffmpeg keyframes); real contract:
    a 1->N mapInPandas fan-out whose output count is data-dependent —
    the shape a video pipeline needs (explode happens *inside* the Arrow
    batch, never via a driver loop)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                step = max(1, len(b) // n_frames)
                for i in range(min(n_frames, len(b))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(batches, FRAME_SCHEMA)


def payload_stats_arrow(media: DataFrame) -> DataFrame:
    """Arrow-native metadata pass (mapInArrow): payload byte lengths and
    empty/null accounting computed directly on Arrow buffers with
    pyarrow.compute — no pandas materialization, no per-row python
    objects. This is the hot-path shape for byte-heavy media tables
    where even the Arrow->pandas bridge is measurable overhead: the
    binary column's buffers are read in place and never copied."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            n_bytes = pc.binary_length(batch.column("payload"))
            yield pa.record_batch(
                [
                    batch.column("media_id"),
                    pc.cast(n_bytes, pa.int64()),
                    pc.is_null(batch.column("payload")),
                ],
                names=["media_id", "n_bytes", "payload_missing"],
            )

    return media.mapInArrow(
        stats, "media_id long, n_bytes long, payload_missing boolean"
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_idx", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", LongType(), True),
    ]
)


def audio_window_rms(media: DataFrame, window_samples: int = 256) -> DataFrame:
    """Audio branch of the multimodal suite: interpret each payload as
    16-bit little-endian PCM and emit per-window RMS energy + peak — the
    silence-detection / loudness-normalization primitive of an audio
    curation pipeline.

    Like the image ops above, the CODEC is the stand-in (real containers
    need ffmpeg/soundfile, absent here — payload bytes are read as raw
    samples), while the Spark plumbing is real and tested: Arrow batches
    executor-side, numpy frombuffer + vectorized window reduction, typed
    output schema, ceil(samples/window) rows per clip. An odd trailing
    byte is truncated the way a real PCM reader would."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {
                "media_id": [],
                "window_idx": [],
                "n_samples": [],
                "rms": [],
                "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                b = b[: len(b) // 2 * 2]
                x = np.frombuffer(b, dtype="<i2").astype(np.int64)
                for wi in range(0, x.size, window_samples):
                    w = x[wi : wi + window_samples]
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi // window_samples)
                    out["n_samples"].append(int(w.size))
                    out["rms"].append(
                        float(np.sqrt(np.mean(w.astype(np.float64) ** 2)))
                    )
                    out["peak"].append(int(np.abs(w).max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, AUDIO_SCHEMA)
