"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.7: no streaming); this module is
the engine's extension surface for the `events`-shaped stream: windowed
aggregations with watermarked late-data handling, and session windows.

Design: every transformation here is expressed so the SAME function works
on a batch DataFrame and a streaming DataFrame (Structured Streaming's
unified model) — tests assert batch/stream result equality on the events
table, and the batch forms are oracle-checked in the catalog.

At scale: streaming aggs keep per-key state in the state store; the
watermark bounds state size (keys older than watermark are evicted), and
`spark.sql.shuffle.partitions` fixes state-store parallelism for the life
of the checkpoint — size it up front on a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling/sliding window counts; batch- and stream-compatible.

    With `watermark` set (streaming), state for windows older than the
    watermark is finalized and evicted — bounded state at any scale.
    """
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


def sessionized(
    events: DataFrame,
    gap: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based): one row per (key, session) with start,
    last-event time and event count. Works in batch and streaming."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    gap_interval = F.expr(f"INTERVAL {gap}")
    return (
        df.groupBy(F.col(key_col), win.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            # session_window.end = last event + gap; subtract it back so the
            # output is phrased in observable event times
            (F.col("w.end") - gap_interval).alias("last_event"),
            "n_events",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain a (file-bounded) stream into an in-memory table and return a
    batch DataFrame over it. Test/debug utility — real deployments write
    to kafka/parquet sinks with checkpointing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.table(name)
