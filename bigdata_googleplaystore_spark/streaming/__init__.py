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


def errors_with_recent_clicks(
    errors: DataFrame,
    clicks: DataFrame,
    gap: str = "15 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream (or batch-batch) inner join: each error event paired
    with every click by the same user in the `gap` window before it.

    In streaming mode both sides need a watermark plus the time-range
    join condition — that pair is what lets the engine expire buffered
    state (a click older than error-watermark - gap can never match
    again). Without the range bound a stream-stream join's state grows
    forever. The identical function body works in batch (withWatermark is
    a no-op there), and tests assert batch ≡ stream."""
    e = errors.select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if watermark:
        e = e.withWatermark("error_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (e["user_id"] == c["click_user"])
        & (c["click_ts"] <= e["error_ts"])
        & (c["click_ts"] >= e["error_ts"] - F.expr(f"INTERVAL {gap}"))
    )
    return e.join(c, cond).select(
        "user_id", "error_id", "error_ts", "click_id", "click_ts"
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Exact dedup on `keys`, batch- and stream-compatible.

    Batch (no watermark): plain dropDuplicates. Streaming: requires a
    watermark and uses dropDuplicatesWithinWatermark, so per-key dedup
    state is evicted once the key's event time falls behind the watermark —
    bounded state, the only deploy-safe form of streaming dedup for an
    unbounded key space (ingestion-time duplicate suppression for
    at-least-once sources)."""
    keys = keys or ["event_id"]
    if watermark:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def user_running_totals_batch(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Batch form of the stateful per-key totals: plain groupBy/agg."""
    return events.groupBy(key_col).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )


def user_running_totals_stream(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Custom stateful streaming operator via `applyInPandasWithState`:
    per-key running (count, sum) carried in the state store across
    micro-batches, one updated row emitted per key per batch.

    The Arrow-batched state function is the sanctioned pattern for
    operators Structured Streaming lacks natively (custom counters,
    sketches, ML feature state). State size is O(keys); pair with a
    TTL-style timeout in deployments where the key space is unbounded.
    After the stream drains, the latest row per key equals
    `user_running_totals_batch` — asserted in tests/test_streaming.py."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_events long, total_value double"
    state_schema = "n long, total double"

    def fn(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_stream_foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Exactly-once-per-batch parquet sink via foreachBatch: each
    micro-batch overwrites its own `_batch_id=<id>` partition, so a batch
    replayed after a failure rewrites the same directory instead of
    appending duplicates (idempotent writes + checkpointed offsets =
    end-to-end exactly-once for deterministic transformations). The
    pattern generalizes to JDBC upserts / MERGE sinks — foreachBatch is
    the extension point Structured Streaming gives you for any sink with
    transactional or idempotent semantics."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def run_stream_incremental_agg(
    stream_df: DataFrame,
    keys: list[str],
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming materialized-view maintenance: each micro-batch writes
    its MERGEABLE partial aggregate (operators/incremental.py state:
    count/sum/min/max per key) into its own `_batch_id` partition with
    dynamic partition overwrite.

    Replayed batches rewrite their own partition — idempotent, so the
    state table is exactly-once without transactions. History is never
    re-read: each batch shuffles only its own |keys| rows. Readers call
    `read_incremental_state` to fold the partials; a compaction job can
    merge old partitions into a base the same way (same merge operator)
    without changing reader semantics."""
    from ..operators import incremental

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            incremental.partial_agg(batch_df, keys, value_col)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(state_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def read_incremental_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold all per-batch partials into the current aggregate view."""
    from ..operators import incremental

    partials = spark.read.parquet(state_dir).drop("_batch_id")
    return incremental.finalize(incremental.merge_partials(partials))


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a (file-bounded) stream into an in-memory table and return a
    batch DataFrame over it. Test/debug utility — real deployments write
    to kafka/parquet sinks with checkpointing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.table(name)


def enrich_stream_static(
    events_stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream joins
    a *batch* dimension table — the standard pattern for decorating an
    event stream with slowly-changing reference data (user profile, device
    registry). The static side is re-planned per micro-batch (so dimension
    updates are picked up) and is explicitly broadcast: stateless,
    watermark-free, and the stream side never shuffles. Left join keeps
    events whose key is missing from the dimension (late-arriving dims)."""
    cols = [F.col(key)] + [F.col(c) for c in dim_cols]
    return events_stream.join(F.broadcast(dim.select(*cols)), key, "left")
