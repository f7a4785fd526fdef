"""Incremental aggregation: maintain a grouped aggregate as new data
arrives without re-scanning history.

The 100 TB pattern: a daily pipeline lands partition P_d; recomputing
`SELECT key, count(*), sum(x), min(x), max(x) FROM all_history GROUP BY
key` re-reads everything ever ingested. Algebraic aggregates instead
merge: keep the PARTIAL state per key (count, sum, min, max — each
mergeable by +, +, least, greatest), fold each new partition's partial in
with one union + re-aggregate over |keys| rows, and derive the
non-mergeable outputs (avg = sum/count) at read time. This is exactly
Spark's own partial/final aggregation contract lifted to storage — and
the maintenance primitive behind incremental materialized views
(Structured Streaming's stateful aggs do the same thing with the state
store in place of the partial table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_COLS = ("_n", "_n_nonnull", "_sum", "_min", "_max")


def partial_agg(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Partial (mergeable) state per key over one batch of raw rows."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("_n"),
        F.count(value_col).alias("_n_nonnull"),
        F.sum(value_col).alias("_sum"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Merge any number of partial-state frames (same schema) into one.
    Shuffles only |keys| rows per input — never the raw data."""
    if not partials:
        raise ValueError("merge_partials needs at least one frame")
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    keys = [c for c in unioned.columns if c not in _STATE_COLS]
    return unioned.groupBy(*keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_n_nonnull").alias("_n_nonnull"),
        F.sum("_sum").alias("_sum"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    )


def finalize(partial: DataFrame) -> DataFrame:
    """Derive the user-facing aggregate from partial state. avg follows
    SQL semantics (null-ignoring: sum over non-null count; null when no
    non-null values)."""
    keys = [c for c in partial.columns if c not in _STATE_COLS]
    return partial.select(
        *keys,
        F.col("_n").alias("n_rows"),
        F.col("_sum").alias("total"),
        F.col("_min").alias("vmin"),
        F.col("_max").alias("vmax"),
        F.when(
            F.col("_n_nonnull") > 0, F.col("_sum") / F.col("_n_nonnull")
        ).alias("vavg"),
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE-INTO semantics (matched -> replace, unmatched -> insert) as a
    pure DataFrame transform: keep every target row whose key has no
    update (left-anti), then union the updates. The daily-upsert shape
    for snapshot maintenance without a transactional table format.

    Scale posture: the update batch is normally orders of magnitude
    smaller than the snapshot, so the anti-join BROADCASTS the update
    keys — the 100 TB target is filtered map-side and never shuffles.
    Set broadcast_updates=False when the batch is genuinely large and a
    shuffled anti-join is the right plan. Requires `updates` deduplicated
    on the key (one winner per key — enforce upstream, e.g. max-ts row)."""
    keys = updates.select(*key_cols).distinct()
    if broadcast_updates:
        keys = F.broadcast(keys)
    kept = target.join(keys, key_cols, "left_anti")
    return kept.unionByName(updates)


def delta_join(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: str | list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Insert-only incremental JOIN maintenance: the rows ADDED to
    A JOIN B when A gains `delta_a` and B gains `delta_b`, by the
    bilinearity of the join (the classic delta rule, the same identity
    DBSP/differential dataflow and every incremental-view-maintenance
    engine build on):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    Appending these rows to the stored A_old ⋈ B_old view (or folding
    their partial aggregates into the view's state — see partial_agg /
    merge_partials) maintains the join without ever recomputing it.

    Scale posture: the whole point at 100 TB is that history is touched
    only AS THE PROBE SIDE of small joins — each delta term joins one
    ingest batch against a base table, so with `broadcast_deltas` the
    two base-table scans are map-side (no shuffle of history, and the
    base side's join-key filter can push into the scan); the ΔA ⋈ ΔB
    term is batch-sized on both sides. Nothing ever re-joins
    A_old ⋈ B_old. Set broadcast_deltas=False when a batch is too big
    to broadcast — the terms become ordinary shuffle joins of
    batch-vs-base, still never history-vs-history.

    Insert-only (no retractions): deletes/updates need signed
    multiplicities on top of the same three terms."""
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )
