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
    multiplicities on top of the same three terms — see
    delta_join_signed."""
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )


def delta_join_signed(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: str | list[str],
    mult_col: str = "_mult",
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Retraction-capable delta-join maintenance: the SIGNED change to
    A ⋈ B when each side receives a batch of Z-weighted changes —
    `mult_col` = +1 for an insert, -1 for a delete; an update is a
    delete of the old row plus an insert of the new one (the standard
    Z-set / DBSP encoding of CDC feeds). The identity is the same
    bilinear delta rule as delta_join, lifted to multiplicities, which
    MULTIPLY across a join (base-table rows carry an implicit +1):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    with m(a ⋈ b) = m(a)·m(b). The cross term is what keeps a
    delete-on-A times an update-on-B from double-counting: a (-1, -1)
    pair contributes +1, cancelling the two single-sided subtractions
    of the same joined row.

    Scale posture: identical to delta_join — history (A_old, B_old) is
    only ever the probe side of a broadcast join against one
    batch-sized delta; the cross term is batch × batch; nothing
    re-joins A_old ⋈ B_old. Fold the output into a view's signed
    partial state with partial_agg_signed / merge_partials_signed
    (count/sum/avg — the abelian-group aggregates, which absorb
    retractions by pure addition); min/max are NOT group aggregates —
    maintain them with multiset_state / merge_multisets /
    finalize_minmax (value-count state, the standard MIN/MAX IVM
    construction)."""
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    db_renamed = db.withColumnRenamed(mult_col, "_mult_b")
    cross = (
        da.join(db_renamed, on)
        .withColumn(mult_col, F.col(mult_col) * F.col("_mult_b"))
        .drop("_mult_b")
    )
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(cross)
    )


_SIGNED_STATE_COLS = ("_n", "_n_nonnull", "_sum")


def partial_agg_signed(
    df: DataFrame, keys: list[str], value_col: str, mult_col: str = "_mult"
) -> DataFrame:
    """Signed partial state per key over one batch of Z-weighted rows:
    count and sum weighted by multiplicity, so a retraction (-1) is
    absorbed by the same addition that absorbs an insert. Only the
    abelian-GROUP aggregates live here — count, sum, and derived avg
    have inverses; min/max (monoid-only) are deliberately absent
    because a deleted extremum cannot be undone from (min, max) alone."""
    m = F.col(mult_col)
    return df.groupBy(*keys).agg(
        F.sum(m).alias("_n"),
        F.sum(
            F.when(F.col(value_col).isNotNull(), m).otherwise(F.lit(0))
        ).alias("_n_nonnull"),
        F.sum(m * F.col(value_col)).alias("_sum"),
    )


def merge_partials_signed(*partials: DataFrame) -> DataFrame:
    """Merge signed partial-state frames by key: pure sums, shuffling
    |keys| rows per input. An unsigned partial_agg state folds in
    directly (its _n/_n_nonnull/_sum columns are the mult=+1 case);
    select away its _min/_max first."""
    if not partials:
        raise ValueError("merge_partials_signed needs at least one frame")
    cleaned = []
    for p in partials:
        keep = [
            c for c in p.columns if c in _SIGNED_STATE_COLS or c not in _STATE_COLS
        ]
        cleaned.append(p.select(*keep))
    unioned = cleaned[0]
    for p in cleaned[1:]:
        unioned = unioned.unionByName(p)
    keys = [c for c in unioned.columns if c not in _SIGNED_STATE_COLS]
    return unioned.groupBy(*keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_n_nonnull").alias("_n_nonnull"),
        F.sum("_sum").alias("_sum"),
    )


def finalize_signed(partial: DataFrame) -> DataFrame:
    """User-facing (count, sum, avg) from signed partial state. Groups
    whose every row was retracted net to _n = 0 and are DROPPED — a
    full recompute over the post-change tables would have no such
    group, and emitting a zero row instead would diverge from it.
    Likewise, a group whose every NON-NULL row was retracted nets
    _n_nonnull = 0 with _sum = 0.0, but SQL's SUM over zero non-null
    rows is NULL — so total is nulled on that condition to stay
    recompute-exact (caught by the hypothesis model test in
    tests/test_ops_extra.py, not by the integer-valued gates)."""
    keys = [c for c in partial.columns if c not in _SIGNED_STATE_COLS]
    return partial.filter(F.col("_n") > 0).select(
        *keys,
        F.col("_n").alias("n_rows"),
        F.when(F.col("_n_nonnull") > 0, F.col("_sum")).alias("total"),
        F.when(
            F.col("_n_nonnull") > 0, F.col("_sum") / F.col("_n_nonnull")
        ).alias("vavg"),
    )


def multiset_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    mult_col: str | None = None,
) -> DataFrame:
    """Value-count MULTISET state per key: (keys..., value, _cnt) rows.

    This is the second-tier state that makes min/max maintainable under
    retractions — the reason finalize_signed excludes them: when the
    current maximum is deleted, scalar (min, max) state cannot produce
    the runner-up, but a multiset can (every IVM engine keeps exactly
    this for MIN/MAX over CDC feeds). State size is |distinct
    (key, value)| rows — bounded by the value domain per key, not by
    history row count (a quantity column with 50 distinct values keeps
    <= 50 rows per key no matter how many billions of facts fold in).
    `mult_col=None` treats rows as inserts (+1) — use it to build the
    initial state from the base view; pass the signed column when
    folding a CDC batch."""
    m = F.col(mult_col) if mult_col else F.lit(1)
    return df.groupBy(*keys, value_col).agg(F.sum(m).alias("_cnt"))


def merge_multisets(*states: DataFrame) -> DataFrame:
    """Merge multiset states by (key, value): counts add (retractions
    subtract), and (key, value) rows that net to zero are dropped so
    the state never grows with retracted history. Shuffles |distinct
    (key, value)| rows per input."""
    if not states:
        raise ValueError("merge_multisets needs at least one frame")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    group_cols = [c for c in unioned.columns if c != "_cnt"]
    return (
        unioned.groupBy(*group_cols)
        .agg(F.sum("_cnt").alias("_cnt"))
        .filter(F.col("_cnt") != 0)
    )


def finalize_minmax(state: DataFrame, value_col: str) -> DataFrame:
    """(keys..., n_rows, vmin, vmax) from multiset state: min/max over
    the values still present (_cnt > 0), row count as the count sum.
    Fully-retracted groups have no surviving (key, value) rows and
    disappear, matching a recompute."""
    keys = [c for c in state.columns if c not in (value_col, "_cnt")]
    return (
        state.filter(F.col("_cnt") > 0)
        .groupBy(*keys)
        .agg(
            F.sum("_cnt").alias("n_rows"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )


def finalize_topn(state: DataFrame, value_col: str, n: int) -> DataFrame:
    """(keys..., rnk, value, n_rows) from multiset state: the top-n
    DISTINCT values per key (value descending, rnk 1..n) with each
    value's surviving multiplicity — ORDER BY value DESC LIMIT n per
    group, maintained under retractions. Top-n is the fourth aggregate
    face the multiset serves and, like min/max, it is not a group
    aggregate: when the current #1 value's last surviving row is
    deleted, scalar top-n state cannot produce the value that was #(n+1)
    — the multiset can, because every surviving value is still present
    with its net count (min/max is just the n=1 special case of this).

    Determinism: ranking is over DISTINCT values (one state row per
    (key, value)), so row_number has no ties to break arbitrarily.

    Scale posture: the rank window partitions by key over the multiset
    state — |distinct (key, value)| rows, value-domain-bounded
    regardless of fact count — never over raw history."""
    from pyspark.sql import Window

    keys = [c for c in state.columns if c not in (value_col, "_cnt")]
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).desc())
    return (
        state.filter(F.col("_cnt") > 0)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .select(*keys, "rnk", value_col, F.col("_cnt").alias("n_rows"))
    )


def finalize_distinct(state: DataFrame, value_col: str) -> DataFrame:
    """(keys..., n_rows, n_distinct) from multiset state: exact
    COUNT(DISTINCT value) under retractions. Like min/max, distinct
    count is not a group aggregate — deleting one row can only lower
    the count if it was the value's LAST surviving row, which scalar
    state (or a distinct-value SET without counts) cannot know. The
    multiset knows: a value is present iff its net count is positive,
    so n_distinct is simply the surviving (key, value) row count. Same
    state, same fold, same |distinct (key, value)| size bound as
    finalize_minmax — one maintained multiset serves min, max, AND
    count-distinct. (Insert-only approximate tier: per-batch HLL
    sketches merged with hll_union_agg — see the
    incremental_hll_distinct_view gate — trade this exactness for
    fixed 2^lgK-byte state when the value domain is unbounded.)"""
    keys = [c for c in state.columns if c not in (value_col, "_cnt")]
    return (
        state.filter(F.col("_cnt") > 0)
        .groupBy(*keys)
        .agg(
            F.sum("_cnt").alias("n_rows"),
            F.count(value_col).alias("n_distinct"),
        )
    )
