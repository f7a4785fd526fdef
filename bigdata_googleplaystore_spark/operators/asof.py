"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

Semantics: for every left row, attach the columns of the single right row
with the same key and the greatest right timestamp <= the left timestamp
(inclusive; "most recent fact as of this moment"). The standard tool for
point-in-time-correct feature lookup (no leakage from the future) in
training-data pipelines, and DuckDB's native `ASOF JOIN` — which the
catalog uses as the oracle.

Implementation is the union-marker technique, NOT an inequality join:

    union(left ∪ right) -> window last(right_col, ignorenulls)
      over (partition by key, order by (ts, side, id) rows unbounded->current)
      -> keep left rows

An inequality join (`l.ts >= r.ts`) would materialize O(|matches|) pairs
per key before picking the max — quadratic on hot keys. The union form is
one hash-partition + sort per side (exactly a sort-merge join's cost) and
scales to any key cardinality; skewed keys split fine because the window
is per-key. Right rows sort *before* left rows at equal timestamps, making
the match inclusive like DuckDB's `ON l.ts >= r.ts`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + `right_value_cols` from the
    most recent right row at or before each left row's `ts` (null when no
    such row). `right_value_cols` must not collide with left column names
    (rename on the way in). `tiebreak` orders rows with identical
    (ts, side) deterministically — pass an id column when timestamps can
    repeat within a key."""
    overlap = set(right_value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right value columns collide with left: {sorted(overlap)}")

    # The right row's values travel as ONE struct, filled with a single
    # last(ignorenulls). Filling each value column independently would mix
    # columns from different right rows whenever a right value is
    # legitimately null (the older row's value would bleed through),
    # breaking the "columns of the single most recent right row" contract.
    # The struct is non-null for every right row (even all-null values)
    # and absent exactly on left rows, so ignorenulls skips only those.
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(ts),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv"),
    ).withColumn("_side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    # final key: the right-value struct itself, so two right rows with an
    # identical (key, ts) — where `tiebreak`, a left-side column, is null
    # for both — still have a deterministic winner (the max struct)
    # instead of a partitioning-dependent one
    order.append(F.col("_rv").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_rv", ignorenulls=True).over(w).alias("_asof_rv")
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col(f"_asof_rv.{c}").alias(c) for c in right_value_cols],
        )
    )
