"""Interval (range) join — points matched into [start, end] intervals.

Spark plans a bare `p BETWEEN start AND end` join as a nested-loop cross
product (O(|points| x |intervals|)); this module provides the two
scale-safe shapes:

1. `interval_join(..., equi_keys=[...])`: when an equi key exists (the
   common case — per-user sessions, per-device windows), join on the key
   and filter the range predicate. Spark executes an equi-join with the
   range as a post-condition: shuffle on the key, no cross product.
2. `interval_join(..., equi_keys=None, bucket_width=w)`: pure range join
   via bucket decomposition — each point maps to bucket(p/w); each
   interval explodes to every bucket it overlaps; equi-join on bucket,
   then the exact range filter. Cost O(|points| + |intervals| x
   spanned_buckets + |true matches|): the standard distributed range-join
   technique (same decomposition spatial engines use for 1-D). Choose
   `bucket_width` ~ the typical interval length so intervals span O(1)
   buckets.

Oracle: ANSI `JOIN ... ON p >= start AND p <= end` (DuckDB executes it as
its own IEJoin) — see catalog query `interval_join_sessions`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, width: float) -> Column:
    return F.floor(c.cast("double") / F.lit(float(width))).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: float | None = None,
    how: str = "inner",
    end_inclusive: bool = True,
) -> DataFrame:
    """All (point, interval) pairs with start <= point <= end (inclusive
    both ends; pass `end_inclusive=False` for half-open [start, end)
    intervals — the tiling-band convention that keeps boundary points
    from matching two adjacent intervals), optionally also matching on
    `equi_keys`.

    Column names must be disjoint apart from `equi_keys` (rename inputs).
    Timestamps are supported: bucketing casts via unix seconds, so pass
    `bucket_width` in seconds for timestamp domains."""
    p_ts = F.col(point_col)
    upper = p_ts <= F.col(end_col) if end_inclusive else p_ts < F.col(end_col)
    cond = (p_ts >= F.col(start_col)) & upper

    if equi_keys:
        # The range predicate must live IN the join condition, not a
        # post-join filter: under 'left'/outer hows a filter would see
        # null start/end for unmatched points, evaluate to null, and drop
        # exactly the rows the outer join was asked to preserve
        # (degenerating to inner-join semantics).
        ikeys = intervals
        join_cond = cond
        for k in equi_keys:
            ikeys = ikeys.withColumnRenamed(k, f"_r_{k}")
            join_cond = join_cond & (F.col(k) == F.col(f"_r_{k}"))
        return points.join(ikeys, join_cond, how).drop(
            *[f"_r_{k}" for k in equi_keys]
        )

    if how != "inner":
        raise ValueError(
            "bucket-decomposed range join supports how='inner' only "
            "(outer variants need an unmatched-row add-back; use equi_keys "
            "or compose with a left_anti join)"
        )
    if bucket_width is None:
        raise ValueError("pure range join requires bucket_width")

    def _num(c: Column, df: DataFrame, name: str) -> Column:
        # timestamps bucket via epoch seconds; numerics as-is
        if str(df.schema[name].dataType).startswith("Timestamp"):
            return F.unix_timestamp(c)
        return c

    p_num = _num(F.col(point_col), points, point_col)
    s_num = _num(F.col(start_col), intervals, start_col)
    e_num = _num(F.col(end_col), intervals, end_col)

    pb = points.withColumn("_bucket", _bucket(p_num, bucket_width))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(_bucket(s_num, bucket_width), _bucket(e_num, bucket_width))
        ),
    )
    return pb.join(ib, "_bucket", how).filter(cond).drop("_bucket")
