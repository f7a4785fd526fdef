"""Pure-range bucket decomposition must equal the brute-force
cross-join-filter reference (the equi-key path is oracle-checked in the
catalog via interval_join_sessions)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators.rangejoin import interval_join

from _markers import HEAVY


@HEAVY
def test_bucketed_range_join_equals_bruteforce(spark):
    rng = random.Random(11)
    points = spark.createDataFrame(
        [(i, round(rng.uniform(0, 100), 3)) for i in range(300)], "pid long, x double"
    )
    ivals = []
    for j in range(40):
        lo = round(rng.uniform(0, 95), 3)
        ivals.append((j, lo, round(lo + rng.uniform(0, 12), 3)))
    intervals = spark.createDataFrame(ivals, "iid long, lo double, hi double")

    fast = interval_join(
        points, intervals, point_col="x", start_col="lo", end_col="hi",
        bucket_width=8.0,
    ).select("pid", "iid")
    brute = (
        points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .select("pid", "iid")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, brute.collect()))


def test_bucketed_range_join_no_duplicate_matches(spark):
    """An interval spanning many buckets must still match a point once."""
    points = spark.createDataFrame([(1, 50.0)], "pid long, x double")
    intervals = spark.createDataFrame([(1, 0.0, 100.0)], "iid long, lo double, hi double")
    out = interval_join(
        points, intervals, "x", "lo", "hi", bucket_width=1.0
    )
    assert out.count() == 1


def test_bucketed_range_join_exclusive_end_boundaries(spark):
    """end_inclusive=False gives half-open [lo, hi): a point exactly at
    hi must NOT match, a point exactly at lo must, and the same points
    under the default inclusive end must match both — the boundary
    contract the range_join_bucket_decomposed oracle (`< hi`) relies on."""
    points = spark.createDataFrame(
        [(1, 0.0), (2, 25.0), (3, 24.999)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [(7, 0.0, 25.0)], "iid long, lo double, hi double"
    )
    half_open = interval_join(
        points, intervals, "x", "lo", "hi",
        bucket_width=25.0, end_inclusive=False,
    )
    assert sorted(r["pid"] for r in half_open.collect()) == [1, 3]
    closed = interval_join(
        points, intervals, "x", "lo", "hi", bucket_width=25.0
    )
    assert sorted(r["pid"] for r in closed.collect()) == [1, 2, 3]


def test_range_join_gate_plan_is_hash_join_not_nested_loop(spark, sf_dir):
    """The scale claim in range_join_bucket_decomposed's docstring,
    asserted on the actual plan: the bucket-decomposed gate query must
    contain NO BroadcastNestedLoopJoin (the decomposition turned the
    range predicate into a bucket equi-join), while the naive BETWEEN
    join over the same inputs — what you'd write without the operator —
    does plan one."""
    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.sources import load_table

    df = QUERIES["range_join_bucket_decomposed"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # the bucket equi-join

    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("value")
    intervals = spark.range(0, 100).select(
        (F.col("id") * 10).cast("double").alias("lo"),
        (F.col("id") * 10 + 25).cast("double").alias("hi"),
    )
    naive = e.join(
        intervals, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naive_plan
