"""Pure-range bucket decomposition must equal the brute-force
cross-join-filter reference (the equi-key path is oracle-checked in the
catalog via interval_join_sessions)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators.rangejoin import interval_join


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
