"""Round-8 probe: bucket decomposition beats the nested-loop range join,
and the gap WIDENS with interval count — measured, not asserted.

The range_join_bucket_decomposed gate hash-checks semantics and its plan
test pins NLJ-free-ness; this probe measures the cost claim. A pure range
join (no equi key) planned naively is a BroadcastNestedLoopJoin: every
point row tests every interval, O(|P| x |I|) comparisons. The bucket
decomposition (operators/rangejoin.interval_join with bucket_width) maps
each point to one bucket and explodes each interval over the O(1) buckets
it overlaps, so the join is a hash join on bucket id: O(|P| + |I| +
matches). Holding points fixed (events at sf0.1, 100k rows) and sweeping
interval count over two octaves (512 -> 2048 -> 8192, width-25 intervals
stride-scaled to cover the value domain), NLJ wall time should scale
~linearly in |I| (the broadcast side grows) while the decomposed join
stays ~flat (bucket fan-out is constant) — the crossover any 1000-executor
deployment cares about arrives within the sweep.

Methodology: same value-interval shape as the gate (half-open [lo, lo+25)
bands over events.value); each measurement is the median of 3 full
noop-sink executions after one warmup; matches-count equality between the
two plans is asserted at every size so the speed comparison is
apples-to-apples. Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators.rangejoin import interval_join
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _time(df) -> float:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark("rangejoin-probe")
    pts = (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
    )
    pts.cache().count()
    vmax = pts.agg(F.max("value")).collect()[0][0]

    print(f"points={pts.count()} value_max={vmax:.2f} sf={SF}")
    print(f"{'n_intervals':>12} {'nlj_s':>8} {'bucket_s':>9} {'speedup':>8} {'matches':>10}")
    for n_iv in (512, 2048, 8192):
        # n_iv width-25 intervals tiled with stride vmax/n_iv so the
        # match count stays ~proportional to |P| x (25/stride)
        stride = vmax / n_iv
        iv = spark.range(0, n_iv).select(
            F.col("id").alias("iid"),
            (F.col("id") * stride).alias("lo"),
            (F.col("id") * stride + 25.0).alias("hi"),
        )
        iv.cache().count()
        naive = pts.join(
            iv, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
        )
        fast = interval_join(
            pts, iv, "value", "lo", "hi",
            bucket_width=25.0, end_inclusive=False,
        )
        n_naive, n_fast = naive.count(), fast.count()
        assert n_naive == n_fast, (n_naive, n_fast)
        # warmup then median-of-3 each
        naive.write.format("noop").mode("overwrite").save()
        fast.write.format("noop").mode("overwrite").save()
        t_naive, t_fast = _time(naive), _time(fast)
        print(
            f"{n_iv:>12} {t_naive:>8.3f} {t_fast:>9.3f} "
            f"{t_naive / t_fast:>7.1f}x {n_fast:>10}"
        )
        iv.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
