"""Round-6 scale probe #2: graph_triangle_count corpus curve.

The new triangle operator's 100 TB claim is that the degree-ordered wedge
join keeps work proportional to the wedge/output count, not to corpus².
Probe shape: 4x-DISJOINT — four copies of the sf0.1 events table with
user ids offset by 10M*i and event_type suffixed per copy, so each copy
reproduces the original co-activity graph on a disjoint node set (the
timelines can't interleave across copies because the step derivation
partitions by event_type). Nodes, edges, and triangles must come out
exactly 4x; wall-clock should scale ~linearly (the probe passes if the
4x/1x time ratio is far under the 16x a quadratic wedge blowup would
give).

Timing uses the same pruning-proof noop-write action as bench.py.
Prints a markdown table for COVERAGE.md. Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from bigdata_googleplaystore_spark.operators.graph import triangle_count
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def edges_from_events(ev: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    e = ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    steps = e.select(
        F.lag("user_id").over(w).alias("pu"), F.col("user_id").alias("cu")
    ).filter(F.col("pu").isNotNull() & (F.col("pu") != F.col("cu")))
    return steps.select(F.col("pu").alias("a"), F.col("cu").alias("b"))


def build_4x(spark) -> DataFrame:
    ev = load_table(spark, SF, "events")
    reps = []
    for i in range(4):
        reps.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                F.concat(F.col("event_type"), F.lit(f"_{i}")).alias("event_type"),
                "value",
                "props",
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out


def timed(df: DataFrame, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="triangle-scale-probe")
    ev1 = load_table(spark, SF, "events")
    ev4 = build_4x(spark)

    rows = {}
    for tag, ev in (("1x", ev1), ("4x", ev4)):
        res = triangle_count(edges_from_events(ev))
        r = res.collect()[0]  # warm + counts
        t = timed(triangle_count(edges_from_events(ev)))
        rows[tag] = (r.n_nodes, r.n_edges, r.n_triangles, t)
        print(f"# {tag}: nodes={r.n_nodes} edges={r.n_edges} "
              f"triangles={r.n_triangles} best={t:.3f}s", file=sys.stderr)

    n1, e1_, t1, w1 = rows["1x"]
    n4, e4_, t4, w4 = rows["4x"]
    print("| corpus | nodes | edges | triangles | wall (min-of-3) | ratio |")
    print("|---|---|---|---|---|---|")
    print(f"| 1x sf0.1 | {n1} | {e1_} | {t1} | {w1:.3f}s | 1.00x |")
    print(f"| 4x disjoint | {n4} | {e4_} | {t4} | {w4:.3f}s | {w4 / w1:.2f}x |")
    assert n4 == 4 * n1 and e4_ == 4 * e1_ and t4 == 4 * t1, (
        "disjoint 4x must exactly quadruple nodes/edges/triangles"
    )
    spark.stop()


if __name__ == "__main__":
    main()
