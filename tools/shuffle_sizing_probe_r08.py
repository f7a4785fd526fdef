"""Round-8 probe: shuffle-partition sizing — AQE coalescing makes
over-provisioning cheap, so the 100 TB sizing rule is safe to follow.

The brief's spill-aware sizing rule says set spark.sql.shuffle.partitions
so the LARGEST stage's partitions fit in executor memory — which at 100 TB
means thousands of partitions, massively over-provisioned for the small
aggregation stages in the same plan. This probe measures why that is fine
with AQE and not fine without it: TPC-H q18 (three shuffle joins + two
aggregations at sf0.1) swept over shuffle.partitions {8, 32, 128, 1024}
with spark.sql.adaptive.coalescePartitions on (session default) vs off.

Expected shape (and what production should conclude):
- AQE on: wall-clock ~flat across the sweep — post-shuffle reads coalesce
  to the advisory size, so 1024 costs about what 32 does; over-provision
  freely for the big stages.
- AQE off: the 1024 row pays real per-task scheduling/IO overhead on the
  tiny stages — the cost AQE removes; under-provisioning (8) serializes
  the big stages instead (less visible at sf0.1 where everything fits).

Methodology: fresh q18 frame per measurement (no cached plans), one
warmup + median-of-3 noop-sink executions per cell, confs restored after.
Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_googleplaystore_spark.catalog import QUERIES
from bigdata_googleplaystore_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY = "q18_large_orders"
SWEEP = (8, 32, 128, 1024)


def _run(spark) -> float:
    # per-cell warmup: each conf change alters the physical plan, so the
    # warmup must run UNDER the cell's confs or the first timed run pays
    # plan-compile/first-shuffle overhead the others don't
    QUERIES[QUERY].fn(spark, SF).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        df = QUERIES[QUERY].fn(spark, SF)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark("shuffle-sizing-probe")
    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.coalescePartitions.enabled",
    )
    prev = {k: spark.conf.get(k, None) for k in keys}
    # warm codegen/scan caches once before any timed cell
    QUERIES[QUERY].fn(spark, SF).write.format("noop").mode("overwrite").save()
    print(f"query={QUERY} sf={SF}")
    print(f"{'partitions':>11} {'aqe_coalesce_on_s':>18} {'aqe_coalesce_off_s':>19}")
    try:
        for n in SWEEP:
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
            t_on = _run(spark)
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
            t_off = _run(spark)
            print(f"{n:>11} {t_on:>18.3f} {t_off:>19.3f}")
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()
