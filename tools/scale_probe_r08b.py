"""Round-8 probe: time-travel reads cost O(version), not O(history).

The mv_time_travel_read gate hash-checks the as-of SEMANTICS and its
plan test proves 2-of-4 partitions touched at toy scale; this probe
measures the claim at sf0.1 with a 16-version history: an as-of-v fold
(streaming.read_incremental_state_asof) must scan exactly v+1 of the 16
`_batch_id` partitions and its input bytes must grow linearly in v —
i.e. pinning a training run to an early version stays cheap no matter
how much history lands afterwards. At 100 TB the same partition pruning
is what keeps a reproducibility read from re-listing years of state.

Methodology: 16 backfill batches (event_id % 16) written through the
shared streaming.write_batch_partition protocol; AQE off for the
measured reads (AdaptiveSparkPlanExec hides its final plan from
children() traversal — same caveat as ops._fact_scan_metric); physical
numPartitions / filesRead / bytesRead harvested from the executed
scan's metrics after a full collect. Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark import streaming
from bigdata_googleplaystore_spark.operators import incremental
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 16


def scan_metrics(df) -> dict[str, int]:
    df.collect()
    out: dict[str, int] = {}

    def walk(node):
        if "Scan" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in ("numPartitions", "numFiles", "filesSize"):
                    out[kv._1()] = out.get(kv._1(), 0) + kv._2().value()
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def main() -> None:
    spark = get_spark()
    ev = load_table(spark, SF, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(12,2)").alias("v")
    )
    state = tempfile.mkdtemp(prefix="ttravel_probe_")
    try:
        for bid in range(N_BATCHES):
            streaming.write_batch_partition(
                incremental.partial_agg(
                    ev.filter(F.col("event_id") % N_BATCHES == bid).drop(
                        "event_id"
                    ),
                    ["event_type"],
                    "v",
                ),
                state,
                bid,
            )
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        print(f"corpus: {SF}, {N_BATCHES} versions in {state}")
        print("as_of | partitions | files | bytes | wall_min3_s")
        for as_of in (1, 3, 7, 15):
            view = streaming.read_incremental_state_asof(spark, state, as_of)
            m = scan_metrics(view)
            best = float("inf")
            for _ in range(3):
                v2 = streaming.read_incremental_state_asof(spark, state, as_of)
                t0 = time.perf_counter()
                v2.collect()
                best = min(best, time.perf_counter() - t0)
            print(
                f"{as_of:5d} | {m.get('numPartitions', -1):10d} |"
                f" {m.get('numFiles', -1):5d} | {m.get('filesSize', -1):7d} |"
                f" {best:.3f}"
            )
            assert m.get("numPartitions") == as_of + 1, m
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print("OK: partitions read == v+1 at every version (asserted)")
    finally:
        shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    main()
