#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is total wall-clock over the headline set (lower is better).
Each query is executed to completion with a count()-style action so the
full plan runs; a warmup pass first touches every input file so JVM/
page-cache startup noise doesn't land on q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_googleplaystore_spark.catalog import QUERIES  # noqa: E402
from bigdata_googleplaystore_spark.session import get_spark  # noqa: E402
from bigdata_googleplaystore_spark.sources import TESTDATA_TABLES, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The headline set: every query tagged "bench" (flagship analytics + the
# heavy LLM-pipeline operators).
BENCH_QUERIES = [name for name, qd in QUERIES.items() if "bench" in qd.tags]


def main() -> None:
    spark = get_spark(app_name="bgps-bench")

    # Warmup: materialize file listings + JVM codepaths, not query results.
    for t in TESTDATA_TABLES:
        load_table(spark, SF_DIR, t).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        n = QUERIES[name].fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
