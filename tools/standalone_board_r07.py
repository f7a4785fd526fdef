"""Round-7 standalone per-operator board: each bench-headline query
timed min-of-3 in its OWN fresh Spark session (one subprocess per
query), same pruning-proof noop-write action and warmup as bench.py.

Why this exists next to bench.py: the shared-session board is the
whole-workload health number, but it bills every query for session
aging — accumulated codegen caches, shuffle files, and GC pressure
from the queries before it. Round 7 measured that aging directly:
dedup_minhash_lsh is 0.82 s min-of-3 in a fresh session vs ~1.95 s
back-to-back in a session that had already run the other 22 entries
(and ~2.0-2.6 s interleaved) — and the ordering of the board barely
moves the totals (sequential-in-aged-session 21.5 s vs interleaved
21.1 s), so the gap is SESSION AGE, not interleaving. This tool
produces the fresh-session column, the honest per-operator cost.

The driver's BENCH_r{N}.json stays the canonical board per the
round-7 canonical-board policy; this is a diagnostic artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(name: str) -> None:
    """Single-query mode (fresh interpreter => fresh JVM/session)."""
    from bench import EXTRA_BENCH, SF_DIR
    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.session import get_spark

    spark = get_spark(app_name=f"standalone-{name}")
    fn = EXTRA_BENCH.get(name) or QUERIES[name].fn
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"name": name, "sec": round(best, 3)}))
    spark.stop()


def main() -> None:
    from bench import BENCH_QUERIES, EXTRA_BENCH

    names = list(BENCH_QUERIES) + list(EXTRA_BENCH)
    results: dict[str, float] = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True,
            text=True,
            timeout=600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[name] = json.loads(line)["sec"]

    print("| query | fresh-session min-of-3 |")
    print("|---|---|")
    for name, sec in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"| {name} | {sec:.2f}s |")
    print()
    print(json.dumps({
        "metric": "fresh_session_min_of_3_total",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
    else:
        main()
