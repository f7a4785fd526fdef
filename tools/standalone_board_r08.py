"""Round-8 standalone per-operator board: EVERY bench headliner (the 21
bench-tagged queries + bpe_train_corpus + the playstore_parts_2_3_4_5
reference pipeline — the full 23-entry roster the driver's BENCH_r{N}
board records) timed min-of-3 in its OWN fresh Spark session, one
subprocess per entry, same pruning-proof noop-write action and warmup
as bench.py.

This is the r07 verdict's item 3: the r07 tool produced the
fresh-session column for the 22 registry entries but COVERAGE.md only
quantified two of them; the r07 driver board also came in +37% on
unchanged code (host-context shift), and per-operator fresh-session
numbers are the only way to attribute such a swing. The output table
(standalone vs driver board, per entry) goes into COVERAGE.md as the
per-operator regression-judgment number; the driver's BENCH_r{N}.json
stays the canonical whole-workload board per the round-7
canonical-board policy.

Usage: `python tools/standalone_board_r08.py` (full board, ~15 min),
or `python tools/standalone_board_r08.py <name>` for one entry.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAYSTORE = "playstore_parts_2_3_4_5"
REF_CSV = "/root/reference/src/main/resources/originals/googleplaystore.csv"


def run_playstore() -> float:
    """The reference-pipeline entry: same Parts 2-5 chain and min-of-3
    as bench.py's special block (its inputs are the reference CSV, not
    sf-scaled testdata, so it has no sf0.001 warmup — the first pass is
    the warmup)."""
    import tempfile

    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark import playstore
    from bigdata_googleplaystore_spark.session import get_spark

    spark = get_spark(app_name=f"standalone-{PLAYSTORE}")
    best = float("inf")
    for _ in range(4):  # first pass = warmup, min over the last 3
        with tempfile.TemporaryDirectory() as tmp:
            t0 = time.perf_counter()
            ps = playstore.read_playstore_csv(spark, REF_CSV)
            df3 = playstore.group_by_app_and_standardize(ps)
            playstore.generate_best_apps_csv(
                spark, ps, f"{tmp}/best_apps.csv"
            ).count()
            df1 = df3.select("App").withColumn(
                "Average_Sentiment_Polarity", F.lit(0.0)
            )
            df4 = playstore.clean_google_play_store_data(
                spark, df1, df3, f"{tmp}/cleaned.gz"
            )
            playstore.get_google_play_store_metrics_by_genre(
                spark, df4, f"{tmp}/metrics.gz"
            ).count()
            dt = time.perf_counter() - t0
        if best == float("inf"):
            best = dt  # warmup pass recorded only if nothing better
        else:
            best = min(best, dt)
    spark.stop()
    return best


def run_one(name: str) -> None:
    """Single-entry mode (fresh interpreter => fresh JVM/session)."""
    if name == PLAYSTORE:
        print(json.dumps({"name": name, "sec": round(run_playstore(), 3)}))
        return

    from bench import EXTRA_BENCH, SF_DIR
    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.session import get_spark

    spark = get_spark(app_name=f"standalone-{name}")
    fn = EXTRA_BENCH.get(name) or QUERIES[name].fn
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"name": name, "sec": round(best, 3)}))
    spark.stop()


def main() -> None:
    from bench import BENCH_QUERIES, EXTRA_BENCH

    names = list(BENCH_QUERIES) + list(EXTRA_BENCH)
    if os.path.exists(REF_CSV):
        names.append(PLAYSTORE)
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
        print(f"# {name}: {results[name]:.2f}s", file=sys.stderr)

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
