#!/usr/bin/env python
"""Decompose the playstore_parts_2_3_4_5 bench row per Part across
repeated back-to-back runs, to locate the r12 bimodality (1.9 s vs
3.7 s min-of-3 across bench invocations — VERDICT r12 item 2).

Two modes:
  python tools/playstore_bimodal_probe.py          # fresh session, N runs
  PRELOAD=1 python tools/playstore_bimodal_probe.py  # first replay the
      bench headline warmup (sf0.001 plans) to approximate the session
      state the real bench runs the playstore row under.

Prints one line per run with per-part wall clock, then a summary.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_googleplaystore_spark import playstore  # noqa: E402
from bigdata_googleplaystore_spark.session import get_spark  # noqa: E402

REF_CSV = "/root/reference/src/main/resources/originals/googleplaystore.csv"
N_RUNS = int(os.environ.get("N_RUNS", "6"))


def main() -> None:
    spark = get_spark()
    if os.environ.get("PRELOAD"):
        from bigdata_googleplaystore_spark.catalog import QUERIES

        t0 = time.perf_counter()
        for name, qd in QUERIES.items():
            if "bench" in qd.tags:
                try:
                    qd.fn(spark, "/root/testdata/sf0.001").write.format(
                        "noop"
                    ).mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001
                    print(f"# preload {name} failed: {exc}", file=sys.stderr)
        print(f"# preload done in {time.perf_counter() - t0:.1f}s")

    rows = []
    for run in range(N_RUNS):
        with tempfile.TemporaryDirectory() as tmp:
            t = {}
            t0 = time.perf_counter()
            ps = playstore.read_playstore_csv(spark, REF_CSV)
            ps.count()  # materialize inference + scan
            t["read_infer"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            df3 = playstore.group_by_app_and_standardize(ps)
            playstore.generate_best_apps_csv(
                spark, ps, f"{tmp}/best_apps.csv"
            ).count()
            t["part2_write_readback"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            df1 = df3.select("App").withColumn(
                "Average_Sentiment_Polarity", F.lit(0.0)
            )
            df4 = playstore.clean_google_play_store_data(
                spark, df1, df3, f"{tmp}/cleaned.gz"
            )
            t["part4_clean"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            playstore.get_google_play_store_metrics_by_genre(
                spark, df4, f"{tmp}/metrics.gz"
            ).count()
            t["part5_metrics"] = time.perf_counter() - t0

            total = sum(t.values())
            rows.append((run, t, total))
            parts = " ".join(f"{k}={v:.3f}" for k, v in t.items())
            print(f"run{run}: total={total:.3f} {parts}", flush=True)

    totals = [r[2] for r in rows]
    print(f"min={min(totals):.3f} max={max(totals):.3f}")
    for key in rows[0][1]:
        vals = [r[1][key] for r in rows]
        print(f"  {key}: min={min(vals):.3f} max={max(vals):.3f}")


if __name__ == "__main__":
    main()
