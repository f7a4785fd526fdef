"""Scaling probe for the round-4 additions: time each query on the sf0.1
corpus vs the 4x-duplicated copy (scale_probe_r03.build_4x: documents as
exact-dup 4-cliques with shifted ids).

Expected shapes:
- dedup_exact_substring: 4x spans in, and the 4x copy makes EVERY span a
  cross-clique duplicate, so coverage flips from sparse to total — the
  rejoin and coverage stages see ~4x rows (output-bound worst case); time
  should stay ~linear in that output, not quadratic (no pair fan-out in
  the plan: counts, not pairs).
- text_char_entropy: pure linear scan + two combinable aggs -> ~4x rows,
  <=4x time.
- pii_redact_stats / bpe_encode_fixed_vocab: map-only regex passes over
  customer/vocab — the 4x documents copy leaves customer untouched and
  the vocab unchanged, so both should be ~flat (control queries).

Run when the host is otherwise idle; prints a markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_googleplaystore_spark.catalog import QUERIES
from bigdata_googleplaystore_spark.session import get_spark
from tools.scale_probe_r03 import SF, build_4x

OPS = [
    "dedup_exact_substring",
    "text_char_entropy",
    "pii_redact_stats",
    "bpe_encode_fixed_vocab",
]


def time_op(spark, name: str, sf_dir: str, n_runs: int = 3) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(n_runs):
        t0 = time.perf_counter()
        rows = QUERIES[name].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best, rows


def main() -> None:
    spark = get_spark(app_name="scale-probe-r04")
    out_dir = "/tmp/spark_graft_scale_probe_r04"
    build_4x(spark, out_dir)
    # pii_redact_stats reads customer, which build_4x doesn't scale (it is
    # the probe's untouched control input) — link it through verbatim.
    src = os.path.join(SF, "customer.parquet")
    dst = os.path.join(out_dir, "customer.parquet")
    # lexists, not exists: a stale symlink (e.g. after the sf dir moves)
    # returns False from exists() and the symlink() below would raise
    # FileExistsError (round-4 advice) — remove and recreate instead.
    if os.path.lexists(dst):
        os.unlink(dst)
    os.symlink(src, dst)
    print("| query | t(sf0.1) | rows | t(4x) | rows(4x) | time ratio |")
    print("|---|---|---|---|---|---|")
    for name in OPS:
        t1, r1 = time_op(spark, name, SF)
        t4, r4 = time_op(spark, name, out_dir)
        print(
            f"| {name} | {t1:.2f}s | {r1} | {t4:.2f}s | {r4} "
            f"| {t4 / t1:.2f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
