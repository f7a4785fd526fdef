"""Round-6 scale probe: dedup_minhash_lsh (the slowest bench query on the
r05 board, 2.7 s) — VERDICT r05 item 6 asked for the missing corpus-scale
curve: candidate count and wall-clock vs corpus size.

Two 4x shapes, because they answer different scale questions:

1. 4x-DISTINCT (build_4x_distinct): three extra copies of the corpus with
   per-copy alphabet rotation of the text, so every copy's shingle sets are
   disjoint from every other copy's — the corpus is 4x the docs with the
   SAME internal near-dup structure and no cross-copy collisions. This is
   "the corpus simply grew": candidates and wall-clock should scale ~4x
   (linear), NOT 16x (quadratic) — buckets get more numerous, not denser.

2. 4x-CLIQUE (scale_probe_r03.build_4x): exact-dup 4-cliques. Here every
   bucket's membership quadruples BY CONSTRUCTION, so candidates MUST grow
   ~16x within dup groups (a complete graph on each clique is the correct
   answer, not a defect) — the probe checks wall-clock tracks the
   CANDIDATE/OUTPUT count (the work the verify join actually pays for),
   not corpus^2, i.e. the hot-bucket shape spills through the join
   machinery instead of blowing up a task (the collect_set anti-pattern
   minhash_lsh_pairs' docstring documents avoiding).

Timing uses the same pruning-proof noop-write action as bench.py (round-6
policy). Run when the host is otherwise idle; prints markdown tables for
COVERAGE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import dedup
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table
from tools.scale_probe_r03 import SF, build_4x

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def build_4x_distinct(spark, out_dir: str) -> None:
    """4x corpus where copy i's text is alphabet-rotated by 7*i: shingle
    sets across copies are disjoint (rotation is a bijection on letters),
    so no cross-copy LSH collisions exist and each copy reproduces the
    original's internal near-dup structure under its own alphabet."""
    docs = load_table(spark, SF, "documents")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(4):
        src = LOWER + UPPER
        dst = _rot(LOWER, 7 * i % 26) + _rot(UPPER, 7 * i % 26)
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_doc)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    d4 = reps[0]
    for r in reps[1:]:
        d4 = d4.unionByName(r)
    d4.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def measure(spark, sf_dir: str, n_runs: int = 3) -> tuple[float, int, int]:
    """(best wall-clock via noop write, candidate pairs, output pairs)."""
    best = float("inf")
    out_rows = 0
    for _ in range(n_runs):
        d = load_table(spark, sf_dir, "documents")
        out = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5)
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        out_rows = out.count()
        spark.catalog.clearCache()
    d = load_table(spark, sf_dir, "documents")
    arrs = dedup.shingle_arrays(d, "doc_id", "text", 3)
    sig = dedup.minhash_signatures(d, "doc_id", "text", 3, 64, shingle_arrs=arrs)
    n_cands = dedup.lsh_candidate_pairs(sig, 16, 4).count()
    spark.catalog.clearCache()
    return best, n_cands, out_rows


def main() -> None:
    spark = get_spark(app_name="scale-probe-r06")
    t1, c1, o1 = measure(spark, SF)

    dist_dir = "/tmp/spark_graft_scale_probe_r06_distinct"
    build_4x_distinct(spark, dist_dir)
    td, cd, od = measure(spark, dist_dir)

    clique_dir = "/tmp/spark_graft_scale_probe_r06_clique"
    build_4x(spark, clique_dir)
    tc, cc, oc = measure(spark, clique_dir)

    print("| corpus | docs | candidates | output pairs | wall-clock | vs 1x |")
    print("|---|---|---|---|---|---|")
    print(f"| sf0.1 (1x) | 5,000 | {c1} | {o1} | {t1:.2f}s | — |")
    print(
        f"| 4x distinct | 20,000 | {cd} ({cd / c1:.1f}x) | {od} ({od / o1:.1f}x) "
        f"| {td:.2f}s | {td / t1:.2f}x time |"
    )
    print(
        f"| 4x clique | 20,000 | {cc} ({cc / c1:.1f}x) | {oc} ({oc / o1:.1f}x) "
        f"| {tc:.2f}s | {tc / t1:.2f}x time |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
