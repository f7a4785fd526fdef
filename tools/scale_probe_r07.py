"""Round-7 scale probe: dedup_ngram_jaccard — the #3 bench cost on the
r06 board (1.73 s) and, per the r06 verdict (item 6), the only heavy
dedup family still missing the two-regime 4x corpus curve that minhash
(scale_probe_r06) and triangle count (r06b) carry.

Same two 4x shapes, same reasoning:

1. 4x-DISTINCT (alphabet-rotated copies, scale_probe_r06.build_4x_distinct):
   shingle sets across copies are disjoint, so the corpus is 4x the docs
   with the SAME internal near-dup structure and zero cross-copy
   collisions. "The corpus simply grew": the inverted shingle index gets
   more posting lists, not longer ones, so joined candidate rows,
   candidate pairs, and wall-clock should all scale ~4x (linear) — 16x
   would mean the self-join is quadratic in the corpus.

2. 4x-CLIQUE (exact-dup 4-cliques, scale_probe_r03.build_4x): every
   posting list quadruples BY CONSTRUCTION, so within-clique joined rows
   MUST grow ~16x (a complete graph per clique is the correct answer).
   The probe checks wall-clock tracks the CANDIDATE volume — the work
   the join actually materializes — not corpus^2, i.e. the hot-list
   shape flows through the shuffle join instead of blowing up one task.

Candidate accounting mirrors jaccard_pairs' internals exactly (same
xxhash64 shingle index, same explode/repartition):
  joined rows   = |a JOIN b ON shingle, doc_a < doc_b|  (the fan-out term)
  candidate prs = distinct (doc_a, doc_b) of that join  (the verify set)
Timing uses the pruning-proof noop-write action (bench.py policy).
Run when the host is otherwise idle; prints a markdown table for
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
from tools.scale_probe_r06 import build_4x_distinct


def _exploded_index(d):
    """(doc, set_size, shingle) — jaccard_pairs' inverted index, kept in
    lockstep with the operator (xxhash64 keys, distinct per doc)."""
    sh = dedup.shingle_arrays(d, "doc_id", "text", 3)
    hashed = sh.select(
        "doc",
        F.array_distinct(
            F.transform("shingles", lambda x: F.xxhash64(x))
        ).alias("hs"),
    )
    return (
        hashed.select(
            "doc", F.size("hs").alias("set_size"), F.explode_outer("hs").alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
    )


def measure(spark, sf_dir: str, n_runs: int = 3):
    """(best wall-clock via noop write, joined rows, candidate pairs,
    output pairs) for jaccard_pairs at threshold 0.5 / 3-shingles."""
    best = float("inf")
    out_rows = 0
    for _ in range(n_runs):
        d = load_table(spark, sf_dir, "documents")
        out = dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        out_rows = out.count()
        spark.catalog.clearCache()
    d = load_table(spark, sf_dir, "documents")
    s = _exploded_index(d)
    a = s.select(F.col("doc").alias("doc_a"), "shingle")
    b = s.select(F.col("doc").alias("doc_b"), "shingle")
    joined = a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
    n_joined = joined.count()
    n_cands = joined.select("doc_a", "doc_b").distinct().count()
    spark.catalog.clearCache()
    return best, n_joined, n_cands, out_rows


def main() -> None:
    spark = get_spark(app_name="scale-probe-r07")
    t1, j1, c1, o1 = measure(spark, SF)

    dist_dir = "/tmp/spark_graft_scale_probe_r07_distinct"
    build_4x_distinct(spark, dist_dir)
    td, jd, cd, od = measure(spark, dist_dir)

    clique_dir = "/tmp/spark_graft_scale_probe_r07_clique"
    build_4x(spark, clique_dir)
    tc, jc, cc, oc = measure(spark, clique_dir)

    print("| corpus | docs | joined rows | candidate pairs | output pairs | wall-clock | vs 1x |")
    print("|---|---|---|---|---|---|---|")
    print(f"| sf0.1 (1x) | 5,000 | {j1:,} | {c1:,} | {o1:,} | {t1:.2f}s | — |")
    print(
        f"| 4x distinct | 20,000 | {jd:,} ({jd / j1:.1f}x) | {cd:,} ({cd / c1:.1f}x) "
        f"| {od:,} ({od / o1:.1f}x) | {td:.2f}s | {td / t1:.2f}x time |"
    )
    print(
        f"| 4x clique | 20,000 | {jc:,} ({jc / j1:.1f}x) | {cc:,} ({cc / c1:.1f}x) "
        f"| {oc:,} ({oc / o1:.1f}x) | {tc:.2f}s | {tc / t1:.2f}x time |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
