"""Round-7 probe d: one more OCTAVE on the dedup linearity curves.

The r06/r07 probes established 1x -> 4x distinct-regime linearity for
dedup_minhash_lsh and dedup_ngram_jaccard. A single doubling-of-scale
point is weak evidence against a hidden super-linear term (an O(n^1.5)
component only costs 2x extra at 4x), so this probe extends the same
distinct-regime curve to 16x (80,000 docs): if candidates and wall-clock
track ~16x while a quadratic self-join would pay ~256x, the linear claim
survives two octaves instead of one.

Corpus construction generalizes scale_probe_r06.build_4x_distinct to K
alphabet-rotated copies (rotation step 7 is coprime to 26, so all 16
rotations are distinct letter bijections): every copy reproduces the 1x
corpus's internal near-dup structure under its own alphabet and
cross-copy shingle collisions stay negligible. "The corpus simply grew."

Measurement reuses the r06/r07 probes' measure() functions verbatim
(same pruning-proof noop-write action, same candidate accounting that
mirrors the operators' internals), so the 1x/4x rows printed here are
direct replicates of the committed tables and the 16x rows are
comparable to them.

Run on an otherwise-idle host; prints markdown tables for COVERAGE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table
from tools import scale_probe_r06 as p6
from tools import scale_probe_r07 as p7
from tools.scale_probe_r03 import SF

LOWER = "abcdefghijklmnopqrstuvwxyz"


def build_kx_distinct(spark, out_dir: str, k: int) -> int:
    """K alphabet-rotated copies of the sf corpus (the r06 4x-distinct
    construction, parameterized). Returns the doc count."""
    docs = load_table(spark, SF, "documents")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(k):
        rot = 7 * i % 26
        src = LOWER + LOWER.upper()
        dst = (LOWER[rot:] + LOWER[:rot]) + (LOWER[rot:] + LOWER[:rot]).upper()
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_doc)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    dk = reps[0]
    for r in reps[1:]:
        dk = dk.unionByName(r)
    dk.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return n_doc * k


def main() -> None:
    spark = get_spark(app_name="scale-probe-r07d")

    dirs = {1: SF}
    for k in (4, 16):
        d = f"/tmp/spark_graft_scale_probe_r07d_{k}x"
        build_kx_distinct(spark, d, k)
        dirs[k] = d

    print("### dedup_minhash_lsh, distinct regime")
    print("| corpus | docs | candidates | output pairs | wall-clock |"
          " cand vs 1x | time vs 1x |")
    print("|---|---|---|---|---|---|---|")
    base = None
    for k in (1, 4, 16):
        t, c, o = p6.measure(spark, dirs[k])
        if base is None:
            base = (t, c, o)
        print(
            f"| {k}x | {5000 * k:,} | {c:,} | {o:,} | {t:.2f}s "
            f"| {c / base[1]:.1f}x | {t / base[0]:.2f}x |"
        )

    print()
    print("### dedup_ngram_jaccard, distinct regime")
    print("| corpus | docs | joined rows | candidate pairs | output pairs |"
          " wall-clock | joined vs 1x | time vs 1x |")
    print("|---|---|---|---|---|---|---|---|")
    base = None
    for k in (1, 4, 16):
        t, j, c, o = p7.measure(spark, dirs[k])
        if base is None:
            base = (t, j, c, o)
        print(
            f"| {k}x | {5000 * k:,} | {j:,} | {c:,} | {o:,} | {t:.2f}s "
            f"| {j / base[1]:.1f}x | {t / base[0]:.2f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
