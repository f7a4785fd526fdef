"""Scale probe for the DISTRIBUTED BPE merge loop (VERDICT r04 item 4).

The hybrid cutover (operators/bpe.py) collects vocabs <= 65,536 rows and
iterates driver-side; the distributed loop below the cutover is the
web-scale path (1e7-1e9-row vocabs after a 100 TB corpus) but round 4
only exercised it at toy size via driver_vocab_limit=0. This probe runs
it on synthetic vocabs at ~2x / 5x / 10x the cutover and records
per-merge wall-clock, which should be FLAT-TO-LINEAR in vocab rows:
each pass is one map-side-combinable pair-count (shuffle keyed on ~1e3
distinct pairs regardless of vocab size) + a top-8 collect + one
map-only regexp merge, so pass cost = job floor + linear scan.

Synthetic vocab (fully deterministic, no RNG): word i = "the" +
base-8(i) over the alphabet a..h — unique per row (so |vocab| = n
exactly), sharing the (t,h) / (h,e) prefix pairs and the digit-pair
distribution so the trainer has real merges to find; freq = 1 + i % 97.

Run when the host is otherwise idle; prints a markdown table for
COVERAGE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import bpe
from bigdata_googleplaystore_spark.session import get_spark

# The real cutover constant (round-5 advice: don't re-hardcode — if the
# cutover moves, the "above-cutover" framing must move with it)
CUTOVER = bpe.DRIVER_VOCAB_CUTOVER
SIZES = [2 * CUTOVER, 5 * CUTOVER, 10 * CUTOVER]
N_MERGES = 8


def synth_vocab(spark, n: int):
    """n distinct words with a shared prefix and base-8 digit tails."""
    digits = (
        "transform(sequence(6, 0, -1),"
        " p -> chr(97 + (CAST(id / CAST(pow(8, p) AS BIGINT) AS BIGINT) % 8)))"
    )
    return spark.range(n).select(
        F.concat(F.lit("the"), F.expr(f"concat_ws('', {digits})")).alias("word"),
        (F.lit(1) + (F.col("id") % 97)).cast("bigint").alias("freq"),
    )


def main() -> None:
    spark = get_spark(app_name="scale-probe-r05")
    print(f"| vocab rows | merges | total | per-merge | vs cutover ({CUTOVER}) |")
    print("|---|---|---|---|---|")
    base_per_merge = None
    for n in SIZES:
        words = synth_vocab(spark, n)
        assert words.select("word").distinct().count() == n
        t0 = time.perf_counter()
        out = bpe.learn_bpe_merges(
            spark, words, n_merges=N_MERGES, min_freq=2, driver_vocab_limit=0
        )
        got = out.collect()
        total = time.perf_counter() - t0
        per = total / max(1, len(got))
        if base_per_merge is None:
            base_per_merge = per
        print(
            f"| {n} | {len(got)} | {total:.2f}s | {per:.2f}s "
            f"| {n / CUTOVER:.0f}x rows, {per / base_per_merge:.2f}x per-merge |"
        )
        spark.catalog.clearCache()
    # cross-check: the distributed loop's merges at the smallest probe
    # size must equal the driver-side reference on the same vocab
    words = synth_vocab(spark, SIZES[0])
    wf = {r["word"]: int(r["freq"]) for r in words.collect()}
    want = bpe._learn_merges_local(wf, N_MERGES, 2)
    got = [
        (r["merge_rank"], r["left"], r["right"], int(r["pair_freq"]))
        for r in bpe.learn_bpe_merges(
            spark, words, n_merges=N_MERGES, min_freq=2, driver_vocab_limit=0
        ).collect()
    ]
    print(f"merge-for-merge vs driver reference at {SIZES[0]} rows:",
          "MATCH" if got == want else f"MISMATCH {got} vs {want}")
    spark.stop()


if __name__ == "__main__":
    main()
