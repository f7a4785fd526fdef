"""Round-7 probe: recall/cost of the PRODUCTION embedding near-dup path.

`embedding_near_pairs_ann` (multi-table hyperplane LSH candidates +
exact cosine verify) is the scale tier behind `dedup_embedding_ann`,
whose registered gate is a planted-pair construction (recall = 1 on
exact duplicates, hash-checked). This probe adds the standard
evaluation the planted gate doesn't give: measured recall against the
exact all-pairs baseline (`cosine_near_pairs`) on the REAL sf
embeddings, as the number of LSH tables sweeps — the single knob that
buys recall at the cost of candidate volume ((1-p^b)^L miss rate, L =
n_tables).

It also pins the COST side, which is the entire point of the ANN tier:
candidate pairs actually verified vs the N(N-1)/2 the exact tier pays.
Output is false-positive-free by construction (every candidate is
re-scored with the exact rounded cosine), so recall is the only axis
that can lose — precision is 1 at every setting, identical filter both
paths.

Run on an otherwise-idle host; prints a markdown table for COVERAGE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import similarity
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 0.45 is the registered dedup_embedding_cosine cut: the synthetic
# embeddings have no planted near-dups (max pairwise cosine ~0.51), so
# the production default 0.9 is vacuously empty on this corpus and the
# probe measures recall where exact pairs actually exist. NOTE the
# trade is threshold-dependent: at 0.45 the angle is wide (~63 deg),
# per-plane collision ~0.65, so recall at fixed (planes, tables) is a
# LOWER bound on the >=0.9 regime the operator defaults to (near-dup
# angles are small, per-plane collision ~0.9+).
THRESHOLD = 0.45


def main() -> None:
    spark = get_spark(app_name="near-dup-recall-probe")
    corpus = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    n = corpus.count()
    all_pairs = n * (n - 1) // 2

    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_near_pairs(
            corpus, threshold=THRESHOLD
        ).collect()
    }
    print(
        f"corpus {n} vectors, exact cosine>= {THRESHOLD} pairs: "
        f"{len(exact)} (baseline scores {all_pairs:,} pairs)"
    )
    print()
    print("| n_tables | candidate pairs | % of N(N-1)/2 | found | recall |")
    print("|---|---|---|---|---|")
    for n_tables in (1, 2, 4, 8, 16):
        sigs = similarity.hyperplane_signature_tables(
            corpus, n_tables=n_tables
        )
        a = sigs.select(F.col("vec_id").alias("id_a"), "table", "bucket")
        b = sigs.select(F.col("vec_id").alias("id_b"), "table", "bucket")
        n_cands = (
            a.join(b, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        got = {
            (r.id_a, r.id_b)
            for r in similarity.embedding_near_pairs_ann(
                corpus, threshold=THRESHOLD, n_tables=n_tables
            ).collect()
        }
        assert got <= exact, "ANN output must be a subset of the exact tier"
        recall = len(got & exact) / len(exact) if exact else 1.0
        print(
            f"| {n_tables} | {n_cands:,} | {100 * n_cands / all_pairs:.1f}% "
            f"| {len(got)}/{len(exact)} | {recall:.3f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
