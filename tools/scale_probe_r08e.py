"""Round-8 probe: embedding near-dup cost octaves — and the knob that
keeps them linear.

The families already measured: n-gram Jaccard and MinHash-LSH at 4x/16x
(linear, r07 probes), image aHash at 4x (flat, r06). This probe gives the
embedding family (similarity.embedding_near_pairs_ann — multi-table
hyperplane LSH candidates + exact cosine verify, the production path the
`dedup_embedding_ann` gate exercises) the same treatment, and it measures
the SIZING RULE, not just the curve: LSH bucket count is 2^n_planes per
table, so holding n_planes fixed while the corpus grows lets bucket
occupancy — and the bucketed self-join's sum-of-bucket-sizes-squared cost
— grow quadratically. Measured directly: with n_planes=4 (16 buckets) the
16x cell (32k vectors, ~2k per bucket, ~hundreds of millions of candidate
pairs across 8 tables) DID NOT COMPLETE in 10 minutes on local[32], while
1x/4x ran 5.2s/22.4s. With the production rule n_planes ~ log2(N/250)
(bucket occupancy pinned ~250), the same sweep stays near-linear.

Corpus construction: replicas with seeded gaussian perturbation
(sigma=0.02), so every replica is a true near-dup (cos >= 0.9) of its
source and siblings — true pairs grow ~C(mult,2) x base within replica
families, the worst realistic shape (duplication growing with crawl
size). Pair counts are reported against that bound so recall loss from
the extra planes is visible honestly.

Methodology: noop-sink wall, median-of-3 after warmup; run on an
otherwise-idle host.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bigdata_googleplaystore_spark.operators import similarity
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET_BUCKET = 250


def _median_wall(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark("embdedup-probe")
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(8)

    print(f"sf={SF} base_vectors={len(ids)} sizing: n_planes=max(4, log2(N/{TARGET_BUCKET}))")
    print(f"{'mult':>5} {'N':>7} {'planes':>7} {'wall_s':>8} {'vs_1x':>6} {'pairs':>9} {'pair_bound':>11}")
    t1 = None
    for mult in (1, 4, 16):
        reps = [vecs]
        for c in range(1, mult):
            reps.append(vecs + rng.normal(0, 0.02, vecs.shape))
        all_vecs = np.vstack(reps)
        all_ids = np.concatenate([ids + c * 1_000_000 for c in range(mult)])
        corpus = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(all_ids, all_vecs)],
            "vec_id long, embedding array<double>",
        ).repartition(32).cache()
        n = corpus.count()

        planes = max(4, math.ceil(math.log2(max(2, n / TARGET_BUCKET))))
        pairs = similarity.embedding_near_pairs_ann(
            corpus, threshold=0.9, n_planes=planes
        )
        wall = _median_wall(pairs)
        n_pairs = pairs.count()
        if t1 is None:
            t1 = wall
        print(
            f"{mult:>5} {n:>7} {planes:>7} {wall:>8.3f} {wall / t1:>5.1f}x "
            f"{n_pairs:>9} {mult * (mult - 1) // 2 * len(ids):>11}"
        )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
