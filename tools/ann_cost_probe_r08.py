"""Round-8 probe: IVF query cost grows O(n_probe * sqrt(N)) while brute
force grows O(N) — the octave-widening advantage, measured.

The r07 recall probe measured IVF's recall/probe trade at fixed corpus;
this probe measures the COST story across corpus octaves, the number a
100 TB deployment actually plans around. With the standard sizing rule
n_cells ~ sqrt(N) (cell population held roughly constant), a query at
n_probe fixed touches n_probe * N / n_cells ~ n_probe * sqrt(N)
candidates; brute force touches all N. Sweeping the real sf0.1 embedding
corpus through 1x -> 4x -> 16x (replicas deterministically perturbed with
seeded gaussian noise so no replica is an exact duplicate), the
candidate-set reduction should WIDEN ~2x per octave while recall@10
against the same-corpus brute force stays high.

Methodology: 100 query vectors (the original corpus's first 100 ids) at
every scale; the INDEX — k-means centroids AND the corpus-to-cell
assignment — is built once per corpus OUTSIDE the timed region and
cached (production stores the corpus partitioned by cell; the
`centroids=` / `assigned=` parameters of ivf_topk), because rebuilding
the O(N x n_cells) assignment per query batch inverts the comparison
once n_cells > |queries| — the first version of this probe measured
exactly that inversion (IVF 0.3x brute at 16x corpus) before the
stored-index path was separated. Wall times are median-of-3 full
noop-sink executions after a warmup; recall@10 and candidate counts
from the same frames. Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import similarity
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 100
K = 10
N_PROBE = 4


def _median_wall(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warmup
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark("ann-cost-probe")
    base = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    rows = base.collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n0, dim = vecs.shape
    rng = np.random.default_rng(8)

    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids[:N_QUERIES], vecs[:N_QUERIES])],
        "vec_id long, embedding array<double>",
    ).cache()
    queries.count()

    print(f"sf={SF} dim={dim} queries={N_QUERIES} k={K} n_probe={N_PROBE}")
    print(
        f"{'N':>7} {'cells':>6} {'brute_s':>8} {'ivf_s':>7} {'speedup':>8} "
        f"{'cands/query':>12} {'reduction':>10} {'recall@10':>10}"
    )
    for mult in (1, 4, 16):
        reps = [vecs]
        for c in range(1, mult):
            reps.append(vecs + rng.normal(0, 0.05, vecs.shape))
        all_vecs = np.vstack(reps)
        all_ids = np.concatenate([ids + c * 1_000_000 for c in range(mult)])
        n = len(all_ids)
        corpus = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(all_ids, all_vecs)],
            "vec_id long, embedding array<double>",
        ).repartition(32).cache()
        corpus.count()

        n_cells = max(4, int(round(n ** 0.5)))
        t0 = time.perf_counter()
        cents = similarity.kmeans_centroids(
            corpus, "vec_id", "embedding", k=n_cells, iters=2
        )
        asg = similarity.assign_to_centroids(
            corpus, cents, "vec_id", "embedding"
        ).select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("cv"),
            "cid",
        ).cache()
        asg.count()
        t_train = time.perf_counter() - t0

        brute = similarity.cosine_topk(corpus, queries, k=K)
        ivf = similarity.ivf_topk(
            corpus, queries, k=K, n_cells=n_cells, n_probe=N_PROBE,
            centroids=cents, assigned=asg,
        )
        t_brute, t_ivf = _median_wall(brute), _median_wall(ivf)

        truth = {
            (r["query_id"], r["cand_id"]) for r in brute.collect()
        }
        got = {(r["query_id"], r["cand_id"]) for r in ivf.collect()}
        recall = len(truth & got) / len(truth)
        cands = N_PROBE * n / n_cells  # expected probed candidates
        print(
            f"{n:>7} {n_cells:>6} {t_brute:>8.3f} {t_ivf:>7.3f} "
            f"{t_brute / t_ivf:>7.1f}x {cands:>12.0f} {n / cands:>9.1f}x "
            f"{recall:>10.3f}  (index build {t_train:.2f}s, amortized)"
        )
        corpus.unpersist()
        asg.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
