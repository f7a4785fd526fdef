"""Round-7 probe: IVF ANN recall/cost curve on the REAL sf corpus.

The ANN tiers carry planted-recall GATES (exact duplicates that must be
found — hash-checked in the registry); this probe adds the standard ANN
evaluation those gates don't give: measured recall@k against the exact
brute-force ranking on the real embeddings table, as the probe width
(n_probe of n_cells k-means cells) sweeps from 1 to all cells.

What it demonstrates, measured rather than asserted:
- the recall/cost KNOB: candidate fraction scales ~n_probe/n_cells
  while recall climbs toward 1; at n_probe = n_cells the IVF ranking
  must equal brute force exactly (asserted — probing every cell IS the
  exact search, so any disagreement would expose a ranking bug, ties
  aside: both paths break ties by (sim desc, cand_id asc) on the same
  round-4 sims).
- the 100 TB posture: query cost is |probed cells|, not |corpus|; the
  corpus partitions by cell at rest (cluster-prunable scan).

Queries = the 20 lowest-vec_id embeddings (deterministic); they remain
in the corpus, so their own cell always contains an exact-sim-1 match —
recall@10 is still a real test of the other 9 neighbors. Run on an
otherwise-idle host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import similarity
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_CELLS = 16
N_QUERIES = 20


def main() -> None:
    spark = get_spark(app_name="ann-recall-probe")
    corpus = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    n_corpus = corpus.count()
    queries = corpus.orderBy("vec_id").limit(N_QUERIES)

    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.cosine_topk(corpus, queries, k=K).collect()
    }

    print("| n_probe / n_cells | candidate fraction | recall@10 | wall-clock |")
    print("|---|---|---|---|")
    for n_probe in (1, 2, 4, 8, N_CELLS):
        t0 = time.perf_counter()
        got = similarity.ivf_topk(
            corpus, queries, k=K, n_cells=N_CELLS, n_probe=n_probe
        ).collect()
        dt = time.perf_counter() - t0
        hits = {(r.query_id, r.cand_id) for r in got}
        recall = len(hits & exact) / len(exact)
        frac = n_probe / N_CELLS
        print(
            f"| {n_probe}/{N_CELLS} | ~{frac:.0%} of {n_corpus} "
            f"| {recall:.3f} | {dt:.2f}s |"
        )
        if n_probe == N_CELLS:
            assert recall == 1.0, (
                "probing all cells is exact search; recall@10 must be 1.0"
            )

    # --- LSH tier: hyperplane buckets + multiprobe, recall vs the same
    # exact-cosine baseline. Fewer planes = coarser buckets = more
    # candidates = higher recall; Hamming-2 multiprobe buys recall at
    # fixed planes.
    print()
    print("| LSH (n_planes, multiprobe) | recall@10 |")
    print("|---|---|")
    for n_planes, mp in ((8, 1), (6, 1), (4, 1), (4, 2)):
        got = similarity.lsh_ann_topk(
            corpus, queries, k=K, n_planes=n_planes, multiprobe_bits=mp
        ).collect()
        hits = {(r.query_id, r.cand_id) for r in got}
        recall = len(hits & exact) / len(exact)
        print(f"| {n_planes} planes, Hamming-{mp} probe | {recall:.3f} |")

    # --- PQ-ADC tier: recall vs the exact *L2* ranking (ADC approximates
    # L2 distances; cosine and L2 orders differ on unnormalized vectors,
    # so the honest baseline is exact L2).
    from pyspark.sql import Window

    from bigdata_googleplaystore_spark.operators import pq

    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv"))
    c = corpus.select(F.col("vec_id").alias("cand_id"),
                      F.col("embedding").alias("cv"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv").cast("array<double>"),
            F.col("cv").cast("array<double>"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cand_id"))
    exact_l2 = {
        (r.query_id, r.cand_id)
        for r in F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "cand_id", F.round(d2, 4).alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .collect()
    }
    print()
    print("| PQ-ADC (M subspaces x 16 codewords) | compression | recall@10 vs exact L2 |")
    print("|---|---|---|")
    dim = len(queries.first().embedding)
    for m in (4, 8, 16):
        books = pq.train_codebooks(corpus, m=m, k=16, iters=3)
        codes = pq.encode(corpus, books)
        got = pq.adc_topk(codes, queries, books, k=K).collect()
        hits = {(r.query_id, r.cand_id) for r in got}
        recall = len(hits & exact_l2) / len(exact_l2)
        ratio = dim * 4 / m  # float32 bytes -> M byte-codes
        print(f"| M={m} | {ratio:.0f}x | {recall:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
