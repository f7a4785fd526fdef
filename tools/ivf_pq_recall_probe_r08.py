"""Round-8 probe: recall/cost of the COMPOSED IVF-PQ pipeline.

sim_ann_ivf_pq_rerank gates the pipeline's deterministic endpoint
(n_probe = n_cells, rerank-all == brute force); this probe measures
the production-knob territory between the endpoints on the REAL sf
embeddings: recall@5 vs exact cosine top-5 as (n_probe, shortlist)
sweep, with the candidate fraction each setting actually scores. The
stage-level curves (IVF n_probe sweep, ADC M sweep) live in
tools/ann_recall_probe_r07.py; this is the end-to-end number a
deployment tunes.

Run on an otherwise-idle host; prints a markdown table for COVERAGE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import pq, similarity
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CELLS = 16
M = 8
K = 5


def main() -> None:
    spark = get_spark(app_name="ivf-pq-recall-probe")
    e = load_table(spark, SF, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    n_corpus = e.count()
    queries = e.filter(F.col("vec_id") < 50)
    n_q = queries.count()
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.cosine_topk(e, queries, k=K).collect()
    }
    print(
        f"# corpus {n_corpus} vectors, {n_q} queries, truth = exact "
        f"cosine top-{K} ({len(exact)} pairs); {N_CELLS} cells, M={M} "
        f"(16 codewords/subspace)",
        file=sys.stderr,
    )
    print("| n_probe / cells | shortlist | ~candidates scored | recall@5 |")
    print("|---|---|---|---|")
    for n_probe, shortlist in (
        (2, 20),
        (4, 20),
        (4, 50),
        (8, 50),
        (8, 0),
        (N_CELLS, 0),
    ):
        got = {
            (r["query_id"], r["cand_id"])
            for r in pq.ivf_pq_topk(
                e,
                queries,
                k=K,
                n_cells=N_CELLS,
                n_probe=n_probe,
                m=M,
                shortlist=shortlist,
                iters=2,
            ).collect()
        }
        recall = len(got & exact) / len(exact)
        # candidates scored by the exact rerank per query: the shortlist
        # cap, or the probed-cell population when uncapped
        cand = shortlist if shortlist else round(n_corpus * n_probe / N_CELLS)
        print(
            f"| {n_probe}/{N_CELLS} | {shortlist or 'all probed'} "
            f"| ~{cand}/query | {recall:.3f} |"
        )
        if n_probe == N_CELLS and not shortlist:
            assert recall == 1.0, "full probe + rerank-all must be exact"
    spark.stop()


if __name__ == "__main__":
    main()
