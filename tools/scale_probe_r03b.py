"""Scaling probe for the round-3 second-batch operators: time each op on
the sf0.1 corpus vs a 4x-duplicated copy (same construction as
scale_probe_r03.py: documents as exact-dup 4-cliques with shifted ids,
embeddings/events/orders re-id'd the same way).

Expected shapes (what the numbers should show):
- bpe_learn_merges / collocation_pmi_topk: the corpus scan is 4x but the
  vocab/bigram tables are ~constant (duplicated text adds no new words),
  so total time grows well under 4x.
- doc_hash_embedding / anomaly_rolling_zscore / embedding_pq_codes /
  sim_ann_pq_adc / cdc_apply_changes: linear scans/windows — ~4x rows,
  ~linear-or-better time.
- dedup_cluster_keep_best: the 4x copy PLANTS 4-cliques of exact dups,
  so the PAIR OUTPUT explodes by design (~16x pairs per clique) — the
  stress shape; time follows the output, not the input.

Run when the host is otherwise idle; prints a markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.catalog import QUERIES
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table
from tools.scale_probe_r03 import SF, build_4x

OPS = [
    "bpe_learn_merges",
    "collocation_pmi_topk",
    "doc_hash_embedding",
    "anomaly_rolling_zscore",
    "embedding_pq_codes",
    "sim_ann_pq_adc",
    "dedup_cluster_keep_best",
    "cdc_apply_changes",
]


def build_orders_4x(spark, out_dir: str) -> None:
    o = load_table(spark, SF, "orders")
    n_ord = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    o4 = None
    for i in range(4):
        part = o.select(
            (F.col("o_orderkey") + F.lit(i * n_ord)).alias("o_orderkey"),
            *[c for c in o.columns if c != "o_orderkey"],
        )
        o4 = part if o4 is None else o4.unionByName(part)
    o4.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


def time_op(spark, name: str, sf_dir: str, n_runs: int = 3) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(n_runs):
        t0 = time.perf_counter()
        rows = QUERIES[name].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 2), rows


def main() -> None:
    spark = get_spark(app_name="scale-probe-r03b")
    out_dir = "/tmp/sf0.1_x4_r03"
    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        build_4x(spark, out_dir)
    if not os.path.isdir(f"{out_dir}/orders.parquet"):
        build_orders_4x(spark, out_dir)
    for name in OPS:
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").count()
        spark.catalog.clearCache()
    print("| operator | 1x | 4x | output 1x -> 4x |")
    print("|---|---|---|---|")
    for name in OPS:
        t1, r1 = time_op(spark, name, SF)
        t4, r4 = time_op(spark, name, out_dir)
        print(f"| {name} | {t1} s | {t4} s | {r1} -> {r4} |")
    spark.stop()


if __name__ == "__main__":
    main()
