"""Round-3 scaling probe: time the round's new operators on the sf0.1
corpus vs a 4x-duplicated copy (documents as exact-dup 4-cliques with
shifted doc_ids; embeddings re-id'd the same way; events duplicated with
shifted user/event ids) — the candidate-explosion stress shape used by the
round-2 probe in COVERAGE.md.

Run when the host is otherwise idle; prints a markdown table row per op.

Note on contrastive_hard_negatives: its anchor set is defined as
vec_id % 40 == 0, so a 4x corpus also has 4x anchors — the probe times
that as-declared shape (16x sim pairs) AND a fixed-anchor variant that
holds the mining batch constant, which is the production configuration.
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

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = [
    "bm25_topk_docs",
    "tokenize_to_vocab_ids",
    "zscore_normalize_features",
    "embedding_random_projection",
    "skew_salted_join",
    "group_holdout_split",
    "temporal_split_leakage",
    "contrastive_hard_negatives",
]


def build_4x(spark, out_dir: str) -> None:
    docs = load_table(spark, SF, "documents")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(4):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_doc)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    d4 = reps[0]
    for r in reps[1:]:
        d4 = d4.unionByName(r)
    d4.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, SF, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    e4 = None
    for i in range(4):
        part = emb.select(
            (F.col("vec_id") + F.lit(i * n_vec)).alias("vec_id"),
            "embedding",
            "label",
        )
        e4 = part if e4 is None else e4.unionByName(part)
    e4.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    ev = load_table(spark, SF, "events")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    v4 = None
    for i in range(4):
        part = ev.select(
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * n_user)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        v4 = part if v4 is None else v4.unionByName(part)
    v4.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def time_op(spark, name: str, sf_dir: str, n_runs: int = 3) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(n_runs):
        t0 = time.perf_counter()
        rows = QUERIES[name].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), rows


def main() -> None:
    spark = get_spark(app_name="scale-probe-r03")
    out_dir = "/tmp/sf0.1_x4_r03"
    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        build_4x(spark, out_dir)
    # warm plans at the small SF
    for name in OPS:
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").count()
    print("| operator | 1x | 4x | output 1x -> 4x |")
    print("|---|---|---|---|")
    for name in OPS:
        t1, r1 = time_op(spark, name, SF)
        t4, r4 = time_op(spark, name, out_dir)
        print(f"| {name} | {t1} s | {t4} s | {r1} -> {r4} |")
    spark.stop()


if __name__ == "__main__":
    main()
