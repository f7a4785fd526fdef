"""Round-6 scale probe #3: the multimodal image pipeline corpus curve.

The multimodal family's 100 TB claim is that encode/decode/hash are
map-only Arrow-batched passes (payload bytes never leave the executor)
and dedup shuffles only 8-byte sketches — so wall-clock should track
corpus size linearly. Probe shape: 4x-DISTINCT — four copies of the
sf0.1 documents corpus with ids offset by 100M*i and copy index i
appended to the text, so every image is unique (no cross-copy hash
groups densify) and the planted structure of the recall query is
reproduced per copy. The timed pipeline is render-to-PNG -> decode ->
8x8 thumbnail -> aHash -> equal-hash pair join (ahash_dup_pairs), the
exact chain dedup_image_ahash_recall gates.

Timing uses the same pruning-proof noop-write action as bench.py.
Prints a markdown table for COVERAGE.md. Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from bigdata_googleplaystore_spark.operators import multimodal
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, copies: int) -> DataFrame:
    d = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    reps = []
    for i in range(copies):
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copy{i}")).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out


def pipeline(docs: DataFrame) -> DataFrame:
    media = multimodal.attach_media_payload(docs, "text", "doc_id", kind="png")
    return multimodal.ahash_dup_pairs(media)


def timed(df: DataFrame, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="ahash-scale-probe")
    rows = {}
    for tag, copies in (("1x", 1), ("4x", 4)):
        docs = build(spark, copies)
        n_docs = docs.count()
        pipeline(docs).write.format("noop").mode("overwrite").save()  # warm
        w = timed(pipeline(docs))
        rows[tag] = (n_docs, w)
        print(f"# {tag}: docs={n_docs} best={w:.3f}s", file=sys.stderr)
    (n1, w1), (n4, w4) = rows["1x"], rows["4x"]
    print("| corpus | images | wall (min-of-3) | ratio |")
    print("|---|---|---|---|")
    print(f"| 1x sf0.1 | {n1} | {w1:.3f}s | 1.00x |")
    print(f"| 4x distinct | {n4} | {w4:.3f}s | {w4 / w1:.2f}x |")
    assert n4 == 4 * n1
    spark.stop()


if __name__ == "__main__":
    main()
