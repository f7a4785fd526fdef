"""r14 A/B: dedup_exact_substring duplicate-span detection —
groupBy(h)+rejoin (old) vs count window over h (new). Interleaved
min-of-N in one session so both shapes see the same host moment.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.functions.text import tokens
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("N_RUNS", "5"))
K = 8


def build(spark, shape: str):
    d = load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
    w = d.select("doc_id", tokens(F.col("text")).alias("ws")).persist()
    spans = F.when(
        F.size("ws") >= K,
        F.expr(
            f"transform(sequence(1, size(ws) - {K - 1}),"
            f" i -> struct(i AS pos,"
            f" xxhash64(array_join(slice(ws, i, {K}), ' ')) AS h))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<pos:int,h:bigint>>)"))
    sp = w.select("doc_id", F.explode(spans).alias("s")).select(
        "doc_id", "s.pos", "s.h"
    )
    if shape == "join":
        cnt = sp.groupBy("h").agg(F.count("*").alias("c"))
        dup = sp.join(cnt.filter(F.col("c") > 1), "h").select("doc_id", "pos")
    else:
        dup = (
            sp.withColumn("c", F.count("*").over(Window.partitionBy("h")))
            .filter(F.col("c") > 1)
            .select("doc_id", "pos")
        )
    cov = dup.groupBy("doc_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.expr(f"sequence(pos, pos + {K - 1})")))
            )
        ).alias("cov")
    )
    joined = w.join(cov, "doc_id", "left").withColumn(
        "covc", F.coalesce(F.col("cov"), F.expr("CAST(array() AS array<int>)"))
    )
    n = F.size("ws")
    return joined.select(
        "doc_id",
        n.alias("n_words"),
        F.size("covc").alias("n_removed"),
        F.round(F.size("covc").cast("double") / n, 6).alias("removed_frac"),
        F.array_join(
            F.expr("filter(ws, (x, i) -> NOT array_contains(covc, i + 1))"), " "
        ).alias("kept_text"),
    )


def main():
    spark = get_spark(app_name="substr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both plans
    for shape in ("join", "window"):
        build(spark, shape).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    best = {"join": float("inf"), "window": float("inf")}
    for _ in range(N):
        for shape in ("join", "window"):
            t0 = time.perf_counter()
            build(spark, shape).write.format("noop").mode("overwrite").save()
            best[shape] = min(best[shape], time.perf_counter() - t0)
            spark.catalog.clearCache()
    print({k: round(v, 3) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
