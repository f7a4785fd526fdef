"""Stage decompositions for the heavy bench headliners (parameterized;
supersedes tools/stage_decomp_r08.py, r09 verdict item 6).

COVERAGE.md carried a stage decomposition only for dedup_minhash_lsh
(r07); this tool produces the same cumulative-prefix breakdown for the
heaviest standalone entries — the four dedup/graph heavies since r08,
heavy_hitter_terms since r09 — so a future per-operator regression can
be attributed to a STAGE (tokenize? candidate join? verify?) rather
than re-diagnosed from scratch. Each operator runs in its own fresh
session; each cumulative prefix is timed min-of-3 with the
pruning-proof noop write, cache cleared between runs. Prefixes mirror
the operator pipelines (operators/dedup.py, operators/graph.py,
catalog/llm.py dedup_exact_substring) stage for stage.

Usage: `python tools/stage_decomp.py [operator]` — no arg runs all.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K_SPAN = 8


def timed(spark, build, idx: int, runs: int = 3) -> float:
    """Time stage `idx` of the pipeline that `build(spark)` returns,
    REBUILDING the frames for every run. Re-executing a retained frame
    after clearCache is NOT equivalent: once its persist() registration
    is dropped, the plan re-optimizes without the cache boundary and
    CollapseProject fuses the staged projections back into their
    consumers (measured on dedup_minhash_lsh: 0.31 s warm-cache /
    ~2 s fresh-frame vs 9.2 s evicted-frame for the signature stage —
    the fused-expression pathology the staging exists to avoid). Fresh
    frames per run reproduce what a pipeline invocation actually does:
    register the cache, populate it inside the run, reuse it within
    the run."""
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        df = build(spark)[idx][1]
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def stages_minhash(spark):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.sources import load_table

    # Mirror minhash_lsh_pairs' REAL staging: the persisted array-stage
    # shingle frame feeds the signature stage (shingle_arrs=...). Calling
    # minhash_signatures without it would inline the shingle expression
    # into the 64-hash fold — the fused-plan pathology the operator
    # exists to avoid (first probe draft measured 8.6 s vs 0.9 s staged).
    d = load_table(spark, SF, "documents")
    arrs = dedup.shingle_arrays(d, "doc_id", "text", 3).persist()
    sig = dedup.minhash_signatures(
        d, "doc_id", "text", 3, 64, shingle_arrs=arrs
    )
    cands = dedup.lsh_candidate_pairs(sig, 16, 4)
    full = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return [
        ("shingle arrays", arrs),
        ("+minhash signatures", sig),
        ("+band-join candidates", cands),
        ("+exact-jaccard verify (full)", full),
    ]


def stages_ngram(spark):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.operators.dedup import _par
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, SF, "documents")
    sh = dedup.shingle_arrays(d, "doc_id", "text", 3)
    hashed = sh.select(
        "doc",
        F.array_distinct(F.transform("shingles", lambda x: F.xxhash64(x))).alias("hs"),
    )
    s = (
        hashed.select(
            "doc", F.size("hs").alias("set_size"), F.explode_outer("hs").alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
        .repartition(_par(d), "shingle")
    )
    a = s.select(F.col("doc").alias("doc_a"), F.col("set_size").alias("size_a"), "shingle")
    b = s.select(F.col("doc").alias("doc_b"), F.col("set_size").alias("size_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count("*").alias("n_common"))
    )
    full = dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return [
        ("shingle arrays", sh),
        ("+hash/explode index", s),
        ("+inverted self-join intersections", inter),
        ("+jaccard threshold (full)", full),
    ]


def stages_substring(spark):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.functions.text import tokens
    from bigdata_googleplaystore_spark.sources import load_table

    k = K_SPAN
    d = load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
    w = d.select("doc_id", tokens(F.col("text")).alias("ws"))
    spans = F.when(
        F.size("ws") >= k,
        F.expr(
            f"transform(sequence(1, size(ws) - {k - 1}),"
            f" i -> struct(i AS pos,"
            f" xxhash64(array_join(slice(ws, i, {k}), ' ')) AS h))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<pos:int,h:bigint>>)"))
    sp = w.select("doc_id", F.explode(spans).alias("s")).select(
        "doc_id", "s.pos", "s.h"
    )
    # duplicated spans via one count window over h (r14; the previous
    # groupBy(h)+rejoin shape computed the span explode twice)
    from pyspark.sql import Window as _W

    dup = (
        sp.withColumn("c", F.count("*").over(_W.partitionBy("h")))
        .filter(F.col("c") > 1)
        .select("doc_id", "pos")
    )
    cov = dup.groupBy("doc_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.expr(f"sequence(pos, pos + {k - 1})")))
            )
        ).alias("cov")
    )
    from bigdata_googleplaystore_spark.catalog import QUERIES

    full = QUERIES["dedup_exact_substring"].fn(spark, SF)
    return [
        ("tokenize", w),
        ("+span emission", sp),
        ("+dup spans (count window)", dup),
        ("+per-doc coverage", cov),
        ("+rebuild kept_text (full)", full),
    ]


def stages_triangles(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.graph import triangle_count
    from bigdata_googleplaystore_spark.sources import load_table

    e = load_table(spark, SF, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    steps = e.select(
        F.lag("user_id").over(w).alias("pu"), F.col("user_id").alias("cu")
    ).filter(F.col("pu").isNotNull() & (F.col("pu") != F.col("cu")))
    edges = steps.select(F.col("pu").alias("a"), F.col("cu").alias("b"))
    und = (
        edges.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    full = triangle_count(edges)
    return [
        ("co-activity edges (window lag)", edges),
        ("+canonical undirected edges", und),
        ("+degrees", deg),
        ("+orient/adjacency/intersect (full)", full),
    ]


def stages_heavy_hitters(spark):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.functions.text import tokens
    from bigdata_googleplaystore_spark.operators.frequency import heavy_hitters
    from bigdata_googleplaystore_spark.sources import load_table

    # mirror catalog/llm.py heavy_hitter_terms stage for stage
    d = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = d.select(F.explode(tokens(F.col("text"))).alias("term"))

    def local_candidates(batches):
        import pandas as pd

        for pdf in batches:
            s = pdf["term"].dropna()
            if len(s) == 0:
                continue
            counts = s.value_counts()
            cands = counts[counts * 30 >= len(s)]
            yield pd.DataFrame({"item": cands.index.astype(str)})

    candidates = (
        toks.select(F.col("term").cast("string").alias("term"))
        .mapInPandas(local_candidates, "item string")
        .distinct()
    )
    recount = (
        toks.select(F.col("term").cast("string").alias("item"))
        .join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count("*").alias("n"))
    )
    full = heavy_hitters(toks, "term", 30)
    return [
        ("tokenize/explode", toks),
        ("+local MG candidates", candidates),
        ("+broadcast exact recount", recount),
        ("+global threshold (full)", full),
    ]


OPERATORS = {
    "dedup_minhash_lsh": stages_minhash,
    "dedup_ngram_jaccard": stages_ngram,
    "dedup_exact_substring": stages_substring,
    "graph_triangle_count": stages_triangles,
    "heavy_hitter_terms": stages_heavy_hitters,
}


def run_one(name: str) -> None:
    from bigdata_googleplaystore_spark.session import get_spark

    spark = get_spark(app_name=f"stage-decomp-{name}")
    build = OPERATORS[name]
    stages = build(spark)
    for _, df in stages:  # warm every plan first (codegen compile)
        df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    out = []
    for idx, (label, _) in enumerate(stages):
        out.append({"stage": label, "sec": round(timed(spark, build, idx), 3)})
    print(json.dumps({"name": name, "stages": out}))
    spark.stop()


def main() -> None:
    results = []
    for name in OPERATORS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True,
            text=True,
            timeout=900,
        )
        results.append(json.loads(r.stdout.strip().splitlines()[-1]))
    for r in results:
        print(f"| {r['name']} | " + " | ".join(
            f"{s['stage']} {s['sec']:.2f}s" for s in r["stages"]) + " |")
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
    else:
        main()
