"""Round-14 scale probe (verdict item 5): demonstrate parallel scaling at
a DATA-BOUND size.

Every 8-vs-32-core ratio in PERF_r13's scaling block was < 1 because at
sf0.1 (~600k lineitem rows) every bench row is scheduling/overhead-bound
— the board cannot distinguish a shuffle/join win from driver-floor
noise. This probe scales the sf0.1 tables 10x (sf1-equivalent row
counts) ON DISK, then runs the engine's own heaviest shuffling queries
(the registered q3/q18 builders and the uncapped ngram-jaccard operator)
at 8 and at 32 cores in SEPARATE processes (same env contract as
bench.py: master local[$SPARK_GRAFT_CPUS]) and records the
wall-clock ratio t8/t32.

Scaling construction (deterministic, replica r in 0..SCALE-1):
  - lineitem/orders/customer (x SCALE_TPCH, default 40): key' =
    key*SCALE + r for every join key (o_orderkey/l_orderkey,
    c_custkey/o_custkey), all other columns unchanged — per-key join
    fan-out is IDENTICAL to sf0.1, so the join output scales exactly
    SCALE x (no artificial quadratic term).
  - documents (x SCALE_DOCS, default 10): doc_id' = doc_id*SCALE + r and
    each replica's text goes through a replica-specific alphabet
    rotation (translate a-z -> rotate by r), so within-replica
    near-duplicate structure is preserved EXACTLY while replica
    vocabularies are disjoint — posting lists multiply rather than
    densify, the measured real-corpus regime (tools/dedup_octave_probe).
    (A first attempt appended one token per replica: that left shingle
    document-frequency growing SCALE x and made the inverted-index join
    quadratic — not a property 10x of real corpus has.)

Usage:
  python tools/scale_probe_r14.py            # gen (if needed) + both runs + ratios
  python tools/scale_probe_r14.py run 8      # one timed child run (internal)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_TPCH = int(os.environ.get("SCALE_TPCH", "40"))
SCALE_DOCS = int(os.environ.get("SCALE_DOCS", "10"))
OUT_DIR = f"/tmp/scale_probe_r14_t{SCALE_TPCH}_d{SCALE_DOCS}"
N_RUNS = int(os.environ.get("N_RUNS", "2"))

PROBE_QUERIES = ("q3_shipping_priority", "q18_large_orders", "dedup_ngram_jaccard")

_AZ = "abcdefghijklmnopqrstuvwxyz"


def gen():
    """Write the scaled tables once (32 cores, untimed)."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.session import get_spark
    from bigdata_googleplaystore_spark.sources import TESTDATA_TABLES, load_table

    spark = get_spark(app_name="scale-probe-gen")
    spark.sparkContext.setLogLevel("ERROR")

    def expand(name, key_cols, scale, text_col=None):
        r = spark.range(scale).select(F.col("id").alias("_r"))
        df = load_table(spark, SF_DIR, name).crossJoin(F.broadcast(r))
        for k in key_cols:
            df = df.withColumn(k, F.col(k) * scale + F.col("_r"))
        if text_col:
            # replica-specific alphabet rotation: disjoint vocabularies,
            # identical within-replica duplicate structure
            rot = F.when(F.col("_r") == 0, F.col(text_col))
            for i in range(1, scale):
                rot = rot.when(
                    F.col("_r") == i,
                    F.translate(F.col(text_col), _AZ, _AZ[i:] + _AZ[:i]),
                )
            df = df.withColumn(text_col, rot)
        cols = [c for c in df.columns if c != "_r"]
        # the sf0.1 inputs are single files, and crossJoin(broadcast)
        # preserves partitioning — without an explicit repartition the
        # scaled table writes as ONE file and every scan serializes on a
        # single task (measured: q18 at 40x ran 6x slower than its data
        # warranted and showed no 8-vs-32 scaling at all)
        df.select(cols).repartition(64).write.mode("overwrite").parquet(
            f"{OUT_DIR}/{name}.parquet"
        )

    expand("lineitem", ["l_orderkey"], SCALE_TPCH)
    expand("orders", ["o_orderkey", "o_custkey"], SCALE_TPCH)
    expand("customer", ["c_custkey"], SCALE_TPCH)
    expand("documents", ["doc_id"], SCALE_DOCS, text_col="text")
    # small dims the query builders may touch: copy unscaled
    for name in TESTDATA_TABLES:
        if name in ("lineitem", "orders", "customer", "documents"):
            continue
        p = f"{OUT_DIR}/{name}.parquet"
        if not os.path.exists(p):
            load_table(spark, SF_DIR, name).write.mode("overwrite").parquet(p)
    spark.stop()


def run_child(cores: int) -> dict:
    """Timed run at `cores` (invoked as a subprocess with
    SPARK_GRAFT_CPUS set — the bench's core-count contract)."""
    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.session import get_spark
    from bigdata_googleplaystore_spark.sources import load_table

    spark = get_spark(app_name=f"scale-probe-{cores}c")
    spark.sparkContext.setLogLevel("ERROR")

    def fns():
        return {
            "q3_shipping_priority": lambda: QUERIES["q3_shipping_priority"].fn(
                spark, OUT_DIR
            ),
            "q18_large_orders": lambda: QUERIES["q18_large_orders"].fn(
                spark, OUT_DIR
            ),
            "dedup_ngram_jaccard": lambda: dedup.jaccard_pairs(
                load_table(spark, OUT_DIR, "documents"),
                "doc_id",
                "text",
                n=3,
                threshold=0.5,
            ),
        }

    # warm listings + plans once (same policy as bench.py)
    for fn in fns().values():
        fn().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    best = {}
    for _ in range(N_RUNS):
        for name, fn in fns().items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
            spark.catalog.clearCache()
    spark.stop()
    return {k: round(v, 3) for k, v in best.items()}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        cores = int(sys.argv[2])
        print(json.dumps(run_child(cores)))
        return

    if not os.path.exists(f"{OUT_DIR}/documents.parquet"):
        print(
            f"generating x{SCALE_TPCH} tpch / x{SCALE_DOCS} docs under {OUT_DIR} ...",
            file=sys.stderr,
        )
        gen()

    results = {}
    for cores in (32, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", str(cores)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"cores={cores}: {results[cores]}", file=sys.stderr)

    ratios = {
        q: round(results[8][q] / results[32][q], 2) for q in PROBE_QUERIES
    }
    print(
        json.dumps(
            {
                "probe": "scale_r14",
                "scale_tpch": SCALE_TPCH,
                "scale_docs": SCALE_DOCS,
                "t32_sec": results[32],
                "t8_sec": results[8],
                "ratio_t8_over_t32": ratios,
                "note": "ratio > 1 means 32 cores beat 8; ~4x is perfect scaling",
            }
        )
    )


if __name__ == "__main__":
    main()
