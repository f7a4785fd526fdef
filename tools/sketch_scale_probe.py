"""Sketch-tier scale probe: sketch size stays CONSTANT and build cost
stays LINEAR while the input grows 16x — the property that makes the
KMV/theta and count-min tier the 100 TB answer to distinct counts and
frequency queries (operators/sketches.py).

Octaves: N in {200k, 800k, 3.2M} synthetic distinct values (KMV) and
token streams over a growing vocabulary (CMS). For each octave:
- KMV: build k=256 sketch, record wall, sketch rows (must be k), and
  |est - N| / N (4-sigma bound ~ 25% at k=256).
- CMS: aggregate counts, build 4x512 matrix, record wall, matrix rows
  (must be <= 2048), and the top-20 point-query max overestimate
  relative to the 2N/512 Markov bound.

Usage: python tools/sketch_scale_probe.py  (local[32], ~2 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_googleplaystore_spark.operators import sketches  # noqa: E402
from bigdata_googleplaystore_spark.session import get_spark  # noqa: E402


def kmv_octave(spark, n: int) -> dict:
    df = spark.range(n).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
        F.lit("g").alias("g"),
    )
    t0 = time.time()
    sk = sketches.kmv_sketch(df, ["g"], "v", k=256)
    est_row = sketches.kmv_estimate(sk, ["g"], k=256).collect()[0]
    wall = time.time() - t0
    rows = sk.count()
    return {
        "n": n,
        "wall_s": round(wall, 3),
        "sketch_rows": rows,
        "rel_err": round(abs(est_row["kmv_est"] - n) / n, 4),
    }


def cms_octave(spark, n_tokens: int, vocab: int) -> dict:
    # skewed stream: token t{id % vocab}, so low ids are uniform but the
    # count frame is vocab-sized; heavy items planted by squaring skew
    toks = spark.range(n_tokens).select(
        F.concat(
            F.lit("t"),
            (F.col("id") % vocab * (F.col("id") % vocab) % vocab).cast("string"),
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").cast("long").alias("n"))
    t0 = time.time()
    matrix = sketches.cms_build(counts, "tok", "n", depth=4, width=512)
    mrows = matrix.count()
    top = counts.orderBy(F.col("n").desc(), "tok").limit(20)
    res = sketches.cms_lookup(matrix, top, "tok", depth=4, width=512).collect()
    wall = time.time() - t0
    over = max(r["cms_est"] - r["n"] for r in res)
    bound = 2.0 * n_tokens / 512
    return {
        "n_tokens": n_tokens,
        "vocab": vocab,
        "wall_s": round(wall, 3),
        "matrix_rows": mrows,
        "max_overestimate": int(over),
        "markov_bound_2N_over_w": int(bound),
        "within_bound": bool(over <= bound),
    }


def main() -> None:
    spark = get_spark(app_name="sketch-scale-probe", shuffle_partitions=32)
    # warm the whole-stage-codegen caches so octave 1 isn't compile-bound
    kmv_octave(spark, 50_000)
    cms_octave(spark, 50_000, 5_000)
    out = {"kmv": [], "cms": []}
    for n in (200_000, 800_000, 3_200_000):
        out["kmv"].append(kmv_octave(spark, n))
        print("kmv", out["kmv"][-1], flush=True)
    for n, v in ((400_000, 20_000), (1_600_000, 80_000), (6_400_000, 320_000)):
        out["cms"].append(cms_octave(spark, n, v))
        print("cms", out["cms"][-1], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
