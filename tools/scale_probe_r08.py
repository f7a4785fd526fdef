"""Round-8 probe: RETRACTION-capable join-view maintenance vs recompute.

Extends the r07 insert-only structure probe (scale_probe_r07c.py) to the
signed path (operators/incremental.delta_join_signed): the batch now
contains DELETES on orders (every 50th order leaves) and UPDATES on
lineitem (every 50th+1 order's lines get quantity + 5, encoded as
retract(old) + insert(new) — the Z-set form a CDC feed delivers). The
claims measured, not asserted:

1. maintained == recomputed exactly over the post-change tables — the
   same identity the registered gate incremental_join_view_retractions
   hash-checks against DuckDB, re-verified here at sf0.1 before timing;
2. the refresh's only SHUFFLES carry signed delta-partials and |keys|
   state rows (batch-bounded); history enters solely as the probe side
   of BroadcastHashJoins — i.e. retractions keep exactly the insert-only
   path's structure, because a signed delta is just a batch with a
   multiplicity column;
3. the recompute alternative, in the 100 TB large-large regime
   (broadcast disabled), shuffles BOTH full base tables.

Honest boundary (same as r07c): the refresh still scans the base tables
once as broadcast-probe sides; what it never does is shuffle or re-join
history against itself. Timing: pruning-proof noop write, min-of-3.
Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from bigdata_googleplaystore_spark.operators import incremental
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = ["o_orderpriority"]


def timed(df: DataFrame, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="ivm-retraction-probe")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    is_del_o = F.col("o_orderkey") % 50 == 0
    is_upd_l = F.col("o_orderkey") % 50 == 1
    # CDC batch: deletes on orders, updates on lineitem (Z-set encoded)
    delta_o = o.filter(is_del_o).withColumn("_mult", F.lit(-1))
    upd_old = li.filter(is_upd_l)
    delta_l = upd_old.withColumn("_mult", F.lit(-1)).unionByName(
        upd_old.withColumn("l_quantity", F.col("l_quantity") + 5).withColumn(
            "_mult", F.lit(1)
        )
    )
    n_do = delta_o.count()
    n_dl = delta_l.count()
    print(
        f"# batch: {n_do} order deletes ({n_do / o.count():.1%}), "
        f"{n_dl} signed lineitem rows ({n_dl / li.count():.1%})",
        file=sys.stderr,
    )

    # Pre-existing view state (built OUTSIDE the timed region).
    state_dir = os.path.join(tempfile.gettempdir(), "ivm_retraction_probe_state")
    shutil.rmtree(state_dir, ignore_errors=True)
    incremental.partial_agg(
        o.join(li, "o_orderkey"), KEYS, "l_quantity"
    ).write.parquet(state_dir)

    def refresh() -> DataFrame:
        state = spark.read.parquet(state_dir)
        delta = incremental.delta_join_signed(
            o, delta_o, li, delta_l, "o_orderkey"
        )
        return incremental.finalize_signed(
            incremental.merge_partials_signed(
                state, incremental.partial_agg_signed(delta, KEYS, "l_quantity")
            )
        )

    def recompute() -> DataFrame:
        o_new = o.filter(~is_del_o)
        l_new = li.filter(~is_upd_l).unionByName(
            li.filter(is_upd_l).withColumn(
                "l_quantity", F.col("l_quantity") + 5
            )
        )
        return (
            o_new.join(l_new, "o_orderkey")
            .groupBy(*KEYS)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("l_quantity").alias("total"),
                F.avg("l_quantity").alias("vavg"),
            )
        )

    fix = lambda df: sorted(  # noqa: E731
        (r[0], r[1], float(r[2]), round(float(r[3]), 6))
        for r in df.select(
            *KEYS, "n_rows", F.col("total").cast("double"), "vavg"
        ).collect()
    )
    assert fix(refresh()) == fix(recompute()), "signed maintenance != recompute"
    print("# maintained == recomputed (exact), incl. retractions", file=sys.stderr)

    t_refresh = timed(refresh())
    t_recompute = timed(recompute())
    confs = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {c: spark.conf.get(c, None) for c in confs}
    for c in confs:
        spark.conf.set(c, "-1")
    try:
        t_recompute_smj = timed(recompute())
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)

    def exchanges(df: DataFrame) -> tuple[int, int]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning"), plan.count(
            "BroadcastExchange"
        )

    r_shuf, r_bcast = exchanges(refresh())
    for c in confs:
        spark.conf.set(c, "-1")
    try:
        s_shuf, s_bcast = exchanges(recompute())
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)

    print("| path | wall (min-of-3) | vs recompute | shuffle exch | bcast exch |")
    print("|---|---|---|---|---|")
    print(f"| full recompute (default regime) | {t_recompute:.3f}s | 1.00x | — | — |")
    print(
        f"| full recompute (large-large regime, no broadcast) "
        f"| {t_recompute_smj:.3f}s | {t_recompute_smj / t_recompute:.2f}x "
        f"| {s_shuf} (full tables) | {s_bcast} |"
    )
    print(
        f"| signed delta refresh (deletes + updates) | {t_refresh:.3f}s "
        f"| {t_refresh / t_recompute:.2f}x | {r_shuf} (delta/state rows only) "
        f"| {r_bcast} |"
    )
    shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
