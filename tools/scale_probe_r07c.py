"""Round-7 probe: incremental join-view maintenance vs full recompute.

Measures the claim behind operators/incremental.delta_join at sf0.1:
refreshing a per-priority rollup over orders ⋈ lineitem with a ~2%
ingest batch on EACH side should cost less than recomputing the view,
because the refresh never shuffles history — the three delta terms are
broadcast joins of the batch against the base tables (map-side probe),
and the state fold shuffles |keys| partial rows.

Honest boundary, stated up front: the refresh still SCANS both base
tables once (as the probe side of the broadcast joins); what it
eliminates is the full-table shuffle + history-vs-history join of a
recompute. Eliminating the history SCAN too is a layout concern, and
composes with the engine's existing pieces: partition/bucket the base
tables by the join key and the broadcast delta keys prune the scan the
same way dpp_partition_pruned_join / bucketed_join_no_shuffle do.

The probe also asserts maintained == recomputed exactly (the same
identity the registered query incremental_join_view_maintenance
hash-checks against DuckDB). Timing: pruning-proof noop write,
min-of-3. Run on an otherwise-idle host.
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
    spark = get_spark(app_name="ivm-join-probe")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    is_new_o = F.col("o_orderkey") % 50 == 0
    is_new_l = F.col("o_orderkey") % 50 == 1
    o_old, o_new = o.filter(~is_new_o), o.filter(is_new_o)
    l_old, l_new = li.filter(~is_new_l), li.filter(is_new_l)
    n_do, n_dl = o_new.count(), l_new.count()
    print(
        f"# deltas: {n_do} orders ({n_do / o.count():.1%}), "
        f"{n_dl} lineitems ({n_dl / li.count():.1%})",
        file=sys.stderr,
    )

    # Pre-existing view state (what a deployment has on disk already) —
    # built and stored OUTSIDE the timed region.
    state_dir = os.path.join(tempfile.gettempdir(), "ivm_probe_state")
    shutil.rmtree(state_dir, ignore_errors=True)
    incremental.partial_agg(
        o_old.join(l_old, "o_orderkey"), KEYS, "l_quantity"
    ).write.parquet(state_dir)

    def refresh() -> DataFrame:
        state = spark.read.parquet(state_dir)
        delta = incremental.delta_join(o_old, o_new, l_old, l_new, "o_orderkey")
        return incremental.finalize(
            incremental.merge_partials(
                state, incremental.partial_agg(delta, KEYS, "l_quantity")
            )
        )

    def recompute() -> DataFrame:
        return incremental.finalize(
            incremental.partial_agg(o.join(li, "o_orderkey"), KEYS, "l_quantity")
        )

    # exactness first (same identity the registered query hash-checks)
    fix = lambda df: sorted(  # noqa: E731
        (r[0], r[1], float(r[2]), float(r[3]), float(r[4]))
        for r in df.select(
            *KEYS, "n_rows", F.col("total").cast("double"), "vmin", "vmax"
        ).collect()
    )
    assert fix(refresh()) == fix(recompute()), "maintenance != recompute"

    t_refresh = timed(refresh())
    t_recompute = timed(recompute())
    # The 100 TB regime: history too big to broadcast, so a recompute is
    # a full-shuffle SortMergeJoin — the refresh keeps its broadcasts
    # because the DELTAS are small regardless of history size.
    confs = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",  # AQE re-enables otherwise
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
    # Shuffle structure — the quantity that actually scales with history
    # size. Count shuffle exchanges (hashpartitioning) vs broadcast
    # exchanges in each static plan: the refresh's only SHUFFLES carry
    # delta-partial/state rows (batch-bounded); history enters solely as
    # the probe side of BroadcastHashJoins.
    def exchanges(df: DataFrame) -> tuple[int, int]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuf = plan.count("Exchange hashpartitioning")
        bcast = plan.count("BroadcastExchange")
        return shuf, bcast

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
    print(f"| full recompute (large-large regime, no broadcast) "
          f"| {t_recompute_smj:.3f}s | {t_recompute_smj / t_recompute:.2f}x "
          f"| {s_shuf} (full tables) | {s_bcast} |")
    print(f"| delta refresh (~2% batches both sides) | {t_refresh:.3f}s "
          f"| {t_refresh / t_recompute:.2f}x | {r_shuf} (delta/state rows only) "
          f"| {r_bcast} |")
    shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
