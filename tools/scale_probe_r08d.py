"""Round-8 probe: state-table compaction caps read fan-in — measured.

streaming.compact_state_partials' gate (mv_state_compaction) hash-checks
semantics on a 4-batch toy; this probe measures the cost claim on a
64-batch state table at sf0.1: a per-micro-batch MV state accumulates one
partition (and >= one file) per batch, so the LATEST-view fold reads
O(batches) files forever. After compacting batches 0..55 into one base,
the same read touches 1 base + 7 recent partitions. Files read and wall
time are harvested for both, plus the folded view equality — the read
path is untouched by design, so the numbers isolate pure fan-in.

At 100 TB cadence (a batch per minute), an uncompacted month is ~43k
partitions; footer/listing overhead dominates reads long before data
volume does. Compaction is the bound.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark import streaming
from bigdata_googleplaystore_spark.operators import incremental
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 64
KEEP_RECENT = 8  # compact everything below N_BATCHES - KEEP_RECENT


def _count_files(root: str) -> int:
    n = 0
    for _dir, _sub, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _timed_fold(spark, state):
    t0 = time.perf_counter()
    rows = sorted(
        (r["o_orderpriority"], r["n_rows"], float(r["total"]))
        for r in streaming.read_incremental_state(spark, state).collect()
    )
    return time.perf_counter() - t0, rows


def main() -> None:
    spark = get_spark("compaction-probe")
    o = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(12,2)").alias("v"),
    )
    state = os.path.join(tempfile.gettempdir(), "compact_probe_state")
    shutil.rmtree(state, ignore_errors=True)
    for b in range(N_BATCHES):
        streaming.write_batch_partition(
            incremental.partial_agg(
                o.filter(F.col("o_orderkey") % N_BATCHES == b).drop("o_orderkey"),
                ["o_orderpriority"],
                "v",
            ),
            state,
            b,
        )

    files_before = _count_files(state)
    _timed_fold(spark, state)  # warmup
    t_before, rows_before = _timed_fold(spark, state)

    horizon = N_BATCHES - KEEP_RECENT
    t0 = time.perf_counter()
    removed = streaming.compact_state_partials(spark, state, upto_batch=horizon)
    t_compact = time.perf_counter() - t0

    files_after = _count_files(state)
    _timed_fold(spark, state)  # warmup (fresh file listing)
    t_after, rows_after = _timed_fold(spark, state)

    assert rows_before == rows_after, "compaction changed the view!"
    print(f"sf={SF} batches={N_BATCHES} horizon={horizon} removed={removed}")
    print(
        f"files: {files_before} -> {files_after} "
        f"({files_before / files_after:.1f}x fan-in cut)"
    )
    print(
        f"latest-view fold: {t_before:.3f}s -> {t_after:.3f}s "
        f"(compaction itself: {t_compact:.3f}s, amortized over every "
        f"future read)"
    )
    shutil.rmtree(state, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
