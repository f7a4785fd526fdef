"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the dominant cost of a selective query is how many files (and
row groups) its predicate touches. Partitioning handles ONE
low-cardinality dimension; for two+ numeric/high-cardinality dimensions
the lakehouse answer is Z-ORDER clustering: map each row to a point on a
space-filling curve over the filter columns, then range-partition and
sort by the curve position, so rows close in ANY filter dimension land in
few files and parquet min/max stats exclude the rest.

Public technique (Morton 1966; used by Delta/Iceberg OPTIMIZE ZORDER) —
implemented here as pure JVM expressions: equi-width bucketing from a
broadcast 1-row min/max aggregate (no driver collect, no global window),
bit interleave via shift/or folds, `repartitionByRange` +
`sortWithinPartitions` on the curve key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZCOL = "_zvalue"


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low `bits` bits of each bucket column:
    output bit (b * ncols + i) = bit b of column i. Pure shift/or
    expression tree — whole-stage-codegen friendly, no UDF."""
    ncols = len(bucket_cols)
    parts = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
        )
        for b in range(bits)
        for i, c in enumerate(bucket_cols)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append the Z-curve position over `cols` as `_zvalue`.

    Buckets are equi-width between each column's global min/max, carried
    in via a crossJoin of ONE broadcast row (two numbers per column) —
    the declarative form of the stats lookup; nothing iterates on the
    driver. Nulls order first (bucket 0). Constant columns land in
    bucket 0 (guarded division)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    bits = max(1, min(bits, 63 // len(cols)))  # interleaved key must fit a long
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    nbuckets = F.lit(1 << bits)
    buckets = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        span = hi - lo
        frac = (F.col(c).cast("double") - lo) / span
        b = F.when(
            F.col(c).isNull() | (span <= 0), F.lit(0).cast("long")
        ).otherwise(
            F.least(nbuckets - 1, F.floor(frac * nbuckets)).cast("long")
        )
        buckets.append(b)
    z = _interleave(buckets, bits)
    return with_stats.withColumn(_ZCOL, z).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def zorder_write_parquet(
    df: DataFrame, cols: list[str], path: str, n_files: int, bits: int = 16
) -> None:
    """Cluster `df` on the Z-curve over `cols` and write `n_files`
    parquet files: range-partition by curve position (contiguous curve
    segments per file — range, not hash, is what gives file-level
    locality), sort within each file so row-group min/max stats are
    tight, drop the helper key."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(_ZCOL))
        .sortWithinPartitions(_ZCOL)
        .drop(_ZCOL)
        .write.mode("overwrite")
        .parquet(path)
    )


def global_row_numbers(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row numbering: assign 1..N by a TOTAL order
    without the single-task trap (`row_number() OVER (ORDER BY ...)` with
    no PARTITION BY plans one window task holding the whole table).

    Shape: range-repartition + in-partition sort (range partitioner
    guarantees partition p's rows all order before p+1's), snapshot the
    partitioning (localCheckpoint — the count pass and the assign pass
    MUST see identical boundaries), count rows per partition (only
    |partitions| longs reach the driver), then one Arrow mapInPandas pass
    adds offset[pid] + running index. No global shuffle beyond the sort
    itself; every stage is as parallel as the partition count.

    `order_cols` must be a total order (include a unique tiebreak key) —
    then the assignment is deterministic for ANY boundary placement.
    The checkpointed intermediate is unpersisted before returning."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    sorted_df = (
        df.repartitionByRange(n_parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_fields = sorted_df.drop("_pid").schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_schema += f", {out_col} long"

    def assign(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[out_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    return sorted_df.mapInPandas(assign, out_schema)
