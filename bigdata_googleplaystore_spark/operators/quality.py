"""Data-quality expectations: declarative checks compiled to one aggregate
per table plus anti-join FK probes — the validation pass a training-data
pipeline runs before promoting a snapshot.

Each check yields one row (check_name, n_bad, n_total, ok). Scale posture:
a table's null/range checks fuse into a SINGLE scan+agg over that table
(conditional sums, no per-check scans); referential checks are left-anti
joins on the key — shuffle-partitioned on the FK, or broadcast when the
parent's key projection is small enough for AQE to elect it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_agg(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Fuse boolean 'bad row' predicates into one scan: each check counts
    rows where its predicate is TRUE (nulls in the predicate count as not
    bad — write the predicate to catch them explicitly)."""
    total = F.count("*")
    aggs = []
    # check names may contain dots (table.column); index the agg row
    # positionally-safe internal aliases instead
    names = list(checks)
    for i, name in enumerate(names):
        aggs.append(
            F.sum(F.when(checks[name], 1).otherwise(0)).cast("long").alias(f"__bad_{i}")
        )
    row = df.agg(total.cast("long").alias("__total"), *aggs)
    stacked = None
    for i, name in enumerate(names):
        one = row.select(
            F.lit(name).alias("check_name"),
            F.col(f"__bad_{i}").alias("n_bad"),
            F.col("__total").alias("n_total"),
        )
        stacked = one if stacked is None else stacked.unionAll(one)
    return stacked.withColumn("ok", F.col("n_bad") == 0)


def expect_fk(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Referential integrity: count child rows whose non-null key has no
    parent row (orphans)."""
    c = child.select(F.col(child_key).alias("__k")).filter(F.col("__k").isNotNull())
    p = parent.select(F.col(parent_key).alias("__k")).distinct()
    orphans = c.join(p, "__k", "left_anti").agg(
        F.count("*").cast("long").alias("n_bad")
    )
    totals = c.agg(F.count("*").cast("long").alias("n_total"))
    return (
        orphans.crossJoin(totals)
        .select(
            F.lit(name).alias("check_name"),
            "n_bad",
            "n_total",
            (F.col("n_bad") == 0).alias("ok"),
        )
    )


def with_metrics(df: DataFrame, name: str, *metrics: Column):
    """Zero-cost pipeline observability via `Dataset.observe`: the metric
    aggregates are computed AS the query runs (inside the same tasks that
    produce the output) — no second scan, no extra job. Returns
    (observed_df, observation); after any action on the observed frame,
    `observation.get` yields the metric dict. The operational pattern for
    row-count / null-count / checksum accounting on every pipeline write
    at 100 TB, where 'run the audit query again' would double the bill."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
