"""Deterministic sampling & splitting for training-data pipelines.

Random splits are poison at 100 TB: rand()-based assignment changes under
retries/re-partitioning, so a document can land in train on one run and
test on the next (leakage). Everything here derives its randomness from a
content/id hash — the assignment is a pure function of the row, stable
across runs, partitionings, and engines.

md5 (not xxhash64) is the hash so DuckDB oracles can replicate the split
bit-for-bit: the first 8 hex chars, read as an integer, are uniform on
[0, 16^8) for hashed input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(16**8)


def hash_uniform(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from an id: first 8 md5 hex chars of
    (salt || id) as an integer, scaled. Salt decorrelates independent
    splits over the same ids (e.g. a second fold)."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Add a `split` column assigning each row to a named split with the
    given fractions (must sum to 1). Assignment is per-row deterministic:
    u = hash_uniform(id) falls into consecutive fraction intervals."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_uniform(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def quota_per_group(
    df: DataFrame, group_col: str, id_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Keep at most `n` rows per group, chosen by hash order (a stable
    'random' subset — re-runs pick the same rows). The per-source quota
    cap every corpus-mixing pipeline needs so one crawl can't dominate.
    One shuffle (window by group); ranking key is (hash, id) — a total
    order, so the quota boundary is unambiguous."""
    u = hash_uniform(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )


def weighted_resample(
    df: DataFrame,
    weight: Column,
    id_col: str,
    salt: str = "",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Resample rows to a fractional per-row `weight` (e.g. a domain-mixture
    temperature weight): each row is repeated floor(w) times plus one extra
    copy with probability frac(w), decided by the row's id hash — so the
    realized corpus mixture matches the target weights in expectation while
    every run (and every engine) reproduces the exact same sample.

    Rows with effective count 0 are dropped. The fan-out is a narrow
    `explode(sequence(...))` — no shuffle, no driver loop; at 100 TB the
    output partition count simply grows with sum(w)/n and AQE re-splits
    oversized partitions."""
    u = hash_uniform(F.col(id_col), salt)
    n_copies = (
        F.floor(weight) + F.when(u < weight - F.floor(weight), 1).otherwise(0)
    ).cast("long")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n_copies"))),
        )
        .drop("_n_copies")
    )
