"""Skew mitigation for joins and aggregations at scale.

Spark already covers most skew automatically — map-side partial
aggregation absorbs skewed group-by keys, and AQE splits skewed
sort-merge-join partitions at runtime (`spark.sql.adaptive.skewJoin`).
This module supplies the *manual* salting path for the cases AQE can't
fix: a hot key whose matching rows exceed one executor's memory in a
hash join, or a shuffle whose skew is known up front and should never
hit one reducer in the first place.

The reference never meets skew (1.3 MB input); this is pure 100 TB
posture, exercised in tests/test_scale.py against unsalted equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over `n_salts`
    reducers.

    Each big-side row gets a uniform salt in [0, n_salts); the small side
    is replicated once per salt value, so every (key, salt) bucket holds
    the full small-side partition for that key. Join output is identical
    to the plain join for any salt assignment — salting only changes the
    *partitioning*, trading an n_salts× replication of the smaller side
    for a 1/n_salts cap on any single reducer's share of a hot key.

    Use when the small side is too big to broadcast but far smaller than
    the skewed side (the classic fact⨝mid-size-dim skew). `seed` only
    fixes the salt layout for reproducible benchmarks; results never
    depend on it.

    Supported hows: inner / left (big side preserved). right/full would
    emit the replicated small-side copies as spurious unmatched rows —
    rejected rather than silently wrong."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: the "
            "replicated small side makes right/full joins emit one row "
            "per salt copy"
        )
    salted_big = big.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def top_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """The skew census: keys whose row count exceeds `min_count`. Run this
    (cheap: one partial-agg shuffle on the key) to decide between plain,
    salted, or split-broadcast joins — measured skew beats guessed skew."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > min_count)
    )


def split_broadcast_join(
    big: DataFrame,
    other: DataFrame,
    key: str,
    hot_keys: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Hybrid skew join: rows with hot keys join against a *broadcast* of
    the matching `other` slice (no shuffle can skew a broadcast); the
    long tail takes the normal shuffle join. `hot_keys` is typically
    `top_keys(big, key, threshold)` — a one-column frame of skewed keys,
    small by construction.

    union(shuffle-join(tail), broadcast-join(hot)) ≡ join(big, other) for
    inner/left hows: the two branches partition `big` disjointly on key
    membership. right/full are rejected — hot-key `other` rows would
    surface in both branches (null-padded in the tail branch, matched in
    the hot branch)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"split_broadcast_join supports inner/left only, got {how!r}"
        )
    hot = F.broadcast(hot_keys.select(key))
    big_hot = big.join(hot, key, "left_semi")
    big_tail = big.join(hot, key, "left_anti")
    other_hot = other.join(hot, key, "left_semi")
    return big_tail.join(other, key, how).unionByName(
        big_hot.join(F.broadcast(other_hot), key, how)
    )
