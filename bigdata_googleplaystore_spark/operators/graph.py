"""Iterative graph algorithms on DataFrames: weighted PageRank.

Companion to the connected-components operator (operators/dedup.py):
the same driver-iterated join-agg loop, which is how iterative graph
algorithms run on Spark without GraphX (whose RDD API the DataFrame
optimizer can't see). Each iteration is one join + one aggregation —
both shuffle on the node key, so successive iterations reuse the same
partitioning; `localCheckpoint` every few rounds truncates the lineage
that would otherwise grow linearly with iteration count and re-execute
from scratch on any task retry.

Scale posture: state per iteration is one (node, rank) row per node —
never materialized on the driver; only the converged/last iteration is
returned. Dangling nodes (no out-edges) keep their base rank and do not
redistribute (documented deviation from the strict random-surfer model;
acceptable for ranking use and avoids a per-iteration global sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns (node, rank).

    Unnormalized form: rank = (1-d) + d * sum(in-contributions), so ranks
    sum to ~N and are comparable across graph sizes. With `weight`,
    contributions split proportionally to edge weight instead of evenly.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.cast("double").alias("w")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # edge transition probabilities, computed once and reused every round
    trans = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    trans = trans.localCheckpoint()

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank")).localCheckpoint()

    for i in range(iterations):
        contribs = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks
