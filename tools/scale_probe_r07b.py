"""Round-7 scale probe: graph_triangle_count HUB regime.

Companion to tools/scale_probe_r06b.py (the 4x-disjoint corpus curve):
that probe showed linear scaling when the duplicate structure is flat;
this one stresses the opposite regime — a few super-hubs, the shape
that kills naive triangle counting on real graphs (a hub of degree h
contributes h^2 wedges if edges orient away from it).

Shape: the sf0.1 co-activity graph (~1.5k nodes, ~95k edges) plus
H=8 hub nodes, each connected to EVERY base node and to each other.
Max raw degree jumps from ~base to N+H-1 (~1,507), but the operator's
(degree, id) orientation points every base->hub edge AT the hub, so a
hub's OUT-degree stays <= H-1: the sum-of-out-deg^2 intersection work
is still bounded by the base structure, not by the hubs.

The triangle count has a closed form, asserted exactly:
    tri(hub graph) = tri(base)                      (base triangles)
                   + H * |E_base|                   (hub-base-base: every
                                                     base edge closes with
                                                     every hub)
                   + C(H,2) * N_base                (hub-hub-base)
                   + C(H,3)                         (hub-hub-hub)

Reported: nodes/edges/triangles (asserted vs closed form), max raw
degree vs max ORIENTED out-degree for both graphs (the cap at work),
and min-of-3 noop-write wall-clock. Pass criterion: hub wall-clock
stays near base wall-clock (edges only grow ~13%) instead of blowing
up with the ~2.3M wedges/hub a hub-oriented adjacency would create.

Run on an otherwise-idle host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from bigdata_googleplaystore_spark.operators.graph import triangle_count
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
H = 8  # hub count
HUB_BASE_ID = 1_000_000_000  # above any sf user_id


def edges_from_events(ev: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    e = ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    steps = e.select(
        F.lag("user_id").over(w).alias("pu"), F.col("user_id").alias("cu")
    ).filter(F.col("pu").isNotNull() & (F.col("pu") != F.col("cu")))
    return steps.select(F.col("pu").alias("a"), F.col("cu").alias("b"))


def hub_overlay(spark, base_edges: DataFrame) -> DataFrame:
    """base edges + H hubs connected to every base node and each other."""
    nodes = (
        base_edges.select(F.col("a").alias("n"))
        .unionAll(base_edges.select(F.col("b").alias("n")))
        .distinct()
    )
    hubs = spark.range(H).select((F.col("id") + HUB_BASE_ID).alias("h"))
    hub_base = nodes.crossJoin(hubs).select(
        F.col("n").alias("a"), F.col("h").alias("b")
    )  # hubs frame is H rows -> broadcast cross join, not a real cartesian
    hub_hub = (
        hubs.alias("x")
        .crossJoin(hubs.alias("y"))
        .filter(F.col("x.h") < F.col("y.h"))
        .select(F.col("x.h").alias("a"), F.col("y.h").alias("b"))
    )
    return base_edges.unionAll(hub_base).unionAll(hub_hub)


def oriented_out_degrees(edges: DataFrame) -> DataFrame:
    """Replicates the operator's canonicalization + (degree, id)
    orientation to expose max raw degree vs max oriented out-degree."""
    und = (
        edges.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("u"),
            )
            .otherwise(F.col("v"))
            .alias("s")
        )
    )
    out_deg = oriented.groupBy("s").agg(F.count("*").alias("out_deg"))
    return deg.agg(F.max("deg").alias("max_deg")).crossJoin(
        out_deg.agg(F.max("out_deg").alias("max_out_deg"))
    )


def timed(df: DataFrame, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="triangle-hub-probe")
    base = edges_from_events(load_table(spark, SF, "events"))
    hub = hub_overlay(spark, base)

    rows = {}
    for tag, edges in (("base", base), ("hub", hub)):
        r = triangle_count(edges).collect()[0]
        d = oriented_out_degrees(edges).collect()[0]
        t = timed(triangle_count(edges))
        rows[tag] = (r.n_nodes, r.n_edges, r.n_triangles, d.max_deg, d.max_out_deg, t)
        print(
            f"# {tag}: nodes={r.n_nodes} edges={r.n_edges} "
            f"triangles={r.n_triangles} max_deg={d.max_deg} "
            f"max_out_deg={d.max_out_deg} best={t:.3f}s",
            file=sys.stderr,
        )

    n1, e1, t1, d1, o1, w1 = rows["base"]
    n2, e2, t2, d2, o2, w2 = rows["hub"]
    # closed-form expectations for the overlay
    exp_nodes = n1 + H
    exp_edges = e1 + n1 * H + H * (H - 1) // 2
    exp_tri = t1 + H * e1 + (H * (H - 1) // 2) * n1 + H * (H - 1) * (H - 2) // 6
    assert (n2, e2, t2) == (exp_nodes, exp_edges, exp_tri), (
        f"hub overlay closed form mismatch: got {(n2, e2, t2)}, "
        f"expected {(exp_nodes, exp_edges, exp_tri)}"
    )
    assert d2 >= n1, "hubs should dominate raw degree"
    print("| graph | nodes | edges | triangles | max deg | max out-deg | wall (min-of-3) | ratio |")
    print("|---|---|---|---|---|---|---|---|")
    print(f"| base sf0.1 | {n1} | {e1} | {t1} | {d1} | {o1} | {w1:.3f}s | 1.00x |")
    print(
        f"| +{H} hubs | {n2} | {e2} | {t2} | {d2} | {o2} | {w2:.3f}s | {w2 / w1:.2f}x |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
