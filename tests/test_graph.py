"""Weighted PageRank: numerics vs a plain-python reference, determinism,
and the rank-mass invariant."""

from __future__ import annotations

import collections

from bigdata_googleplaystore_spark.operators.graph import pagerank


def _ref_pagerank(edges, nodes, iters, d=0.85):
    outw = collections.defaultdict(float)
    for s, _, w in edges:
        outw[s] += w
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = collections.defaultdict(float)
        for s, t, w in edges:
            contrib[t] += ranks[s] * w / outw[s]
        ranks = {n: (1 - d) + d * contrib.get(n, 0.0) for n in nodes}
    return ranks


def test_pagerank_matches_reference_loop(spark):
    edges = [
        ("a", "b", 1.0),
        ("a", "c", 1.0),
        ("b", "c", 2.0),
        ("c", "a", 1.0),
        ("d", "a", 1.0),  # d is dangling-in only; keeps base rank
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=12, weight="w").collect()
    }
    ref = _ref_pagerank(edges, "abcd", 12)
    assert got.keys() == ref.keys()
    for n in ref:
        assert abs(got[n] - ref[n]) < 1e-9, (n, got[n], ref[n])
    # more in-weight => more rank: c receives from both a and b
    assert got["c"] > got["b"] > got["d"]


def test_pagerank_partition_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}", float(i % 3 + 1)) for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    a = {r["node"]: r["rank"] for r in pagerank(df, iterations=6, weight="w").collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(11), iterations=6, weight="w").collect()
    }
    assert a.keys() == b.keys()
    for n in a:
        assert abs(a[n] - b[n]) < 1e-9


def test_triangle_count_known_graph(spark):
    """Hand-built graph with exactly 3 triangles: K4 on {1,2,3,4} has 4,
    minus edge (1,2) leaves 2 ({1,3,4},{2,3,4}); plus triangle {5,6,7};
    node 8 dangles. Edges arrive unordered/duplicated/self-looped to
    exercise canonicalization."""
    from bigdata_googleplaystore_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [
            (1, 3), (3, 1), (1, 4), (2, 3), (2, 4), (3, 4),
            (5, 6), (6, 7), (7, 5), (5, 5), (7, 8),
        ],
        "a long, b long",
    )
    for method in ("edge_iter", "wedge"):
        row = triangle_count(edges, method=method).collect()[0]
        assert row.n_nodes == 8
        assert row.n_edges == 9  # 5 in K4-minus-edge + 3 triangle + (7,8); self-loop/dup dropped
        assert row.n_triangles == 3, method


def test_triangle_count_orientation_matches_naive(spark):
    """The degree-ordered wedge join must count exactly what the naive
    a<b<c enumeration counts, on a pseudo-random graph dense enough to
    have ties and hubs."""
    from bigdata_googleplaystore_spark.operators.graph import triangle_count
    from pyspark.sql import functions as F

    e = (
        spark.range(300)
        .select(
            (F.xxhash64("id", F.lit(1)) % 40).alias("a"),
            (F.xxhash64("id", F.lit(2)) % 40).alias("b"),
        )
        .select(F.abs("a").alias("a"), F.abs("b").alias("b"))
    )
    row = triangle_count(e).collect()[0]
    row_wedge = triangle_count(e, method="wedge").collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        row_wedge.n_nodes, row_wedge.n_edges, row_wedge.n_triangles,
    )
    und = (
        e.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    pdf = und.toPandas()
    es = set(map(tuple, pdf.values))
    nodes = sorted({x for p in es for x in p})
    naive = sum(
        1
        for i, x in enumerate(nodes)
        for y in nodes[i + 1:]
        if (x, y) in es
        for z in nodes
        if z > y and (x, z) in es and (y, z) in es
    )
    assert row.n_triangles == naive
    assert row.n_edges == len(es)


def test_triangle_count_rejects_unknown_method(spark):
    import pytest

    from bigdata_googleplaystore_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="unknown method"):
        triangle_count(edges, method="bogus")


def test_triangle_count_hub_star_graph(spark):
    """Hub stress: a 50-leaf star has no triangles (every wedge is open);
    closing one leaf pair adds exactly one. The hub's degree dwarfs every
    leaf's, so orientation points every edge leaf->hub — the case where
    a wrong orientation direction would explode the hub's out-list."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.graph import triangle_count

    star = spark.range(1, 51).select(
        F.col("id").alias("a"), F.lit(0).cast("long").alias("b")
    )
    for method in ("edge_iter", "wedge"):
        r = triangle_count(star, method=method).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles) == (51, 50, 0), method
    closed = star.unionAll(
        spark.createDataFrame([(1, 2)], "a long, b long")
    )
    for method in ("edge_iter", "wedge"):
        r = triangle_count(closed, method=method).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles) == (51, 51, 1), method
