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
