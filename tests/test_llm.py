"""Correctness of the approximate LLM-pipeline operators against their
exact counterparts (the driver only rows-only-checks these; the real
guarantees are asserted here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import dedup, similarity
from bigdata_googleplaystore_spark.sources import load_table


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_lsh_finds_planted_dups(spark, sf_dir):
    """The corpus has planted near-dups (Jaccard >= 0.8) with background
    pairs < 0.1: at 16 bands x 4 rows the LSH s-curve catches >= 0.8 pairs
    with probability ~1-2e-4 each, so LSH output must equal the exact
    inverted-index join here."""
    d = load_table(spark, sf_dir, "documents")
    exact = _pairs(dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5))
    lsh = _pairs(dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5))
    assert lsh == exact
    assert len(exact) > 0, "corpus should contain planted near-dups"


def test_simhash_catches_near_dups(spark, sf_dir):
    """SimHash at Hamming<=8: high recall on the planted >=0.9-Jaccard
    pairs (measured: J 0.97-0.99 pairs land at Hamming 0-6, tail to ~12)
    and zero background false positives (random 64-bit sigs differ ~32
    bits, so any reported pair must be genuinely similar)."""
    d = load_table(spark, sf_dir, "documents")
    exact_set = _pairs(dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5))
    sim_set = _pairs(dedup.simhash_near_pairs(d, "doc_id", "text", n=3, max_hamming=8))
    assert sim_set <= exact_set, f"simhash false positives: {sim_set - exact_set}"
    recall = len(sim_set & exact_set) / len(exact_set)
    assert recall >= 0.7, f"simhash recall too low: {recall:.2f}"


def test_ann_recall_vs_brute_force(spark, sf_dir):
    """LSH ANN with 1-bit multiprobe should recover a solid fraction of
    the exact top-5 (random 64-dim data is the hard case; require >= 40%
    overall and a non-crazy per-query shape)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 10)
    queries = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.lsh_ann_topk(corpus, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"ANN recall too low: {recall:.2f}"


def test_exact_dedup_is_lossless(spark, sf_dir):
    """Exact dedup keeps one keeper per distinct content and accounts for
    every row."""
    d = load_table(spark, sf_dir, "documents")
    out = dedup.exact_dedup(d, ["lang", "source", "text"], "doc_id")
    assert out.agg(F.sum("n_copies")).collect()[0][0] == d.count()
    assert out.select("keep_id").distinct().count() == out.count()


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with 6/16 probes on random 64-dim vectors (the no-cluster hard
    case): decent recall of the exact top-5, and never a false similarity
    value (candidates are ranked with the exact metric)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 10)
    queries = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["cand_id"]): r["sim"]
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"]): r["sim"]
        for r in similarity.ivf_topk(
            corpus, queries, k=5, n_cells=16, n_probe=6
        ).collect()
    }
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall:.2f}"
    for pair in set(exact) & set(approx):
        assert exact[pair] == approx[pair]  # exact metric on candidates


def test_kmeans_centroids_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    c1 = similarity.kmeans_centroids(e, k=8, iters=2)
    c2 = similarity.kmeans_centroids(e.repartition(13), k=8, iters=2)
    assert len(c1) == 8
    for a, b in zip(c1, c2):
        assert a == pytest.approx(b, abs=1e-9)


def test_connected_components_chain_and_islands(spark):
    """A 6-node chain (diameter forces several propagation rounds), a
    triangle, and an isolated pair must each collapse to their min id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),       # chain 1-6
         (10, 11), (11, 12), (10, 12),                 # triangle
         (20, 21)],                                    # pair
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_hash_split_deterministic_and_partition_invariant(spark, sf_dir):
    from bigdata_googleplaystore_spark.operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    f = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id", f).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.repartition(13), "doc_id", f).collect()
    }
    assert a == b  # pure function of the row
    n = len(a)
    train_frac = sum(1 for v in a.values() if v == "train") / n
    assert 0.7 < train_frac < 0.9  # roughly the asked fraction
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(d, "doc_id", {"train": 0.5})


def test_quota_per_group_stable_subset(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.sampling import quota_per_group

    d = load_table(spark, sf_dir, "documents")
    q1 = {r["doc_id"] for r in quota_per_group(d, "source", "doc_id", 5).collect()}
    q2 = {
        r["doc_id"]
        for r in quota_per_group(d.repartition(7), "source", "doc_id", 5).collect()
    }
    assert q1 == q2  # same kept subset regardless of partitioning
    per = (
        quota_per_group(d, "source", "doc_id", 5)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    )
    assert all(r["n"] <= 5 for r in per)
