"""Correctness of the approximate LLM-pipeline operators against their
exact counterparts (the driver only rows-only-checks these; the real
guarantees are asserted here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import dedup, similarity
from bigdata_googleplaystore_spark.sources import load_table

from _markers import HEAVY


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


def test_simhash_planted_query_margin_and_pairs(spark, sf_dir):
    """The registered dedup_simhash query (round-6 planted exact-copy
    gate): re-prove the planting argument against the implementation,
    not just against the SQL that assumes it —

    1. output == exactly the 48 within-anchor pairs (16 anchors x
       C(3,2) copies) at Hamming 0;
    2. the margin the oracle relies on: every CROSS-anchor signature
       pair is far above the <=8 cutoff (anchors spaced doc_id % 7 = 0
       to dodge the testdata's adjacent planted near-dup clusters —
       measured margin 22/23/23 bits at sf0.001/0.01/0.1)."""
    from bigdata_googleplaystore_spark.catalog.registry import QUERIES

    out = QUERIES["dedup_simhash"].fn(spark, sf_dir).collect()
    anchors = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & ((F.col("doc_id") % 7) == 0))
        .orderBy("doc_id")
        .limit(16)
        .select("doc_id", "text")
    )
    expected = set()
    for r in anchors.select("doc_id").collect():
        ids = sorted(r["doc_id"] + 1_000_000 * c for c in range(3))
        expected |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    assert {(r["doc_a"], r["doc_b"]) for r in out} == expected
    assert all(r["hamming"] == 0 for r in out)
    sigs = [
        r["simhash"]
        for r in dedup.simhash64(anchors, "doc_id", "text", n=3).collect()
    ]
    mask = (1 << 64) - 1
    min_cross = min(
        bin((a ^ b) & mask).count("1")
        for i, a in enumerate(sigs)
        for b in sigs[i + 1:]
    )
    assert min_cross > 8, f"cross-anchor margin collapsed: {min_cross}"


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
    every non-null-content row (null-content rows are excluded — they are
    not duplicates of each other)."""
    d = load_table(spark, sf_dir, "documents")
    out = dedup.exact_dedup(d, ["lang", "source", "text"], "doc_id")
    eligible = d.filter(
        F.col("lang").isNotNull()
        & F.col("source").isNotNull()
        & F.col("text").isNotNull()
    ).count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == eligible
    assert out.select("keep_id").distinct().count() == out.count()


def test_exact_dedup_excludes_null_content(spark):
    """Two rows with null text must NOT be grouped as copies of each
    other (groupBy treats null==null; the operator filters them)."""
    d = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)], ["id", "text"]
    )
    out = dedup.exact_dedup(d, ["text"], "id").collect()
    assert len(out) == 1 and out[0]["n_copies"] == 2


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


@HEAVY
def test_embedding_ann_near_pairs_vs_exact(spark, sf_dir):
    """embedding_near_pairs_ann = LSH candidates + exact verify, so its
    output must be a subset of the exact all-pairs tier, and on planted
    self-copies (cos ~0.998, far above the 0.9 cut, with 8 tables of
    4-bit signatures -> miss rate < 0.2% per pair) recall must be ~1."""
    e = load_table(spark, sf_dir, "embeddings")
    to_double = F.transform("embedding", lambda x: x.cast("double"))
    perturbed = e.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i % 7 == 0, F.lit(0.02)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    corpus = e.select("vec_id", to_double.alias("embedding")).unionByName(perturbed)
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_pairs(
            corpus, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    ann = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_pairs_ann(
            corpus, "vec_id", "embedding",
            threshold=0.9, n_planes=4, dim=64, n_tables=8,
        ).collect()
    }
    assert ann <= exact, f"ANN false positives: {ann - exact}"
    assert len(exact) > 0, "planted copies should produce near-dup pairs"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.95, f"ANN near-pair recall too low: {recall:.2f}"


def test_hyperplane_signatures_deterministic(spark, sf_dir):
    """Vectorized signature path: same seed -> identical buckets across
    runs and partitionings (plane matrix is derived from the seed inside
    the UDF, so executors can't disagree)."""
    e = load_table(spark, sf_dir, "embeddings")
    s1 = {
        (r["vec_id"], r["bucket"])
        for r in similarity.hyperplane_signatures(e).collect()
    }
    s2 = {
        (r["vec_id"], r["bucket"])
        for r in similarity.hyperplane_signatures(e.repartition(7)).collect()
    }
    assert s1 == s2
    tables = similarity.hyperplane_signature_tables(e, n_tables=3)
    per_id = tables.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_id] == [3]


def test_jaccard_hot_shingle_cap(spark):
    """A stop-phrase shared by every doc must not quadratically blow up
    the inverted-index join: with max_shingle_df set, pairs related ONLY
    through the hot shingle disappear while true near-dups survive, and
    the capped output is a subset of the exact output."""
    phrase = "terms of service apply to this"
    docs = [(i, f"{phrase} unique{i} alpha{i} beta{i} gamma{i}") for i in range(40)]
    # planted near-dup pair: long shared tail, far above threshold
    tail = "the quick brown fox jumps over the lazy dog again and again"
    docs += [(100, tail), (101, tail + " extra")]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    exact = _pairs(dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3))
    capped = _pairs(
        dedup.jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.3, max_shingle_df=10
        )
    )
    assert capped <= exact
    assert (100, 101) in capped, "true near-dup lost to the DF cap"
    # the 40 stop-phrase docs share ~4 hot shingles (df=40 > cap) and
    # nothing else; with the cap they can't form pairs at all
    assert all(a >= 100 for a, _ in capped), f"hot-shingle-only pair kept: {capped}"


def test_weighted_resample_deterministic_and_unbiased(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.sampling import weighted_resample

    d = load_table(spark, sf_dir, "documents")
    w = F.lit(1.7)
    a = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in weighted_resample(d, w, "doc_id", salt="t").collect()
    )
    b = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in weighted_resample(d.repartition(11), w, "doc_id", salt="t").collect()
    )
    assert a == b  # partition-invariant sample
    n_in = d.count()
    n_out = len(a)
    assert 1.4 * n_in < n_out < 2.0 * n_in  # ~1.7x in expectation
    # every row keeps floor(w)=1 copy; copy_idx is 1..n_copies
    per_doc = {}
    for doc, idx in a:
        per_doc.setdefault(doc, []).append(idx)
    assert len(per_doc) == n_in
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_doc.values())


def test_image_ahash_known_pattern_and_determinism(spark):
    """Hand-computable aHash: an 8x8 gray image whose top half is 200 and
    bottom half is 10 has mean ~105, so the 64 bits are 32 ones then 32
    zeros -> signed value -(2**32). Equal payloads must hash equal; the
    inverted image must hash to the complement pattern."""
    from bigdata_googleplaystore_spark.operators import codecs, multimodal

    top = bytes([200] * 32 + [10] * 32)
    bot = bytes([10] * 32 + [200] * 32)
    rows = [
        (1, "image/png", codecs.encode_png_gray(top, 8)),
        (2, "image/png", codecs.encode_png_gray(top, 8)),
        (3, "image/png", codecs.encode_png_gray(bot, 8)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["ahash"] for r in multimodal.image_ahash(media).collect()}
    assert got[1] == got[2] == -(2**32)
    assert got[3] == 2**32 - 1  # complement pattern: low 32 bits set
    pairs = {
        (r["media_a"], r["media_b"])
        for r in multimodal.ahash_dup_pairs(media).collect()
    }
    assert pairs == {(1, 2)}


def test_image_ahash_planted_query_margin_and_pairs(spark, sf_dir):
    """The registered dedup_image_ahash query (planted exact-copy gate,
    mirror of dedup_simhash's): output == exactly the 48 within-anchor
    pairs, and the oracle's distinctness assumption holds with margin —
    measured min cross-anchor Hamming 12/14/12 bits at
    sf0.001/0.01/0.1, far from the 0 cutoff."""
    from bigdata_googleplaystore_spark.catalog.registry import QUERIES
    from bigdata_googleplaystore_spark.operators import multimodal

    out = QUERIES["dedup_image_ahash"].fn(spark, sf_dir).collect()
    anchors = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & ((F.col("doc_id") % 7) == 0))
        .orderBy("doc_id")
        .limit(16)
        .select("doc_id", "text")
    )
    expected = set()
    for r in anchors.select("doc_id").collect():
        ids = sorted(r["doc_id"] + 1_000_000 * c for c in range(3))
        expected |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}
    assert {(r["media_a"], r["media_b"]) for r in out} == expected
    assert all(r["hamming"] == 0 for r in out)
    media = multimodal.attach_media_payload(anchors, "text", "doc_id", kind="png")
    hashes = [r["ahash"] for r in multimodal.image_ahash(media).collect()]
    mask = (1 << 64) - 1
    min_cross = min(
        bin((a ^ b) & mask).count("1")
        for i, a in enumerate(hashes)
        for b in hashes[i + 1:]
    )
    assert min_cross > 0, "cross-anchor aHash collision: oracle assumption broken"


def test_ivf_stored_index_mismatch_rejected(spark, sf_dir):
    """r08 advice: an `assigned` carrying cids beyond the passed centroid
    count was trained against a DIFFERENT centroid set — ivf_topk must
    reject the pair instead of returning arbitrary neighbors, and must
    still reject `assigned` without any `centroids` at all."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cents16 = similarity.kmeans_centroids(e, k=16, iters=1)
    assigned16 = similarity.assign_to_centroids(e, cents16).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "cid"
    )
    q = e.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="different centroid sets"):
        similarity.ivf_topk(
            e, q, k=3, centroids=cents16[:8], assigned=assigned16
        )
    with pytest.raises(ValueError, match="both halves"):
        similarity.ivf_topk(e, q, k=3, assigned=assigned16)


def test_ivf_index_disk_roundtrip_full_probe_exact(spark, sf_dir, tmp_path):
    """write_ivf_index -> read_ivf_index round trip: the reloaded
    (centroids, assigned) pair at the full-probe endpoint must equal
    brute-force top-5 (nothing shared with training but bytes on disk),
    the reloaded centroids must equal the trained ones bit-for-bit, and
    a torn index (missing centroid id) must be rejected on read."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    idx = str(tmp_path / "ivf_idx")
    trained = similarity.write_ivf_index(e, idx, n_cells=8, iters=2)
    cents, assigned = similarity.read_ivf_index(spark, idx)
    assert cents == trained  # double fidelity through parquet
    q = e.filter(F.col("vec_id") < 5)
    exact = sorted(
        map(tuple, similarity.cosine_topk(e, q, k=5).collect())
    )
    got = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                e, q, k=5, n_probe=8, centroids=cents, assigned=assigned
            ).collect(),
        )
    )
    assert got == exact

    # torn index: drop centroid row 0 -> contiguity check fires
    # (materialize first — can't overwrite the path being read)
    torn = [
        (r["cid"], [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(idx + "/centroids").collect()
        if r["cid"] != 0
    ]
    spark.createDataFrame(
        torn, "cid INT, centroid ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(idx + "/centroids")
    with pytest.raises(ValueError, match="contiguous"):
        similarity.read_ivf_index(spark, idx)


def test_incremental_minhash_equals_full_recompute(spark, sf_dir, tmp_path):
    """minhash_lsh_pairs_incremental(base index, delta) must equal the
    FULL recompute over base ∪ delta restricted to pairs with a delta
    side — exactly (both hash families are deterministic), including
    the jaccard values. Also: no base-base pair may leak through (those
    were reported when base was indexed), and the disk round trip of
    the index must not change the result."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    idx = str(tmp_path / "lsh_idx")
    dedup.write_lsh_index(d, idx, "doc_id", "text", n=3)
    buckets, hashed = dedup.read_lsh_index(spark, idx)
    inc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs_incremental(
            buckets, hashed, delta, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            d.unionByName(delta), "doc_id", "text", n=3, threshold=0.5
        ).collect()
        if r["doc_a"] >= 1_000_000 or r["doc_b"] >= 1_000_000
    }
    assert inc == full
    assert len(inc) > 0  # non-vacuous: the planted copies pair at J=1
    assert all(a >= 1_000_000 or b >= 1_000_000 for a, b in inc)


@HEAVY
def test_incremental_minhash_partitioned_index_equals_flat(
    spark, sf_dir, tmp_path
):
    """The opt-in partitioned LSH store (write_lsh_index partitions=P):
    the doubly-pruned path (touched _pb bucket partitions + candidate
    _ph hashed partitions, both planned from explicit paths) must
    equal the flat path exactly — pruning only skips partitions that
    cannot hold a needed row."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    idx = str(tmp_path / "lsh_part")
    dedup.write_lsh_index(d, idx, "doc_id", "text", n=3, partitions=64)
    meta = dedup.read_lsh_index_meta(spark, idx)
    assert meta == {"partitions": 64, "n": 3, "num_hashes": 64, "bands": 16}
    buckets, hashed = dedup.read_lsh_index(spark, idx)
    assert "_pb" not in buckets.columns and "_ph" not in hashed.columns
    flat = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs_incremental(
            buckets, hashed, delta, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    pruned = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs_incremental_indexed(
            spark, idx, delta, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert pruned == flat and len(pruned) > 0
    # append lifecycle: delta folds into the partitioned store; the
    # NEXT increment's pruned pairs against base+delta match the full
    # recompute restricted to delta2-touching pairs
    dedup.append_lsh_index(spark, idx, delta, "doc_id", "text")
    delta2 = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    inc2 = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs_incremental_indexed(
            spark, idx, delta2, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full2 = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            d.unionByName(delta).unionByName(delta2),
            "doc_id", "text", n=3, threshold=0.5,
        ).collect()
        if r["doc_a"] >= 2_000_000 or r["doc_b"] >= 2_000_000
    }
    assert inc2 == full2 and len(inc2) > 0


def test_append_ivf_assignments_equals_full_build(spark, sf_dir, tmp_path):
    """Grown index == index built on the whole corpus at once: the
    frozen-quantizer append must produce the same assignment rows a
    from-scratch assignment over base+delta would (same centroids)."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import similarity
    from bigdata_googleplaystore_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    base = e.filter(F.col("vec_id") % 3 != 0)
    delta = e.filter(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "ivf")
    cents = similarity.write_ivf_index(
        base, idx, "vec_id", "embedding", n_cells=8, iters=2
    )
    n = similarity.append_ivf_assignments(spark, idx, delta, "vec_id", "embedding")
    assert n == delta.count()
    _, assigned = similarity.read_ivf_index(spark, idx)
    want = similarity.assign_to_centroids(e, cents, "vec_id", "embedding")
    got_map = {r["cand_id"]: r["cid"] for r in assigned.collect()}
    want_map = {r["vec_id"]: r["cid"] for r in want.collect()}
    assert got_map == want_map


@HEAVY
def test_metaless_index_requires_explicit_params(spark, sf_dir, tmp_path):
    """Legacy meta-less index layouts (r10 ADVICE): the indexed
    incremental entry points must not silently shingle/hash the delta
    with defaults that may differ from the base's build — no meta +
    no explicit params raises; explicit params reproduce the flat
    path; params conflicting with an existing meta raise."""
    import pytest

    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    # legacy Jaccard layout: postings only, built with NON-default n=4
    jac = str(tmp_path / "jac_legacy")
    dedup.build_jaccard_index(d, "doc_id", "text", n=4).write.parquet(
        jac + "/postings"
    )
    with pytest.raises(ValueError, match="no meta"):
        dedup.jaccard_pairs_incremental_indexed(
            spark, jac, delta, "doc_id", "text", threshold=0.5
        )
    got = sorted(
        map(
            tuple,
            dedup.jaccard_pairs_incremental_indexed(
                spark, jac, delta, "doc_id", "text", threshold=0.5, n=4
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            dedup.jaccard_pairs_incremental(
                dedup.read_jaccard_index(spark, jac),
                delta, "doc_id", "text", 4, 0.5,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    # legacy LSH layout: buckets/hashed only, non-default band shape
    lsh = str(tmp_path / "lsh_legacy")
    b, h = dedup.build_lsh_index(d, "doc_id", "text", 3, 32, 8)
    b.write.parquet(lsh + "/buckets")
    h.write.parquet(lsh + "/hashed")
    with pytest.raises(ValueError, match="no meta"):
        dedup.minhash_lsh_pairs_incremental_indexed(
            spark, lsh, delta, "doc_id", "text", threshold=0.5
        )
    got_l = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_incremental_indexed(
                spark, lsh, delta, "doc_id", "text",
                threshold=0.5, n=3, num_hashes=32, bands=8,
            ).collect(),
        )
    )
    want_l = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_incremental(
                *dedup.read_lsh_index(spark, lsh),
                delta, "doc_id", "text",
                n=3, num_hashes=32, bands=8, threshold=0.5,
            ).collect(),
        )
    )
    assert got_l == want_l and len(got_l) > 0
    # explicit params that CONTRADICT an existing meta are a caller bug
    jac2 = str(tmp_path / "jac_meta")
    dedup.write_jaccard_index(d, jac2, "doc_id", "text", n=3, buckets=8)
    with pytest.raises(ValueError, match="conflict"):
        dedup.jaccard_pairs_incremental_indexed(
            spark, jac2, delta, "doc_id", "text", threshold=0.5, n=4
        )
    lsh2 = str(tmp_path / "lsh_meta")
    dedup.write_lsh_index(d, lsh2, "doc_id", "text", n=3, partitions=16)
    with pytest.raises(ValueError, match="conflict"):
        dedup.minhash_lsh_pairs_incremental_indexed(
            spark, lsh2, delta, "doc_id", "text", threshold=0.5, bands=8
        )


def test_incremental_jaccard_equals_full_recompute(spark, sf_dir, tmp_path):
    """Incremental pairs == one-shot jaccard_pairs over base+delta,
    restricted to delta-touching pairs — exact equality, no
    approximation argument needed."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    idx = str(tmp_path / "jac")
    dedup.write_jaccard_index(d, idx, "doc_id", "text", n=3)
    postings = dedup.read_jaccard_index(spark, idx)
    inc = dedup.jaccard_pairs_incremental(
        postings, delta, "doc_id", "text", n=3, threshold=0.5
    )
    full = dedup.jaccard_pairs(
        d.unionByName(delta), "doc_id", "text", n=3, threshold=0.5
    ).filter((F.col("doc_a") >= 500000) | (F.col("doc_b") >= 500000))
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(got) > 0
    # the bucket-PRUNED path over the same store is identical: pruning
    # only drops buckets no delta shingle hashes into
    pruned = dedup.jaccard_pairs_incremental_indexed(
        spark, idx, delta, "doc_id", "text", threshold=0.5
    )
    assert sorted(map(tuple, pruned.collect())) == want


@HEAVY
def test_incremental_jaccard_capped_and_appended(spark, sf_dir, tmp_path):
    """The corpus-global hot-shingle cap on the incremental path: df is
    recounted over stored base + delta (exact — each bucket holds its
    shingles' complete posting lists), so capped incremental == capped
    one-shot restricted to delta-touching pairs. Then the append
    lifecycle: folding delta1 into the store makes the NEXT increment
    see base+delta1 without a rewrite."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant a boilerplate phrase in EVERY doc so a hot shingle exists
    d = d.withColumn(
        "text", F.concat(F.lit("terms of service apply here . "), F.col("text"))
    )
    delta = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    idx = str(tmp_path / "jac")
    b = dedup.write_jaccard_index(d, idx, "doc_id", "text", n=3, buckets=8)
    assert b == 8
    cap = 50
    inc = dedup.jaccard_pairs_incremental_indexed(
        spark, idx, delta, "doc_id", "text", threshold=0.3, max_shingle_df=cap
    )
    full = dedup.jaccard_pairs(
        d.unionByName(delta), "doc_id", "text", n=3, threshold=0.3,
        max_shingle_df=cap,
    ).filter((F.col("doc_a") >= 500000) | (F.col("doc_b") >= 500000))
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(got) > 0
    # append lifecycle: delta1 folds into the store O(|delta1|); the
    # second increment's pairs against base+delta1 match full recompute
    dedup.append_jaccard_index(spark, idx, delta, "doc_id", "text")
    delta2 = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    inc2 = dedup.jaccard_pairs_incremental_indexed(
        spark, idx, delta2, "doc_id", "text", threshold=0.5
    )
    full2 = dedup.jaccard_pairs(
        d.unionByName(delta).unionByName(delta2),
        "doc_id", "text", n=3, threshold=0.5,
    ).filter((F.col("doc_a") >= 900000) | (F.col("doc_b") >= 900000))
    assert sorted(map(tuple, inc2.collect())) == sorted(
        map(tuple, full2.collect())
    )


def test_incremental_cc_equals_full_recompute(spark):
    """Fold random new edges into stored labels; must equal CC over the
    union graph — including transitive merges THROUGH a new node and
    untouched components staying untouched."""
    from bigdata_googleplaystore_spark.operators import dedup

    base_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)], "doc_a long, doc_b long"
    )
    base_labels = dedup.connected_components(base_pairs)
    # new node 100 bridges components {1,2,3} and {10,11}; 40-41 is a
    # brand-new pair; {20,21} and {30,31} untouched
    new_pairs = spark.createDataFrame(
        [(3, 100), (100, 10), (40, 41)], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components_incremental(
            base_labels, new_pairs
        ).collect()
    }
    full = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            base_pairs.unionByName(new_pairs)
        ).collect()
    }
    assert got == full
    assert got[100] == 1 and got[10] == 1  # transitive merge through 100
    assert got[20] == 20 and got[30] == 30  # untouched components
    assert got[41] == 40  # brand-new component


def test_ingest_unless_duplicate_lifecycle(spark, sf_dir, tmp_path):
    """Dedup-gated ingestion across TWO increments: batch-1 survivors
    fold into the index and the committed table, so batch 2's copies of
    batch-1 SURVIVORS are rejected against the grown index — and the
    table's snapshot only ever advances by the survivor sets."""
    from bigdata_googleplaystore_spark.streaming import manifest

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.filter(F.col("text").isNotNull())
    base = d.filter(F.col("doc_id") % 4 == 0)
    idx = str(tmp_path / "idx")
    table = str(tmp_path / "tbl")
    dedup.write_jaccard_index(base, idx, "doc_id", "text", n=3, buckets=8)
    manifest.write_and_commit_batch(spark, base, table, 0)
    # batch 1: fresh docs + exact copies of base docs (rejected)
    fresh1 = d.filter(F.col("doc_id") % 4 == 1)
    copies1 = base.filter(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    s1 = dedup.ingest_unless_duplicate(
        spark, idx, table, fresh1.unionByName(copies1), "doc_id", "text", 1
    )
    s1_ids = {r["doc_id"] for r in s1.select("doc_id").collect()}
    assert not {r["doc_id"] for r in copies1.collect()} & s1_ids
    # every planted copy rejected; fresh docs survive unless they
    # near-dup base/each other under the SAME rule a full-recompute
    # pair set implies (spot: at least the majority of fresh survive)
    n_fresh = fresh1.count()
    assert len(s1_ids) > n_fresh * 0.5
    # batch 2: copies of batch-1 SURVIVORS — only rejectable if the
    # index actually grew by s1
    copies2 = s1.limit(20).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    fresh2 = d.filter(F.col("doc_id") % 4 == 2)
    s2 = dedup.ingest_unless_duplicate(
        spark, idx, table, fresh2.unionByName(copies2), "doc_id", "text", 2
    )
    s2_ids = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert not {r["doc_id"] for r in copies2.collect()} & s2_ids
    # the table's snapshot is exactly base + s1 + s2 (atomic commits)
    snap_ids = {
        r["doc_id"]
        for r in manifest.read_snapshot_rows(spark, table)
        .select("doc_id")
        .collect()
    }
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    assert snap_ids == base_ids | s1_ids | s2_ids


def test_jaccard_fused_sql_equals_staged_columns(spark, sf_dir):
    """jaccard_pairs' fused single-statement SQL form (r13 construction
    optimization) must produce exactly the staged Column derivation's
    rows — uncapped and capped, including the persisted-input fallback
    (parameterized spark.sql UNPERSISTS a bound cached frame, so cached
    inputs must take the staged path)."""
    d = load_table(spark, sf_dir, "documents")
    expected_default = None
    for cap in (None, 30):
        fused = sorted(
            map(
                tuple,
                dedup.jaccard_pairs(
                    d, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=cap
                ).collect(),
            )
        )
        staged = sorted(
            map(
                tuple,
                dedup._jaccard_pairs_staged(
                    d, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=cap
                ).collect(),
            )
        )
        assert fused == staged and len(fused) > 0
    # Capture the UNCACHED expected rows BEFORE persisting: persist()
    # returns self and load_table memoizes, so after d.persist() every
    # jaccard_pairs(d, ...) call sees a cached input and takes the staged
    # path — comparing two post-persist calls would never exercise the
    # cached-vs-uncached equality (r13 advice: the old assert was vacuous).
    expected_default = sorted(
        map(tuple, dedup.jaccard_pairs(d, "doc_id", "text").collect())
    )
    cached = d.persist()
    try:
        via_fallback = sorted(
            map(tuple, dedup.jaccard_pairs(cached, "doc_id", "text").collect())
        )
        assert via_fallback == expected_default
        # the fallback must not have unpersisted the caller's frame
        assert cached.is_cached
    finally:
        cached.unpersist()


def test_cosine_topk_fused_sql_equals_columns(spark, sf_dir):
    """cosine_topk's fused SQL form must rank exactly like the Column
    derivation (same left-to-right double accumulation under round(,4)),
    and a persisted input must take the Column path un-unpersisted."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 10)
    queries = e.filter(F.col("vec_id") < 10)
    fused = sorted(map(tuple, similarity.cosine_topk(corpus, queries, k=5).collect()))
    cols = sorted(
        map(tuple, similarity._cosine_topk_columns(corpus, queries, k=5).collect())
    )
    assert fused == cols and len(fused) > 0
    cached = corpus.persist()
    try:
        assert sorted(
            map(tuple, similarity.cosine_topk(cached, queries, k=5).collect())
        ) == fused
        assert cached.is_cached
    finally:
        cached.unpersist()


def test_minhash_fused_sql_equals_staged_columns(spark, sf_dir):
    """minhash_lsh_pairs' fused SQL form (persisted shingle frame
    referenced by temp view — NOT a spark.sql parameter, which would
    unpersist it) must produce exactly the staged Column derivation's
    pairs, and its plan must still consume the cached shingle frame."""
    import io
    import re
    from contextlib import redirect_stdout

    d = load_table(spark, sf_dir, "documents")
    fused_df = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        fused_df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("InMemoryTableScan") > 0, "shingle cache lost"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    fused = sorted(map(tuple, fused_df.collect()))
    spark.catalog.clearCache()
    staged = sorted(
        map(
            tuple,
            dedup._minhash_lsh_pairs_staged(
                d, "doc_id", "text", n=3, threshold=0.5
            ).collect(),
        )
    )
    spark.catalog.clearCache()
    assert fused == staged and len(fused) > 0


def test_minhash_interleaved_invocations_both_correct(spark, sf_dir):
    """Two minhash_lsh_pairs invocations built BEFORE either executes
    (r14, verdict item 6): per-invocation unique temp-view names mean the
    second invocation's registration can no longer rebind the first's
    view, so both lazy results must return the correct pairs — the first
    merely recomputes its shingle frame from lineage (its cache is
    released when the second invocation finishes analysis)."""
    d = load_table(spark, sf_dir, "documents")
    expected = sorted(
        map(tuple, dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3).collect())
    )
    spark.catalog.clearCache()
    first = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3)
    second = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3)
    got_second = sorted(map(tuple, second.collect()))
    got_first = sorted(map(tuple, first.collect()))
    spark.catalog.clearCache()
    assert got_first == expected and got_second == expected and len(expected) > 0
