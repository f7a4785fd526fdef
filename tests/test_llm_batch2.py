"""Invariant tests for the batch-2 training-pipeline operators — the
guarantees the DuckDB oracle can't express (it checks value equality, not
the mathematical contract)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.catalog import QUERIES
from bigdata_googleplaystore_spark.sources import load_table

from _markers import HEAVY


def test_quantize_error_bound(spark, sf_dir):
    """Symmetric int8 quantization guarantees |x - q*scale| <= scale/2
    for every in-range component (round-to-nearest), and the max element
    hits q = ±127 exactly (that's what defines the scale)."""
    out = QUERIES["embedding_quantize_int8"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        if r["scale"] == 0:
            assert r["max_abs_err"] == 0
            continue
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9, r
        assert r["n_sat"] >= 1, "max-|x| dim must saturate at ±127"
        assert abs(r["sum_q"]) <= 127 * r["n_dims"]


def test_quantize_matches_numpy(spark, sf_dir):
    """Spot-check the whole pipeline against a NumPy reimplementation."""
    e = load_table(spark, sf_dir, "embeddings").limit(20).collect()
    got = {
        r["vec_id"]: r
        for r in QUERIES["embedding_quantize_int8"].fn(spark, sf_dir).collect()
    }
    for row in e:
        if row["embedding"] is None:
            continue
        v = np.array(row["embedding"], dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        q = (
            np.zeros_like(v, dtype=np.int64)
            if scale == 0
            else np.clip(np.floor(np.abs(v / scale) + 0.5) * np.sign(v / scale), -127, 127)
        )
        r = got[row["vec_id"]]
        assert r["sum_q"] == int(q.sum()), row["vec_id"]
        if scale > 0:
            assert math.isclose(
                r["max_abs_err"], np.abs(v - q * scale).max(), abs_tol=2e-9
            )


def test_label_centroids_match_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in e:
        if r["embedding"] is not None and r["label"] is not None:
            by_label.setdefault(r["label"], []).append(r["embedding"])
    got = QUERIES["embedding_label_centroids"].fn(spark, sf_dir).collect()
    cent = {(r["label"], r["pos"]): r for r in got}
    for label, vecs in by_label.items():
        m = np.array(vecs, dtype=np.float64).mean(axis=0)
        for pos, want in enumerate(m):
            r = cent[(label, pos)]
            assert r["n"] == len(vecs)
            assert math.isclose(r["centroid"], want, abs_tol=1e-6), (label, pos)


def test_tfidf_scores_and_coverage(spark, sf_dir):
    """Every source gets exactly min(5, |vocab|) ranked terms; scores are
    non-negative and non-increasing in rank; a term present in every
    source scores exactly 0."""
    out = QUERIES["tfidf_top_terms"].fn(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    n_sources = len({r["source"] for r in out})
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["tfidf"] for r in rows]
        assert all(s >= 0 for s in scores), source
        assert scores == sorted(scores, reverse=True), source
        for r in rows:
            if r["df"] == n_sources:
                assert r["tfidf"] == 0.0


def test_top_ngram_fraction_bounds(spark, sf_dir):
    """top_count*2 tokens can't exceed... the fraction is in (0, 1+1/n]:
    a doc of one repeated bigram ('a a a') has n-1 bigrams covering all
    n tokens, fraction 2(n-1)/n < 2; templated spam sits near 1."""
    out = QUERIES["text_top_ngram_fraction"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["top_count"] >= 1
        assert 0 < r["top_bigram_token_fraction"] <= 2.0
        assert " " in r["top_bigram"]


def test_curriculum_buckets_partition_the_corpus(spark, sf_dir):
    """Buckets tile each language: counts sum to the language's doc count,
    bucket boundaries are non-overlapping and ordered (max of bucket k <=
    min of bucket k+1 can overlap only on equal n_chars ties — assert the
    weaker ordered-medians invariant ntile guarantees)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    lang_counts = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = QUERIES["curriculum_length_buckets"].fn(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["bucket"])
        assert sum(r["n_docs"] for r in rows) == lang_counts[lang]
        assert [r["bucket"] for r in rows] == list(range(1, len(rows) + 1))
        # ntile balance: sizes differ by at most 1
        sizes = [r["n_docs"] for r in rows]
        assert max(sizes) - min(sizes) <= 1
        # ordered length ranges (ties may touch, never invert)
        for a, b in zip(rows, rows[1:]):
            assert a["max_chars"] <= b["min_chars"] or a["max_chars"] == b["min_chars"]


def test_decontamination_flags_planted_overlap(spark, sf_dir):
    """Docs sharing a 3-gram with the benchmark sources are flagged; the
    flag is exactly n_overlap > 0 and never set for zero overlap."""
    out = QUERIES["decontaminate_ngram_overlap"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    assert any(r["contaminated"] for r in out), "word-soup corpus must overlap"
    for r in out:
        assert r["contaminated"] == (r["n_overlap"] > 0)


def test_dup_ngram_fraction_invariants(spark, sf_dir):
    """dup_frac is a valid fraction; any doc with an exact text duplicate
    elsewhere in the corpus must have every shingle duplicated
    (dup_frac == 1.0) — a cross-operator invariant vs dedup_exact_docs."""
    out = {r["doc_id"]: r for r in QUERIES["text_dup_ngram_fraction"].fn(spark, sf_dir).collect()}
    assert len(out) > 0
    for r in out.values():
        assert 0 <= r["n_dup"] <= r["n_shingles"]
        assert abs(r["dup_frac"] - round(r["n_dup"] / r["n_shingles"], 6)) < 1e-12
    pairs = QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    assert pairs, "testdata plants near-duplicates"
    for p in pairs:
        # jaccard > 0 means the docs share >= 1 shingle, so both ends must
        # report at least one corpus-duplicated shingle
        for doc_id in (p["doc_a"], p["doc_b"]):
            assert out[doc_id]["dup_frac"] > 0.0


def test_bipartite_projection_invariants(spark, sf_dir):
    """Pair weights are bounded by the smaller endpoint degree; jaccard
    matches n_common/(na+nb-n_common); pairs are canonical (a < b)."""
    ue = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "event_type")
        .distinct()
    )
    deg = {
        r["event_type"]: r["n"]
        for r in ue.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    out = QUERIES["graph_bipartite_projection"].fn(spark, sf_dir).collect()
    assert out
    seen = set()
    for r in out:
        assert r["type_a"] < r["type_b"]
        assert (r["type_a"], r["type_b"]) not in seen
        seen.add((r["type_a"], r["type_b"]))
        na, nb = deg[r["type_a"]], deg[r["type_b"]]
        assert 1 <= r["n_common"] <= min(na, nb)
        assert abs(r["jaccard"] - round(r["n_common"] / (na + nb - r["n_common"]), 6)) < 1e-12


def test_char_lm_score_invariants(spark, sf_dir):
    """n_bigrams is exactly len(text)-1 (every adjacent char pair counted
    with multiplicity); the mean-probability score is a valid probability
    and word-soup docs (drawn from a shared vocab) score far above zero."""
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    out = QUERIES["text_char_lm_score"].fn(spark, sf_dir).collect()
    assert len(out) == sum(1 for t in texts.values() if len(t) >= 2)
    for r in out:
        assert r["n_bigrams"] == len(texts[r["doc_id"]].lower()) - 1
        assert 0.0 < r["lm_score"] <= 1.0


def test_regression_matches_numpy(spark, sf_dir):
    """Per-source OLS from exact integer moments must match numpy's
    least-squares fit; tokens grow with chars (positive slope, high R²)."""
    pts = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull() & F.col("n_chars").isNotNull())
        .select("source", "n_chars", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("y"))
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in pts:
        by_source.setdefault(r["source"], []).append((r["n_chars"], r["y"]))
    out = {r["source"]: r for r in QUERIES["regression_per_source"].fn(spark, sf_dir).collect()}
    assert set(out) == set(by_source)
    for source, xy in by_source.items():
        x = np.array([p[0] for p in xy], dtype=np.float64)
        y = np.array([p[1] for p in xy], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        r = out[source]
        assert r["n"] == len(xy)
        assert math.isclose(r["slope"], slope, rel_tol=1e-6), source
        assert math.isclose(r["intercept"], intercept, rel_tol=1e-4, abs_tol=1e-4), source
        assert 0.0 <= r["r2"] <= 1.0
        assert r["slope"] > 0, "token count grows with char count"


def test_covariance_moments_matches_numpy_and_partitioning(spark, sf_dir):
    """The moment-matrix covariance equals numpy's population covariance
    of the fixed-point-truncated vectors, and is bit-identical under a
    different partition count (exact integer merge => order-independent)."""
    from bigdata_googleplaystore_spark.operators.similarity import covariance_moments

    e = load_table(spark, sf_dir, "embeddings")
    vecs = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in e.collect()]
    )
    q = np.trunc(vecs * 1e6)
    want = np.cov(q, rowvar=False, bias=True) * 1e-12  # population covariance
    got = {(r["i"], r["j"]): r for r in covariance_moments(e, "embedding").collect()}
    d = vecs.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            r = got[(i, j)]
            assert r["n"] == len(vecs)
            assert math.isclose(r["cov"], want[i, j], rel_tol=1e-9, abs_tol=1e-15), (i, j)

    again = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_moments(e.repartition(7), "embedding").collect()
    }
    assert all(again[k] == got[k]["cov"] for k in got)


def test_pca_pipeline_matches_numpy(spark, sf_dir):
    """Distributed PCA (moments -> driver eigensolve -> broadcast
    projection -> fixed-point label means) must agree with plain numpy
    PCA on the collected vectors, including the sign convention."""
    from bigdata_googleplaystore_spark.operators.similarity import (
        top_principal_component,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    rows = e.collect()
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    labels = np.array([r["label"] for r in rows])

    q = np.trunc(vecs * 1e6) * 1e-6  # the operator's fixed-point grid
    c = np.cov(q, rowvar=False, bias=True)
    w, vv = np.linalg.eigh(c)
    want_v = vv[:, -1]
    if want_v[int(np.argmax(np.abs(want_v)))] < 0:
        want_v = -want_v

    v, explained = top_principal_component(e, "embedding")
    assert np.allclose(v, want_v, atol=1e-9)
    assert math.isclose(explained, w[-1] / w.sum(), rel_tol=1e-9)
    assert 0.0 < explained <= 1.0

    # the oracle-bindable power-iteration variant must converge to the
    # same PC1 (and Rayleigh explained ratio) as the eigensolve
    from bigdata_googleplaystore_spark.operators.similarity import (
        top_pc_power_iteration,
    )

    v_pi, explained_pi = top_pc_power_iteration(e, "embedding")
    assert np.allclose(v_pi, want_v, atol=1e-9)
    assert math.isclose(explained_pi, explained, rel_tol=1e-9)

    out = {r["label"]: r for r in QUERIES["embedding_pca_label_means"].fn(spark, sf_dir).collect()}
    assert set(out) == set(np.unique(labels).tolist())
    for label in out:
        want_mean = np.trunc((vecs[labels == label] @ np.asarray(v_pi)) * 1e6).sum() / (
            (labels == label).sum() * 1e6
        )
        assert math.isclose(out[label]["mean_proj"], round(want_mean, 6), abs_tol=2e-6)
        assert out[label]["n"] == int((labels == label).sum())


def test_heavy_hitters_exact_under_partitioning(spark, sf_dir):
    """Two-phase heavy hitters must equal the brute-force group-by for
    every partitioning (candidate union is a superset by pigeonhole; the
    recount makes counts exact), including on a long-tail corpus where
    the vocabulary is much larger than k."""
    from bigdata_googleplaystore_spark.operators.frequency import heavy_hitters

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"))
    brute = {
        r["term"]: r["n"]
        for r in toks.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(brute.values())
    want = {t: c for t, c in brute.items() if c * 30 >= n_total}
    for parts in (1, 7):
        got = {
            r["item"]: r
            for r in heavy_hitters(toks.repartition(parts), "term", 30).collect()
        }
        assert {t: r["n"] for t, r in got.items()} == want
        assert all(r["n_total"] == n_total for r in got.values())

    # adversarial long tail: 3 heavy ids + 10k singletons, k=100
    rows = [(f"hot{i % 3}",) for i in range(3000)] + [(f"tail{i}",) for i in range(10000)]
    df = spark.createDataFrame(rows, "term string").repartition(13)
    got = {r["item"]: r["n"] for r in heavy_hitters(df, "term", 100).collect()}
    assert got == {"hot0": 1000, "hot1": 1000, "hot2": 1000}


def test_operator_persists_bounded_in_long_session(spark, sf_dir):
    """Operators that persist a shared intermediate must not accumulate
    dead cache entries across invocations in one long-lived session
    (r14, verdict item 7): after N sequential invocations+actions, at
    most ONE cached relation per operator survives (keep_latest releases
    the previous invocation's frame), and results stay correct."""
    from bigdata_googleplaystore_spark.operators import dedup
    from bigdata_googleplaystore_spark.operators.frequency import heavy_hitters

    def n_cached():
        return spark._jsparkSession.sharedState().cacheManager().cachedData().size()

    spark.catalog.clearCache()
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"))
    # Same input twice: CacheManager dedups by plan equality, so both
    # invocations SHARE one entry — the release must not touch it
    # (unpersisting the "previous" frame would kill the new cache too).
    first = sorted(map(tuple, heavy_hitters(toks, "term", 30).collect()))
    assert n_cached() >= 1
    second = sorted(map(tuple, heavy_hitters(toks, "term", 30).collect()))
    assert second == first and n_cached() == 1
    # Different input: the previous invocation's entry must be RELEASED
    # (this is the long-session accumulation the bookkeeping bounds).
    half = toks.limit(500)
    sorted(map(tuple, heavy_hitters(half, "term", 30).collect()))
    assert n_cached() == 1

    spark.catalog.clearCache()
    first = sorted(map(tuple, dedup.minhash_lsh_pairs(d, "doc_id", "text").collect()))
    second = sorted(map(tuple, dedup.minhash_lsh_pairs(d, "doc_id", "text").collect()))
    assert second == first and n_cached() == 1
    d2 = d.filter(F.col("doc_id") % 2 == 0)
    assert len(dedup.minhash_lsh_pairs(d2, "doc_id", "text").collect()) >= 0
    assert n_cached() == 1
    spark.catalog.clearCache()


@HEAVY
def test_semantic_dedup_precision_and_determinism(spark, sf_dir):
    """SemDeDup drops are exactly the brute-force near-dup pairs whose
    endpoints co-cluster (precision 1.0 by exact verification; recall
    bounded by the clustering — both directions asserted), and the result
    is identical under repartitioning (deterministic seeding)."""
    from bigdata_googleplaystore_spark.operators import similarity

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    brute_sim = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.cosine_near_pairs(e, threshold=0.45).collect()
    }
    brute = set(brute_sim)
    cents = similarity.kmeans_centroids(e, k=16, iters=2)
    cid = {
        r["vec_id"]: r["cid"]
        for r in similarity.assign_to_centroids(e, cents).select("vec_id", "cid").collect()
    }
    want_dropped = {b for a, b in brute if cid[a] == cid[b]}

    got = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(e, threshold=0.45).collect()
    }
    assert set(got) == want_dropped
    assert len(got) > 0, "corpus plants co-clustered near-dups"
    for r in got.values():
        assert r["dup_of"] < r["vec_id"]
        assert cid[r["dup_of"]] == cid[r["vec_id"]]
        # sim and dup_of describe the SAME pair: sim is the exact cosine
        # to dup_of, and dup_of is the (sim desc, id asc) argmax among
        # this row's co-clustered duplicates.
        assert r["sim"] == brute_sim[(r["dup_of"], r["vec_id"])]
        cands = [
            (brute_sim[(a, b)], -a)
            for (a, b) in brute
            if b == r["vec_id"] and cid[a] == cid[b]
        ]
        assert (r["sim"], -r["dup_of"]) == max(cands)

    again = {
        r["vec_id"]: (r["dup_of"], r["sim"])
        for r in similarity.semantic_dedup(e.repartition(9), threshold=0.45).collect()
    }
    assert again == {k: (r["dup_of"], r["sim"]) for k, r in got.items()}

    # the registered query runs the planted-exact-dup gate: every copy
    # (id+1e6) dropped against its original at rounded cosine 1.0
    planted = {
        r["vec_id"]: r for r in QUERIES["dedup_semantic"].fn(spark, sf_dir).collect()
    }
    originals = {r["vec_id"] for r in e.select("vec_id").collect()}
    assert set(planted) == {i + 1_000_000 for i in originals}
    assert all(
        r["dup_of"] == k - 1_000_000 and r["sim"] == 1.0 for k, r in planted.items()
    )


def test_gini_matches_numpy(spark, sf_dir):
    """The Lorenz-formula Gini must equal a direct numpy computation on
    the per-source token totals and sit in [0, 1)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+"))).alias("t"))
        .collect()
    )
    x = np.sort(np.array([r["t"] for r in toks], dtype=np.float64))
    n = len(x)
    want = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    r = QUERIES["source_share_gini"].fn(spark, sf_dir).collect()[0]
    assert r["n_sources"] == n
    assert r["total_tokens"] == int(x.sum())
    assert math.isclose(r["gini"], want, abs_tol=1e-9)
    assert 0.0 <= r["gini"] < 1.0


@HEAVY
def test_knn_accuracy_matches_numpy(spark, sf_dir):
    """The distributed leave-one-out 5-NN vote must agree with a numpy
    reimplementation (identical rounding and tiebreaks)."""
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), 4)

    correct: dict[int, list] = {}
    for i in range(len(rows)):
        order = sorted(
            (j for j in range(len(rows)) if ids[j] != ids[i]),
            key=lambda j: (-sims[i, j], ids[j]),
        )[:5]
        vote_counts: dict[int, int] = {}
        for j in order:
            vote_counts[labels[j]] = vote_counts.get(labels[j], 0) + 1
        pred = sorted(vote_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        correct.setdefault(labels[i], []).append(pred == labels[i])

    got = {r["label"]: r for r in QUERIES["knn_label_accuracy"].fn(spark, sf_dir).collect()}
    assert set(got) == set(correct)
    for label, hits in correct.items():
        assert got[label]["n"] == len(hits)
        assert got[label]["n_correct"] == sum(hits)
        assert got[label]["accuracy"] == round(sum(hits) / len(hits), 6)


def test_kfold_is_balanced_and_stable(spark, sf_dir):
    """Hash-based folds are roughly balanced (within 25% of ideal at
    n=500) and assignment is a pure function: re-running returns the
    identical fold table."""
    out1 = sorted(
        (r["fold"], r["n_docs"], r["sum_tokens"])
        for r in QUERIES["kfold_assignment"].fn(spark, sf_dir).collect()
    )
    n_total = sum(n for _, n, _ in out1)
    assert [f for f, _, _ in out1] == [0, 1, 2, 3, 4]
    for _, n, _ in out1:
        assert abs(n - n_total / 5) < 0.25 * n_total / 5
    out2 = sorted(
        (r["fold"], r["n_docs"], r["sum_tokens"])
        for r in QUERIES["kfold_assignment"].fn(spark, sf_dir).collect()
    )
    assert out1 == out2


def test_classifier_scores_match_python(spark, sf_dir):
    """SCALAR_ITER scoring must equal a plain-python reimplementation of
    the stub linear model."""
    import re

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in QUERIES["text_linear_classifier_scores"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        toks = len(re.split(r"\s+", text.strip().lower()))
        digits = len(re.findall(r"[0-9]", text))
        want = 3 * toks - 2 * digits + len(text)
        assert got[doc_id] == want, doc_id


def test_bm25_ranking_properties(spark, sf_dir_mid):
    """BM25 invariants on the top-20: scores are non-increasing, every
    scored doc contains at least one query term, and a hand-computed
    BM25 from the frame's own integer inputs reproduces the score."""
    import math

    rows = QUERIES["bm25_topk_docs"].fn(spark, sf_dir_mid).collect()
    assert len(rows) == 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # recompute from the emitted integer inputs (same stats the query
    # derived; N/sum_dl/df re-derived independently below)
    d = load_table(spark, sf_dir_mid, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stats = d.select(
        F.size(toks).cast("long").alias("dl"),
        *[
            F.array_contains(toks, t).cast("long").alias(f"has_{t}")
            for t in ("vector", "spark", "customer")
        ],
    ).agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum(f"has_{t}").alias(f"df_{t}") for t in ("vector", "spark", "customer")],
    ).collect()[0]
    k1, b = 1.2, 0.75
    for r in rows:
        want = 0.0
        for t in ("vector", "spark", "customer"):
            tf, df = r[f"tf_{t}"], stats[f"df_{t}"]
            idf = math.log(1 + (stats["n"] - df + 0.5) / (df + 0.5))
            norm = k1 * (1 - b + b * r["dl"] * stats["n"] / stats["sum_dl"])
            want += idf * (tf * (k1 + 1)) / (tf + norm)
        assert abs(r["bm25"] - round(want, 6)) < 1e-9, (r["doc_id"], want)
        assert r["tf_vector"] + r["tf_spark"] + r["tf_customer"] > 0


def test_contrastive_hard_negatives_vs_brute_force(spark, sf_dir_mid):
    """Each anchor's mined negatives are exactly the 3 most-similar
    different-label vectors by the brute-force rounded cosine, in
    (sim desc, cand_id asc) order, and never share the anchor's label."""
    import numpy as np

    rows = QUERIES["contrastive_hard_negatives"].fn(spark, sf_dir_mid).collect()
    assert rows
    e = {
        r["vec_id"]: (np.asarray(r["embedding"], dtype=np.float64), r["label"])
        for r in load_table(spark, sf_dir_mid, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .collect()
    }
    by_anchor: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["anchor_id"], r["rn"])):
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    assert set(by_anchor) == {i for i in e if i % 40 == 0}
    for aid, got in by_anchor.items():
        av, albl = e[aid]
        cands = []
        for cid, (cv, clbl) in e.items():
            if cid == aid or clbl == albl:
                continue
            sim = float(av @ cv / (np.linalg.norm(av) * np.linalg.norm(cv)))
            cands.append((round(sim, 4), cid))
        cands.sort(key=lambda x: (-x[0], x[1]))
        assert [(r["sim"], r["cand_id"]) for r in got] == cands[:3]
        for r in got:
            assert r["cand_label"] != r["anchor_label"] == albl


def test_random_projection_preserves_structure(spark, sf_dir_mid):
    """The projection must (a) equal an exact numpy reimplementation
    bit-for-bit (fixed-point contract), and (b) roughly preserve
    relative distances: over sampled pairs, the Spearman-style rank
    agreement between 64-dim and 8-dim distances is clearly positive
    (JL guarantee at this k is loose — assert direction, not epsilon)."""
    from bigdata_googleplaystore_spark.catalog.llm import _jl_matrix, _JL_SCALE

    rows = QUERIES["embedding_random_projection"].fn(spark, sf_dir_mid).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir_mid, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .collect()
    }
    M = np.array(_jl_matrix(), dtype=np.int64)
    got_proj = {}
    for r in rows:
        q = np.trunc(vecs[r["vec_id"]] * _JL_SCALE).astype(np.int64)
        want = np.round((q @ M.T) / float(_JL_SCALE), 6)
        got = np.array([r[f"p{k}"] for k in range(8)])
        assert np.array_equal(got, want), r["vec_id"]
        got_proj[r["vec_id"]] = got
    ids = sorted(got_proj)[:60]
    hi, lo = [], []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        hi.append(float(np.linalg.norm(vecs[a] - vecs[b])))
        lo.append(float(np.linalg.norm(got_proj[a] - got_proj[b])))
    corr = np.corrcoef(np.argsort(np.argsort(hi)), np.argsort(np.argsort(lo)))[0, 1]
    assert corr > 0.3, corr


def test_zscore_group_moments(spark, sf_dir_mid):
    """Within every source, the z column must have mean ~0 and population
    std ~1 (up to the round(6) quantization), and z must be monotone in
    the raw feature."""
    rows = QUERIES["zscore_normalize_features"].fn(spark, sf_dir_mid).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for source, rs in by_src.items():
        z = np.array([r["z"] for r in rs])
        if len(rs) < 2 or z.std() == 0:
            continue
        assert abs(z.mean()) < 1e-4, source
        assert abs(z.std() - 1.0) < 1e-3, source
        order_raw = sorted(rs, key=lambda r: (r["n_chars"], r["doc_id"]))
        zs = [r["z"] for r in order_raw]
        assert all(a <= b + 1e-12 for a, b in zip(zs, zs[1:])), source


def test_tokenize_vocab_ids_roundtrip(spark, sf_dir):
    """Vocabulary ids must be 1..1000 dense by (freq desc, tok asc); a
    python reimplementation over the collected corpus must reproduce
    every doc's id prefix, token count, and OOV count."""
    from collections import Counter

    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    counts = Counter(t for toks in docs.values() for t in toks)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    vocab = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
    got = {r["doc_id"]: r for r in QUERIES["tokenize_to_vocab_ids"].fn(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, toks in docs.items():
        ids = [vocab.get(t, 0) for t in toks]
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_oov"] == sum(1 for i in ids if i == 0)
        assert r["ids_csv"] == ",".join(str(i) for i in ids[:50])


def test_group_holdout_no_source_straddles_splits(spark, sf_dir):
    """Leakage contract: no source appears in both splits, every doc is
    covered exactly once, and assignment is repartition-invariant."""
    rows = QUERIES["group_holdout_split"].fn(spark, sf_dir).collect()
    sides: dict[str, set] = {"train": set(), "heldout": set()}
    for r in rows:
        sides[r["split"]].add(r["source"])
    assert not (sides["train"] & sides["heldout"])
    d = load_table(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    assert sum(r["n_docs"] for r in rows) == d.count()
    again = QUERIES["group_holdout_split"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_temporal_split_counts_and_overlap(spark, sf_dir):
    """Split sizes must sum to the event count; the overlap statistic
    must equal the true |train_users ∩ future_users|."""
    rows = {r["split"]: r for r in QUERIES["temporal_split_leakage"].fn(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    cutoff = "2024-01-20 00:00:00"
    tr = {r["user_id"] for r in e.filter(F.col("ts") < cutoff).select("user_id").distinct().collect()}
    fu = {r["user_id"] for r in e.filter(F.col("ts") >= cutoff).select("user_id").distinct().collect()}
    assert rows["train"]["n_users"] == len(tr)
    assert rows["future"]["n_users"] == len(fu)
    for r in rows.values():
        assert r["n_overlap_users"] == len(tr & fu)
    assert rows["train"]["n_events"] + rows["future"]["n_events"] == e.count()


def _reference_bpe(word_freqs: dict[str, int], n_merges: int, min_freq: int):
    """Pure-Python Sennrich-style BPE on a word-frequency dict: chars +
    '</w>' marker, most-frequent adjacent pair each round ((freq desc,
    l, r) tiebreak), leftmost non-overlapping greedy replacement."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), pf = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if pf < min_freq:
            break
        merges.append((rank, l, r, pf))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    """The distributed BPE trainer learns exactly the merge table a
    pure-Python reference learns from the same word counts — pair
    selection, tiebreaks, and the greedy left-to-right re-segmentation
    all agree (the fold in _apply_merge must not re-merge a symbol it
    just produced: 'aaa' -> ['aa','a'], not ['aaa']). This is the
    REAL-CORPUS trainer run (the path bench.py times as
    bpe_train_corpus); the registered bpe_learn_merges query moved to a
    planted tie-free vocab in round 6 and is covered below."""
    from bigdata_googleplaystore_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    words = bpe.word_counts(docs)
    wf = {r["word"]: r["freq"] for r in words.collect()}
    expected = _reference_bpe(wf, n_merges=16, min_freq=2)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe.learn_bpe_merges(spark, words, 16, 2).collect()
    ]
    assert got == expected
    # The distributed loop (driver_vocab_limit=0 bypasses the hybrid
    # cutover) must produce the same table merge-for-merge.
    got_dist = [
        (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe.learn_bpe_merges(
            spark, words, 16, 2, driver_vocab_limit=0
        ).collect()
    ]
    assert got_dist == expected


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_planted_bpe_closed_form_holds_for_any_tiefree_vocab(data):
    """PROPERTY behind the round-6 bpe_learn_merges oracle, checked over
    random instances (pure Python — no Spark in the loop): for ANY vocab
    of k two-letter words over globally distinct letters with strictly
    decreasing frequencies all >= min_freq, the merge sequence is the
    closed form the oracle assumes — each word contributes exactly two
    consecutive merges, chosen by the (freq desc, l, r) tiebreak:

      l < r:  (l, r)     then (l||r, '</w>')      [the planted query's case]
      l > r:  (r, '</w>') then (l, r||'</w>')     [tiebreak flips on the
                                                   first key — covered here
                                                   though the plant always
                                                   sorts l < r]

    This re-proves the mathematical argument (non-interacting words,
    strict frequency ordering, first-key tie resolution) the SQL oracle
    rests on, not just the one 8-word instance."""
    import string

    k = data.draw(st.integers(min_value=1, max_value=13), label="n_words")
    letters = data.draw(
        st.permutations(string.ascii_lowercase), label="letters"
    )[: 2 * k]
    freqs = sorted(
        data.draw(
            st.sets(st.integers(min_value=2, max_value=10**6),
                    min_size=k, max_size=k),
            label="freqs",
        ),
        reverse=True,
    )
    words = [(letters[2 * i], letters[2 * i + 1]) for i in range(k)]
    wf = {l + r: f for (l, r), f in zip(words, freqs)}
    expected = []
    for i, (l, r) in enumerate(words):
        f = freqs[i]
        base = 2 * i
        if l < r:
            expected.append((base + 1, l, r, f))
            expected.append((base + 2, l + r, "</w>", f))
        else:
            expected.append((base + 1, r, "</w>", f))
            expected.append((base + 2, l, r + "</w>", f))
    assert _reference_bpe(wf, n_merges=2 * k, min_freq=2) == expected


def test_bpe_planted_query_matches_reference_and_closed_form(spark, sf_dir):
    """The registered bpe_learn_merges query (planted tie-free vocab,
    round-6): its 16-merge output must equal BOTH the pure-Python
    reference run on the same planted vocab AND the closed form the
    DuckDB oracle derives (merge 2i+1 = (l_i, r_i, f_i), merge 2i+2 =
    (l_i||r_i, '</w>', f_i) with f_i = max(|documents|, 2) + 8 - i) —
    i.e. the planting argument itself is re-proven against the
    reference implementation, not just against the SQL that assumes
    it."""
    n_docs = load_table(spark, sf_dir, "documents").count()
    c = max(n_docs, 2)
    letters = [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"),
               ("i", "j"), ("k", "l"), ("m", "n"), ("o", "p")]
    wf = {l + r: c + 8 - i for i, (l, r) in enumerate(letters)}
    expected = _reference_bpe(wf, n_merges=16, min_freq=2)
    closed_form = []
    for i, (l, r) in enumerate(letters):
        closed_form.append((2 * i + 1, l, r, c + 8 - i))
        closed_form.append((2 * i + 2, l + r, "</w>", c + 8 - i))
    assert expected == closed_form
    got = sorted(
        (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
        for r in QUERIES["bpe_learn_merges"].fn(spark, sf_dir).collect()
    )
    assert got == closed_form


@HEAVY
def test_bpe_batched_merges_match_reference_on_adversarial_vocabs(spark):
    """The round-4 merge BATCHING (two merges per pass when
    _second_merge_safe proves sequential equivalence) must stay
    bit-identical to the sequential reference on vocabularies built to
    stress its guard conditions: tiny alphabets force run chains
    ('aaaa' -> the l1 == r1 no-batch rule), frequency ties exercise the
    (freq desc, l, r) tiebreak, and re-used spellings exercise the
    prior-spelling check."""
    import random

    from bigdata_googleplaystore_spark.operators import bpe

    for seed in range(6):
        rng = random.Random(seed)
        alphabet = "ab" if seed % 2 == 0 else "abc"
        words = {}
        for _ in range(40):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        wf_df = spark.createDataFrame(
            list(words.items()), "word string, freq long"
        )
        want = _reference_bpe(words, n_merges=30, min_freq=2)
        # driver_vocab_limit=0 forces the DISTRIBUTED loop (the batching
        # machinery under test); the default-path (driver-side) result
        # must agree bit-for-bit as well.
        got = [
            (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
            for r in bpe.learn_bpe_merges(
                spark, wf_df, 30, 2, driver_vocab_limit=0
            ).collect()
        ]
        assert got == want, f"seed={seed}: {got} != {want}"
        got_local = [
            (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
            for r in bpe.learn_bpe_merges(spark, wf_df, 30, 2).collect()
        ]
        assert got_local == want, f"seed={seed} (driver path)"


def test_bpe_fold_overlap_semantics(spark):
    """Overlapping-pair edge case pinned directly: merging ('a','a') on
    'aaaa' gives ['aa','aa'] and on 'aaa' gives ['aa','a'] — leftmost
    non-overlapping, same as the reference replace."""
    from bigdata_googleplaystore_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],)], "symbols array<string>"
    )
    out = [r[0] for r in df.select(_apply_merge("symbols", "a", "a")).collect()]
    assert out == [["aa", "aa"], ["aa", "a"]]


def _reference_pq(vecs: dict[int, list[float]], m: int, k: int, iters: int):
    """Numpy replica of operators/pq.py: lowest-id seeding, L2 argmin
    with lowest-cid ties, mean update, empty clusters keep codewords."""
    ids = sorted(vecs)
    X = np.array([vecs[i] for i in ids], dtype=np.float64)
    d_sub = X.shape[1] // m
    books = [
        X[:k, s * d_sub : (s + 1) * d_sub].copy() for s in range(m)
    ]
    for _ in range(iters):
        for s in range(m):
            sub = X[:, s * d_sub : (s + 1) * d_sub]
            d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin takes lowest index on ties
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    books[s][c] = members.mean(axis=0)
    codes = {}
    err = {}
    for row, i in enumerate(ids):
        cs = []
        e = 0.0
        for s in range(m):
            sub = X[row, s * d_sub : (s + 1) * d_sub]
            d2 = ((books[s] - sub) ** 2).sum(axis=1)
            c = int(d2.argmin())
            cs.append(c)
            e += float(d2[c])
        codes[i] = cs
        err[i] = e
    return codes, err


def test_pq_codes_match_numpy_reference(spark, sf_dir):
    """The distributed PQ trainer tracks a numpy replica of the same
    algorithm. Float accumulation order differs between Spark's
    partial-aggregate means and numpy's, so near-tie assignments may
    flip: require >= 95% identical codes and reconstruction error
    agreement within 1%."""
    from bigdata_googleplaystore_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    vecs = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}
    ref_codes, ref_err = _reference_pq(vecs, m=4, k=16, iters=3)

    books = pq.train_codebooks(e, m=4, k=16, iters=3)
    got = {
        r["vec_id"]: (list(r["codes"]), r["sq_err"])
        for r in pq.encode(e, books).collect()
    }
    assert set(got) == set(ref_codes)
    agree = sum(1 for i in got if got[i][0] == ref_codes[i])
    assert agree / len(got) >= 0.95, f"only {agree}/{len(got)} codes agree"
    tot_got = sum(v[1] for v in got.values())
    tot_ref = sum(ref_err.values())
    assert abs(tot_got - tot_ref) <= 0.01 * max(tot_ref, 1e-9)


def test_pq_shape_and_training_improves(spark, sf_dir):
    """Structural invariants: 4 codes per vector, each in [0,16); and
    3 Lloyd iterations strictly reduce total reconstruction error vs
    the seed-only codebook (training does something)."""
    from bigdata_googleplaystore_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    seed_books = pq.train_codebooks(e, m=4, k=16, iters=0)
    trained = pq.train_codebooks(e, m=4, k=16, iters=3)
    err0 = pq.encode(e, seed_books).agg(F.sum("sq_err")).collect()[0][0]
    err3 = pq.encode(e, trained).agg(F.sum("sq_err")).collect()[0][0]
    assert err3 < err0
    for r in pq.encode(e, trained).collect():
        assert len(r["codes"]) == 4
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_adc_arithmetic_exact_and_recall(spark, sf_dir):
    """Two pins on ADC retrieval: (1) the ADC distance is EXACTLY the L2^2
    between the query and the candidate's PQ reconstruction (sum of
    per-subspace codeword distances — numpy-recomputed to 6dp, the
    query's rounding); (2) mean recall@5 vs exact L2 stays far above
    chance (measured 0.35 with m=8,k=32; chance = 5/N ~ 0.01; a broken
    distance-table lookup collapses to chance)."""
    from bigdata_googleplaystore_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in e.collect()}
    books = pq.train_codebooks(e, m=8, k=32, iters=3)
    codes_df = pq.encode(e, books)
    codes = {r["vec_id"]: list(r["codes"]) for r in codes_df.collect()}
    queries = e.orderBy("vec_id").limit(20)
    got = pq.adc_topk(codes_df, queries, books, k=5).collect()
    assert len(got) > 0

    books_np = [np.array(b, dtype=np.float64) for b in books]
    d_sub = len(books_np[0][0])
    for r in got:
        qv = vecs[r["query_id"]]
        expect = sum(
            float(((qv[s * d_sub : (s + 1) * d_sub] - books_np[s][c]) ** 2).sum())
            for s, c in enumerate(codes[r["cand_id"]])
        )
        assert abs(r["adc_dist"] - round(expect, 6)) <= 1e-4, (r, expect)

    ids = sorted(vecs)
    X = np.stack([vecs[i] for i in ids])
    from collections import defaultdict

    by_q = defaultdict(set)
    for r in got:
        by_q[r["query_id"]].add(r["cand_id"])
    recalls = []
    for qid in sorted(by_q):
        d2 = ((X - vecs[qid]) ** 2).sum(axis=1)
        top5 = [i for i in (ids[j] for j in np.argsort(d2, kind="stable")) if i != qid][:5]
        recalls.append(len(set(top5) & by_q[qid]) / 5)
    assert float(np.mean(recalls)) >= 0.15


def test_bpe_fold_property_random_symbol_runs(spark):
    """Property check of the merge fold on adversarial symbol runs:
    for every (sequence, pair) case the Spark fold must equal the
    reference's leftmost non-overlapping replace. Cases target overlap
    chains ('aaaaa'), interleavings, multi-char symbols equal to the
    merged token, and pairs absent from the sequence."""
    from bigdata_googleplaystore_spark.operators.bpe import _apply_merge

    def ref_merge(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    cases = [
        (["a"] * n, "a", "a") for n in range(1, 7)
    ] + [
        (["a", "b", "a", "b", "a"], "a", "b"),
        (["a", "b", "a", "b", "a"], "b", "a"),
        (["ab", "a", "b", "ab"], "a", "b"),      # merged token already present
        (["a", "ab", "b", "a", "b"], "ab", "b"),  # multi-char left side
        (["x", "y", "z"], "a", "b"),              # pair absent
        (["b", "a", "a", "b", "a", "a", "a"], "a", "a"),
        (["</w>", "a", "</w>"], "a", "</w>"),     # end-of-word marker as right
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        "i int, symbols array<string>",
    )
    for i, (syms, l, r) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_apply_merge("symbols", l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert got == ref_merge(syms, l, r), (syms, l, r, got)


def test_bpe_encode_fixed_matches_python_fold(spark, sf_dir):
    """The wrapper-separator regex encode (bpe_encode_fixed_vocab) must
    segment every vocab word exactly like the greedy leftmost
    non-overlapping fold applied merge-by-merge in priority order — the
    same semantics _apply_merge pins for the trainer."""
    from bigdata_googleplaystore_spark.catalog.llm import _FIXED_MERGES

    def fold(syms, l, r):
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    got = {
        r["word"]: (r["encoding"], r["n_tokens"])
        for r in QUERIES["bpe_encode_fixed_vocab"].fn(spark, sf_dir).collect()
    }
    assert len(got) > 0
    for word, (encoding, n) in got.items():
        syms = list(word) + ["</w>"]
        for l, r in _FIXED_MERGES:
            syms = fold(syms, l, r)
        assert encoding == " ".join(syms), word
        assert n == len(syms)


# ---------------------------------------------------------------------------
# Round-4 batch 2: exact-substring span dedup + char entropy
# ---------------------------------------------------------------------------


def test_exact_substring_dedup_invariants(spark, sf_dir):
    """Pure-Python re-derivation of the ExactSubstr contract on the real
    corpus: (1) after removal, re-counting K-gram spans of the ORIGINAL
    corpus marks exactly the positions the query reported; (2) untouched
    docs round-trip verbatim; (3) kept_text is the original token stream
    minus exactly the covered positions."""
    from collections import Counter

    from bigdata_googleplaystore_spark.catalog.llm import _SPAN_K as K
    from bigdata_googleplaystore_spark.catalog.registry import QUERIES

    out = {
        r["doc_id"]: r
        for r in QUERIES["dedup_exact_substring"].fn(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in load_table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL")
        .collect()
    }
    counts = Counter(
        " ".join(ws[i : i + K])
        for ws in docs.values()
        for i in range(len(ws) - K + 1)
    )
    for doc_id, ws in docs.items():
        covered = set()
        for i in range(len(ws) - K + 1):
            if counts[" ".join(ws[i : i + K])] > 1:
                covered.update(range(i, i + K))
        row = out[doc_id]
        assert row["n_words"] == len(ws)
        assert row["n_removed"] == len(covered), doc_id
        expect = " ".join(w for i, w in enumerate(ws) if i not in covered)
        assert row["kept_text"] == expect, doc_id
    # The corpus actually exercises both paths.
    removed = [r for r in out.values() if r["n_removed"] > 0]
    assert removed and len(removed) < len(out)


def test_char_entropy_matches_numpy(spark, sf_dir):
    """Entropy recomputed in float64 numpy for every doc: same 6dp value,
    and the mathematical bounds hold (0 <= H <= log2(27))."""
    import math
    import re
    from collections import Counter

    from bigdata_googleplaystore_spark.catalog.registry import QUERIES

    out = {
        r["doc_id"]: r
        for r in QUERIES["text_char_entropy"].fn(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: re.sub("[^a-z ]", "", r["text"].lower())
        for r in load_table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL")
        .collect()
    }
    n_checked = 0
    for doc_id, t in docs.items():
        if not t:
            assert doc_id not in out
            continue
        c = Counter(t)
        n = sum(c.values())
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        row = out[doc_id]
        assert row["n_chars_az"] == n
        assert row["n_distinct_chars"] == len(c)
        assert abs(row["char_entropy_bits"] - round(h, 6)) <= 1e-6
        assert -1e-9 <= row["char_entropy_bits"] <= math.log2(27) + 1e-9
        n_checked += 1
    assert n_checked == len(out)


def test_bpe_string_apply_matches_fold(spark):
    """The trainer's wrapped-string regexp_replace merge application
    (round 4b) must equal the _apply_merge fold on every adversarial
    case the fold property test pins — run chains, interleavings,
    multi-char symbols equal to the merged token, absent pairs, and the
    end-of-word marker."""
    from bigdata_googleplaystore_spark.operators.bpe import (
        _apply_merge,
        _merge_pattern,
    )

    cases = [
        (["a"] * n, "a", "a") for n in range(1, 7)
    ] + [
        (["a", "b", "a", "b", "a"], "a", "b"),
        (["a", "b", "a", "b", "a"], "b", "a"),
        (["ab", "a", "b", "ab"], "a", "b"),
        (["a", "ab", "b", "a", "b"], "ab", "b"),
        (["x", "y", "z"], "a", "b"),
        (["b", "a", "a", "b", "a", "a", "a"], "a", "a"),
        (["</w>", "a", "</w>"], "a", "</w>"),
    ]
    df = spark.createDataFrame(
        [(i, syms, l, r) for i, (syms, l, r) in enumerate(cases)],
        "i int, symbols array<string>, l string, r string",
    )
    wrapped = F.concat(F.lit("_"), F.array_join("symbols", "__"), F.lit("_"))
    pat, rep = _merge_pattern(F.col("l"), F.col("r"))
    via_str = F.split(
        F.expr("btrim(s2, '_')"), "__"
    ).alias("via_str")
    rows = (
        df.select(
            "i",
            _apply_merge("symbols", F.col("l"), F.col("r")).alias("via_fold"),
            F.regexp_replace(wrapped, pat, rep).alias("s2"),
        )
        .select("i", "via_fold", via_str)
        .collect()
    )
    assert len(rows) == len(cases)
    for r in rows:
        assert r["via_fold"] == r["via_str"], cases[r["i"]]


def test_logreg_trainer_matches_numpy(spark, sf_dir):
    """Float64 numpy replica of the full-batch GD loop (same 6dp gradient
    rounding, same z>=0 decision rule) must reproduce every weight and
    accuracy count; training must actually move the weights."""
    from bigdata_googleplaystore_spark.catalog.llm import (
        _LOGREG_LR,
        _LOGREG_STEPS,
    )

    docs = [
        r["text"].strip().lower().split()
        for r in load_table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL")
        .collect()
    ]
    stop = {"the", "a", "of", "and", "to"}
    X = np.array(
        [
            [
                len(ws) / 50.0,
                sum(1 for t in ws if t in stop) / float(len(ws)),
                len(set(ws)) / float(len(ws)),
                1.0,
            ]
            for ws in docs
        ]
    )
    y = np.array([1.0 if "spark" in ws else 0.0 for ws in docs])
    w = np.zeros(4)
    expected = []
    for step in range(1, _LOGREG_STEPS + 1):
        z = X @ w
        n_correct = int(((z >= 0) == (y == 1.0)).sum())
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.round(((p - y)[:, None] * X).sum(axis=0) / len(y), 6)
        w = np.round(w - _LOGREG_LR * g, 6)
        expected.append((step, *w.tolist(), n_correct, len(y)))
    got = [
        tuple(r)
        for r in QUERIES["logreg_quality_classifier"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert len(got) == _LOGREG_STEPS
    for e_row, g_row in zip(expected, got):
        assert g_row[0] == e_row[0] and g_row[5] == e_row[5] and g_row[6] == e_row[6]
        for ew, gw in zip(e_row[1:5], g_row[1:5]):
            assert abs(ew - gw) < 1e-9, (e_row, g_row)
    assert any(abs(v) > 0 for v in got[-1][1:5])


def test_pq_planted_fixpoint_codes_and_adc(spark, sf_dir):
    """Fast pin of the planted-fixpoint gates behind the two PQ catalog
    oracles (round-5): training on exact copies of the k lowest-id
    anchors must (a) encode every copy to its anchor's rank with
    reconstruction error ~0 through all 3 Lloyd iterations, and (b) rank
    each anchor-query's 5 non-self copies at rounded ADC distance 0.0 in
    cand_id order. Guards the seeding order, the fixpoint stability of
    centroid means over identical members, and the ranking tiebreak that
    the sf0.01/sf0.1 driver oracles rely on."""
    from bigdata_googleplaystore_spark.catalog.llm import (
        embedding_pq_codes,
        sim_ann_pq_adc,
    )

    codes = embedding_pq_codes(spark, sf_dir).collect()
    assert len(codes) == 48
    by_anchor = {}
    for r in codes:
        assert r["sq_err"] == 0.0
        parts = set(r["codes_str"].split("-"))
        assert len(parts) == 1  # all 4 subspaces agree on the anchor code
        by_anchor.setdefault(r["vec_id"] % 10_000_000, set()).add(parts.pop())
    assert len(by_anchor) == 16
    for copies_codes in by_anchor.values():
        assert len(copies_codes) == 1  # all 3 copies share one code

    adc = sim_ann_pq_adc(spark, sf_dir).collect()
    assert len(adc) == 32 * 5
    for r in adc:
        assert r["adc_dist"] == 0.0
        assert r["cand_id"] == r["query_id"] + 10_000_000 * r["rank"]


@HEAVY
def test_ivf_pq_rerank_endpoint_and_production_recall(spark, sf_dir):
    """operators/pq.ivf_pq_topk: (a) at the deterministic endpoint
    (n_probe = n_cells, no shortlist cut) the composed cell -> code ->
    ADC -> rerank pipeline must EQUAL brute-force top-k value-for-value
    (the property the registered gate sim_ann_ivf_pq_rerank
    hash-checks against SQL); (b) at production knobs (half the cells
    probed, shortlist 50, M=8) recall@5 against brute force must clear
    a floor — the pipeline loses only via cell pruning and the ADC
    cut, both bounded on this corpus."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import pq, similarity
    from bigdata_googleplaystore_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    queries = e.filter(F.col("vec_id") < 10)
    brute = {
        (r["query_id"], r["cand_id"], r["sim"], r["rn"])
        for r in similarity.cosine_topk(e, queries, k=5).collect()
    }

    endpoint = {
        (r["query_id"], r["cand_id"], r["sim"], r["rn"])
        for r in pq.ivf_pq_topk(
            e, queries, k=5, n_cells=8, n_probe=8, m=8, shortlist=0, iters=2
        ).collect()
    }
    assert endpoint == brute

    prod = {
        (r["query_id"], r["cand_id"])
        for r in pq.ivf_pq_topk(
            e, queries, k=5, n_cells=8, n_probe=4, m=8, shortlist=50, iters=2
        ).collect()
    }
    truth_pairs = {(q, c) for q, c, _, _ in brute}
    recall = len(prod & truth_pairs) / len(truth_pairs)
    # measured 0.82+ at these knobs on the sf0.001/sf0.01 corpora; the
    # floor is set where a lost stage (wrong cells, dropped codes)
    # cannot hide
    assert recall >= 0.6, recall


@HEAVY
def test_bpe_merges_match_reference_on_random_tied_vocabs(spark):
    """Property (hypothesis): the trainer equals the pure-Python
    reference on RANDOM tiny-alphabet vocabularies, where pair-count
    TIES are pervasive — the tie-rule coverage the real-corpus test
    (one corpus) and the planted tie-free oracle deliberately lack.
    Both the driver-side hybrid path and the distributed loop
    (driver_vocab_limit=0) must match merge-for-merge."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators import bpe

    word = st.text(alphabet="ab", min_size=1, max_size=4)

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        wf=st.dictionaries(
            word, st.integers(min_value=1, max_value=5), min_size=1, max_size=6
        )
    )
    def check(wf):
        expected = _reference_bpe(wf, n_merges=6, min_freq=2)
        words = spark.createDataFrame(list(wf.items()), "word STRING, freq BIGINT")
        for limit in (65_536, 0):
            got = [
                (r["merge_rank"], r["left"], r["right"], r["pair_freq"])
                for r in bpe.learn_bpe_merges(
                    spark, words, 6, 2, driver_vocab_limit=limit
                ).collect()
            ]
            assert got == expected, (limit, wf)

    check()
