"""Approximate aggregates: bounded error vs exact."""

from __future__ import annotations

from bigdata_googleplaystore_spark.catalog import QUERIES

from _markers import HEAVY


def test_approx_distinct_error_bound(spark, sf_dir_mid):
    """The query now self-asserts the HLL++ error bound (|approx-exact|
    <= ceil(3*rsd*exact)) so its DuckDB oracle can check the sketch path
    — every group must report within_bound, with a sane exact count."""
    rows = QUERIES["agg_approx_distinct"].fn(spark, sf_dir_mid).collect()
    assert rows
    for r in rows:
        assert r["within_bound"] is True, (r["l_returnflag"], r["exact_orders"])
        assert r["exact_orders"] > 0


def test_corrupt_record_tracking(spark, tmp_path):
    """§2.7: permissive CSV reads can surface unparseable rows in a
    _corrupt_record column instead of silently nulling them (the
    reference's implicit PERMISSIVE mode tracks nothing)."""
    p = tmp_path / "dirty.csv"
    p.write_text("a,b\n1,2\n3\n4,5,6\nx,7\n")
    from bigdata_googleplaystore_spark.sources import read_csv

    df = read_csv(
        spark,
        str(p),
        schema="a INT, b INT",
        corrupt_record_col="_corrupt_record",
    )
    rows = df.collect()
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    good = [r for r in rows if r["_corrupt_record"] is None]
    # short row (3), long row (4,5,6) and type-bad row (x,7) are tracked
    assert len(bad) == 3 and len(good) == 1
    assert good[0]["a"] == 1 and good[0]["b"] == 2


def test_approx_percentiles_within_rank_error(spark, sf_dir_mid):
    """GK sketch contract: each reported quantile's true rank is within
    n/accuracy of the requested rank. Checked against the exact sorted
    values per group at sf0.01."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.sources import load_table

    got = {
        r["o_orderstatus"]: r
        for r in QUERIES["percentiles_approx"].fn(spark, sf_dir_mid).collect()
    }
    o = load_table(spark, sf_dir_mid, "orders")
    # the query now self-asserts the GK rank bound; verify the flags and
    # independently re-derive the sketch values and rank-check them
    appr = {
        r["o_orderstatus"]: r["pcts"]
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)), 10000
            ).alias("pcts")
        )
        .collect()
    }
    for status, row in got.items():
        assert row["p25_ok"] and row["p50_ok"] and row["p90_ok"], status
        vals = sorted(
            r["o_totalprice"]
            for r in o.filter(F.col("o_orderstatus") == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        assert row["n"] == n
        tol = max(1, n // 10000 + 1)
        for q, idx in ((0.25, 0), (0.5, 1), (0.9, 2)):
            import bisect

            v = appr[status][idx]
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            want = q * (n - 1)
            assert lo - tol <= want <= hi + tol, (status, q, lo, hi, want)


def test_blocked_fuzzy_pairs_semantics(spark):
    """Pairs only form within a block; dist is exact Levenshtein; pairs
    are canonically ordered (name_a < name_b) so no duplicates."""
    from bigdata_googleplaystore_spark.operators.dedup import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            ("red bolt", "bolt"),
            ("hot bolt", "bolt"),
            ("old bolt", "bolt"),
            ("red ring", "ring"),  # cross-block: never paired with bolts
            ("crimson fastener", "fastener"),
        ],
        ["name", "blk"],
    )
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in blocked_fuzzy_pairs(df, "name", "blk", max_dist=3).collect()
    }
    assert got == {
        ("hot bolt", "red bolt"): 3,
        ("hot bolt", "old bolt"): 3,
        ("old bolt", "red bolt"): 2,
    }


def test_quality_checks_catch_planted_violations(spark):
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (None, 5.0), (4, None)],
        "id int, v double",
    )
    got = {
        r["check_name"]: (r["n_bad"], r["n_total"], r["ok"])
        for r in quality.expect_agg(
            df,
            {
                "id.not_null": F.col("id").isNull(),
                "v.non_negative": F.col("v") < 0,
                "v.not_null": F.col("v").isNull(),
            },
        ).collect()
    }
    assert got == {
        "id.not_null": (1, 4, False),
        "v.non_negative": (1, 4, False),
        "v.not_null": (1, 4, False),
    }
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k int")
    row = quality.expect_fk(child, "k", parent, "k", "child.k_fk").collect()[0]
    # null FK values are not orphans; 9 is
    assert (row["n_bad"], row["n_total"], row["ok"]) == (1, 3, False)


def test_mad_matches_numpy(spark, sf_dir):
    """Nested-median MAD must equal numpy's median-of-absolute-deviations
    on exact integer cents."""
    import numpy as np

    from bigdata_googleplaystore_spark.sources import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    ).collect()
    by_s: dict[str, list] = {}
    for r in rows:
        by_s.setdefault(r["o_orderstatus"], []).append(
            int(round(r["o_totalprice"] * 100))
        )
    got = {r["o_orderstatus"]: r for r in QUERIES["mad_robust_stats"].fn(spark, sf_dir).collect()}
    assert set(got) == set(by_s)
    for s, cents in by_s.items():
        a = np.array(cents, dtype=np.float64)
        med = np.median(a)
        mad = np.median(np.abs(a - med))
        assert got[s]["n"] == len(cents)
        assert got[s]["median_price"] == round(med / 100.0, 4)
        assert got[s]["mad_price"] == round(mad / 100.0, 4)


def test_markov_rows_are_distributions(spark, sf_dir):
    """Each source row of the transition matrix is a probability
    distribution: p > 0 and sums to 1 within rounding."""
    out = QUERIES["markov_transition_matrix"].fn(spark, sf_dir).collect()
    assert out
    by_src: dict[str, list] = {}
    for r in out:
        assert 0 < r["p"] <= 1
        by_src.setdefault(r["src"], []).append(r["p"])
    for src, ps in by_src.items():
        assert abs(sum(ps) - 1.0) < 1e-6, src


def test_chi2_matches_scipy_free_numpy(spark, sf_dir):
    """Contingency cells must reproduce the classic X² computation on the
    exact observed table (expected = row·col/total; terms sum to X²)."""
    import numpy as np

    from bigdata_googleplaystore_spark.sources import load_table
    from pyspark.sql import functions as F

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select("event_type", (F.col("value") >= 50).alias("hi"))
        .collect()
    )
    obs: dict[tuple, int] = {}
    for r in e:
        k = (r["event_type"], "high" if r["hi"] else "low")
        obs[k] = obs.get(k, 0) + 1
    na: dict[str, int] = {}
    nb: dict[str, int] = {}
    for (a, b), n in obs.items():
        na[a] = na.get(a, 0) + n
        nb[b] = nb.get(b, 0) + n
    nt = sum(obs.values())

    got = {
        (r["event_type"], r["value_band"]): r
        for r in QUERIES["chi2_contingency_assoc"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(obs)
    chi2 = 0.0
    for k, r in got.items():
        a, b = k
        exp = na[a] * nb[b] / nt
        assert r["n"] == obs[k]
        assert abs(r["expected"] - exp) < 1e-4
        assert abs(r["chi2_term"] - (obs[k] - exp) ** 2 / exp) < 1e-4
        chi2 += r["chi2_term"]
    assert chi2 >= 0


def test_percentile_disc_returns_occurring_values(spark, sf_dir):
    """Discrete percentiles must be values that actually occur, at the
    smallest-cume_dist>=q position of the sorted group."""
    from bigdata_googleplaystore_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    ).collect()
    by_s: dict[str, list] = {}
    for r in rows:
        by_s.setdefault(r["o_orderstatus"], []).append(
            int(round(r["o_totalprice"] * 100))
        )
    got = {r["o_orderstatus"]: r for r in QUERIES["percentiles_disc"].fn(spark, sf_dir).collect()}
    import math

    for s, cents in by_s.items():
        cents.sort()
        n = len(cents)
        for q, col in ((0.5, "p50_cents"), (0.9, "p90_cents"), (0.99, "p99_cents")):
            want = cents[max(0, math.ceil(q * n) - 1)]
            assert got[s][col] == want, (s, col)
            assert got[s][col] in cents


def test_running_distinct_monotone_and_final(spark, sf_dir):
    """The running distinct count is non-decreasing per user, steps by at
    most 1, and its final value equals the user's true distinct-type
    count."""
    from bigdata_googleplaystore_spark.sources import load_table
    from pyspark.sql import functions as F

    out = QUERIES["running_distinct_types"].fn(spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["n_distinct_types_so_far"])
        )
    truth = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    for user, rows in per_user.items():
        rows.sort()
        counts = [c for _, _, c in rows]
        assert counts[0] == 1
        for a, b in zip(counts, counts[1:]):
            assert a <= b <= a + 1
        assert counts[-1] == truth[user]


def test_grouped_agg_weighted_avg_matches_numpy(spark, sf_dir):
    """The GROUPED_AGG pandas UDF weighted average must equal a direct
    numpy computation on exact integer cents."""
    import numpy as np

    from bigdata_googleplaystore_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", F.col("l_quantity").cast("long").alias("q")
    ).collect()
    by_f: dict[str, list] = {}
    for r in rows:
        by_f.setdefault(r["l_returnflag"], []).append(
            (int(round(r["l_extendedprice"] * 100)), r["q"])
        )
    got = {
        r["l_returnflag"]: r
        for r in QUERIES["grouped_agg_pandas_weighted_avg"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_f)
    for flag, pairs in by_f.items():
        c = np.array([p[0] for p in pairs], dtype=np.int64)
        q = np.array([p[1] for p in pairs], dtype=np.int64)
        assert got[flag]["n"] == len(pairs)
        assert got[flag]["wavg_price"] == round(float((c * q).sum() / q.sum() / 100.0), 6)


def test_lateral_topk_equals_window_form(spark, sf_dir):
    """The LATERAL formulation must produce exactly the window-rank
    top-2-per-region result (same semantics, different SQL surface)."""
    from bigdata_googleplaystore_spark.sources import load_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = sorted(
        (r["r_name"], r["n_name"], r["n_customers"])
        for r in QUERIES["sql_lateral_topk"].fn(spark, sf_dir).collect()
    )
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    counts = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("n_customers"), F.asc("n_name"))
    want = sorted(
        (r["r_name"], r["n_name"], r["n_customers"])
        for r in counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .collect()
    )
    assert out == want and len(out) == 10


def test_delta_join_identity_and_term_coverage(spark):
    """operators/incremental.delta_join: on a constructed split, the
    delta rows must equal (A' join B') minus (A_old join B_old) as a
    multiset, and each of the three delta terms must be non-empty (a
    degenerate split can make a missing-term bug invisible)."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.incremental import delta_join

    a = spark.createDataFrame(
        [(k, f"a{i}") for i, k in enumerate([1, 1, 2, 3, 4, 5])], "k INT, av STRING"
    )
    b = spark.createDataFrame(
        [(k, f"b{i}") for i, k in enumerate([1, 2, 2, 3, 5, 6])], "k INT, bv STRING"
    )
    # split chosen so every delta term intersects on some key:
    # a_old keys {1,3,4}, a_new keys {1,2,5}, b_old keys {1,2}, b_new {3,5,6}
    a_old = a.filter(F.col("av").isin("a0", "a3", "a4"))
    a_new = a.subtract(a_old)
    b_old = b.filter(F.col("k") <= 2)
    b_new = b.subtract(b_old)

    # each delta term genuinely contributes
    assert a_new.join(b_old, "k").count() > 0
    assert a_old.join(b_new, "k").count() > 0
    assert a_new.join(b_new, "k").count() > 0

    delta = delta_join(a_old, a_new, b_old, b_new, "k")
    full_new = a.join(b, "k").select("k", "av", "bv")
    full_old = a_old.join(b_old, "k").select("k", "av", "bv")

    # multiset identity: delta == (A' ⋈ B') minus (A_old ⋈ B_old)
    from collections import Counter

    got = sorted(map(tuple, delta.select("k", "av", "bv").collect()))
    want_counter = Counter(map(tuple, full_new.collect()))
    want_counter.subtract(Counter(map(tuple, full_old.collect())))
    assert all(c >= 0 for c in want_counter.values())
    assert got == sorted(want_counter.elements())

def test_delta_join_signed_retraction_identity(spark):
    """operators/incremental.delta_join_signed: with deletes on A and an
    update (delete+insert) on B, folding the signed delta into the old
    view's state must equal a full recompute over the post-change
    tables — including the disappearance of fully-retracted groups —
    and the ΔA ⋈ ΔB cross term must be non-empty (it carries the
    (-1)·(-1) = +1 cancellation the bug would silently drop)."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.incremental import (
        delta_join_signed,
        finalize_signed,
        merge_partials_signed,
        partial_agg,
        partial_agg_signed,
    )

    a = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], "k INT, grp STRING"
    )
    b = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (3, 40.0), (4, 50.0)],
        "k INT, v DOUBLE",
    )
    # deletes on A: keys 2 and 3 leave — key 3 overlaps B's update below
    # so the ΔA ⋈ ΔB cross term is non-empty, and its (-1)·(-1) = +1
    # contribution must cancel the double-subtraction of that joined row
    delta_a = a.filter(F.col("k").isin(2, 3)).withColumn("_mult", F.lit(-1))
    # update on B: the (3, 30.0) row becomes (3, 35.0)
    old_row = b.filter((F.col("k") == 3) & (F.col("v") == 30.0))
    delta_b = old_row.withColumn("_mult", F.lit(-1)).unionByName(
        old_row.withColumn("v", F.lit(35.0)).withColumn("_mult", F.lit(1))
    )
    assert (
        delta_a.join(delta_b.withColumnRenamed("_mult", "_m2"), "k").count() > 0
    )

    old_state = partial_agg(a.join(b, "k"), ["grp"], "v")
    delta_rows = delta_join_signed(a, delta_a, b, delta_b, "k")
    maintained = finalize_signed(
        merge_partials_signed(
            old_state, partial_agg_signed(delta_rows, ["grp"], "v")
        )
    )

    a_new = a.filter(~F.col("k").isin(2, 3))
    b_new = b.filter(
        ~((F.col("k") == 3) & (F.col("v") == 30.0))
    ).unionByName(spark.createDataFrame([(3, 35.0)], "k INT, v DOUBLE"))
    recomputed = (
        a_new.join(b_new, "k")
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("v").alias("total"),
            F.avg("v").alias("vavg"),
        )
    )
    got = {
        r["grp"]: (r["n_rows"], r["total"], r["vavg"])
        for r in maintained.collect()
    }
    want = {
        r["grp"]: (r["n_rows"], r["total"], r["vavg"])
        for r in recomputed.collect()
    }
    assert got == want
    # group x lost k=2 but keeps k=1; group y lost k=3 entirely but
    # keeps k=4 — assert we did exercise a partial AND verify that a
    # full retraction of one group's key leaves the group consistent
    assert set(got) == {"x", "y"}

def test_multiset_minmax_survives_extremum_deletion(spark):
    """operators/incremental.multiset_state: deleting a group's unique
    maximum must surface the runner-up (the answer scalar (min,max)
    state cannot produce), zero-count values must leave the state, and
    a fully-retracted group must disappear."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.incremental import (
        finalize_minmax,
        merge_multisets,
        multiset_state,
    )

    base = spark.createDataFrame(
        [("x", 10.0), ("x", 10.0), ("x", 7.0), ("x", 3.0), ("y", 5.0)],
        "grp STRING, v DOUBLE",
    )
    state = multiset_state(base, ["grp"], "v")
    # delete BOTH copies of x's max and y's only row
    deletes = spark.createDataFrame(
        [("x", 10.0, -1), ("x", 10.0, -1), ("y", 5.0, -1)],
        "grp STRING, v DOUBLE, _mult INT",
    )
    merged = merge_multisets(
        state, multiset_state(deletes, ["grp"], "v", "_mult")
    )
    # the netted-out (x, 10.0) and (y, 5.0) rows must be GONE from state
    assert sorted(
        (r["grp"], r["v"], r["_cnt"]) for r in merged.collect()
    ) == [("x", 3.0, 1), ("x", 7.0, 1)]
    out = {r["grp"]: (r["n_rows"], r["vmin"], r["vmax"])
           for r in finalize_minmax(merged, "v").collect()}
    assert out == {"x": (2, 3.0, 7.0)}  # max fell back 10.0 -> 7.0; y gone


def test_multiset_distinct_partial_vs_last_row_deletes(spark):
    """operators/incremental.finalize_distinct: deleting ONE of a
    value's two rows must not lower the distinct count (the value
    survives), deleting a value's LAST row must lower it, and a
    fully-retracted group must disappear — the two delete kinds a
    distinct-value set without counts cannot tell apart."""
    from bigdata_googleplaystore_spark.operators.incremental import (
        finalize_distinct,
        merge_multisets,
        multiset_state,
    )

    base = spark.createDataFrame(
        [("x", 10.0), ("x", 10.0), ("x", 7.0), ("x", 3.0), ("y", 5.0)],
        "grp STRING, v DOUBLE",
    )
    state = multiset_state(base, ["grp"], "v")
    # partial delete (one of x's two 10.0 rows), last-row delete (x's
    # only 7.0 row), full group retraction (y's only row)
    deletes = spark.createDataFrame(
        [("x", 10.0, -1), ("x", 7.0, -1), ("y", 5.0, -1)],
        "grp STRING, v DOUBLE, _mult INT",
    )
    merged = merge_multisets(
        state, multiset_state(deletes, ["grp"], "v", "_mult")
    )
    out = {r["grp"]: (r["n_rows"], r["n_distinct"])
           for r in finalize_distinct(merged, "v").collect()}
    # x: 4 rows -> 2 rows; distinct 3 -> 2 (10.0 SURVIVES its partial
    # delete, 7.0 is gone); y fully retracted
    assert out == {"x": (2, 2)}


def test_multiset_topn_surfaces_runner_ups_after_band_delete(spark):
    """operators/incremental.finalize_topn: deleting the ENTIRE current
    top-2 value band must surface the runner-up values with their
    surviving counts (the answer scalar top-n state never retained),
    ranks must be tie-free (distinct values), a group with fewer than n
    surviving values emits only what survives, and a fully-retracted
    group disappears."""
    from bigdata_googleplaystore_spark.operators.incremental import (
        finalize_topn,
        merge_multisets,
        multiset_state,
    )

    base = spark.createDataFrame(
        [("x", 10.0), ("x", 10.0), ("x", 9.0), ("x", 7.0), ("x", 3.0),
         ("y", 5.0), ("y", 1.0)],
        "grp STRING, v DOUBLE",
    )
    state = multiset_state(base, ["grp"], "v")
    # delete x's whole top band {10.0 x2, 9.0} and ALL of y
    deletes = spark.createDataFrame(
        [("x", 10.0, -2), ("x", 9.0, -1), ("y", 5.0, -1), ("y", 1.0, -1)],
        "grp STRING, v DOUBLE, _mult INT",
    )
    merged = merge_multisets(
        state, multiset_state(deletes, ["grp"], "v", "_mult")
    )
    got = sorted(
        (r["grp"], r["rnk"], r["v"], r["n_rows"])
        for r in finalize_topn(merged, "v", n=2).collect()
    )
    # x's top-2 is now the former runner-ups; y is gone entirely
    assert got == [("x", 1, 7.0, 1), ("x", 2, 3.0, 1)]


@HEAVY
def test_multiset_state_matches_counter_model_under_random_cdc(spark):
    """Property (hypothesis): for ANY base multiset and ANY valid CDC
    feed (deletes only of present rows, arbitrary inserts, split across
    TWO delta batches folded separately), finalize_minmax,
    finalize_distinct, and finalize_topn over the merged state must
    match a plain collections.Counter reference model — the whole Z-set multiset
    algebra (state build, signed fold, zero-count eviction, group
    disappearance) checked against an independent implementation, not
    against itself."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.incremental import (
        finalize_distinct,
        finalize_minmax,
        finalize_topn,
        merge_multisets,
        multiset_state,
    )

    row = st.tuples(st.sampled_from(["a", "b"]), st.sampled_from([1.0, 2.0, 3.0]))

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        base=st.lists(row, min_size=1, max_size=12),
        delete_idx=st.sets(st.integers(min_value=0, max_value=11)),
        inserts=st.lists(row, max_size=6),
        split=st.integers(min_value=0, max_value=6),
    )
    def check(base, delete_idx, inserts, split):
        deletes = [base[i] for i in delete_idx if i < len(base)]
        model = Counter(base)
        model.subtract(deletes)
        model.update(inserts)
        # two delta batches: deletes in one, inserts split across both
        d1 = [(g, v, -1) for g, v in deletes] + [
            (g, v, 1) for g, v in inserts[:split]
        ]
        d2 = [(g, v, 1) for g, v in inserts[split:]]
        schema = "grp STRING, v DOUBLE, _mult INT"
        states = [multiset_state(spark.createDataFrame(base, "grp STRING, v DOUBLE"), ["grp"], "v")]
        for d in (d1, d2):
            if d:
                states.append(
                    multiset_state(
                        spark.createDataFrame(d, schema), ["grp"], "v", "_mult"
                    )
                )
        merged = merge_multisets(*states)
        # reference per-group answers over surviving (count > 0) values
        surviving: dict[str, list[tuple[float, int]]] = {}
        for (g, v), c in model.items():
            assert c >= 0  # valid CDC by construction
            if c > 0:
                surviving.setdefault(g, []).append((v, c))
        want_minmax = {
            g: (sum(c for _, c in vals), min(v for v, _ in vals), max(v for v, _ in vals))
            for g, vals in surviving.items()
        }
        want_distinct = {
            g: (sum(c for _, c in vals), len(vals)) for g, vals in surviving.items()
        }
        got_minmax = {
            r["grp"]: (r["n_rows"], r["vmin"], r["vmax"])
            for r in finalize_minmax(merged, "v").collect()
        }
        got_distinct = {
            r["grp"]: (r["n_rows"], r["n_distinct"])
            for r in finalize_distinct(merged, "v").collect()
        }
        # top-2 distinct values desc with surviving counts, rnk 1..2
        want_topn = {
            (g, rnk): (v, c)
            for g, vals in surviving.items()
            for rnk, (v, c) in enumerate(
                sorted(vals, key=lambda vc: -vc[0])[:2], start=1
            )
        }
        got_topn = {
            (r["grp"], r["rnk"]): (r["v"], r["n_rows"])
            for r in finalize_topn(merged, "v", n=2).collect()
        }
        assert got_minmax == want_minmax
        assert got_distinct == want_distinct
        assert got_topn == want_topn

    check()


@HEAVY
def test_signed_partials_match_counter_model_under_random_cdc(spark):
    """Property (hypothesis): the signed SCALAR state (partial_agg ->
    merge_partials_signed -> finalize_signed) must match an independent
    Python reference over any base + valid CDC feed, including NULL
    values (count vs non-null count diverge), fully-retracted groups
    (dropped), and deltas split across two batches."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.incremental import (
        finalize_signed,
        merge_partials_signed,
        partial_agg,
        partial_agg_signed,
    )

    row = st.tuples(
        st.sampled_from(["a", "b"]),
        st.sampled_from([1.0, 2.0, 3.0, None]),
    )

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        base=st.lists(row, min_size=1, max_size=12),
        delete_idx=st.sets(st.integers(min_value=0, max_value=11)),
        inserts=st.lists(row, max_size=6),
        split=st.integers(min_value=0, max_value=6),
    )
    def check(base, delete_idx, inserts, split):
        deletes = [base[i] for i in delete_idx if i < len(base)]
        d1 = [(g, v, -1) for g, v in deletes] + [
            (g, v, 1) for g, v in inserts[:split]
        ]
        d2 = [(g, v, 1) for g, v in inserts[split:]]
        schema = "grp STRING, v DOUBLE, _mult INT"
        states = [
            partial_agg(
                spark.createDataFrame(base, "grp STRING, v DOUBLE"), ["grp"], "v"
            )
        ]
        for d in (d1, d2):
            if d:
                states.append(
                    partial_agg_signed(
                        spark.createDataFrame(d, schema), ["grp"], "v"
                    )
                )
        got = {
            r["grp"]: (r["n_rows"], r["total"], r["vavg"])
            for r in finalize_signed(merge_partials_signed(*states)).collect()
        }
        # reference model over the net surviving rows
        from collections import Counter

        net = Counter(base)
        net.subtract(deletes)
        net.update(inserts)
        want = {}
        for grp in ("a", "b"):
            rows = [(v, c) for (g, v), c in net.items() if g == grp and c != 0]
            n = sum(c for _, c in rows)
            if n == 0:
                continue  # fully retracted -> dropped, like a recompute
            nonnull = [(v, c) for v, c in rows if v is not None]
            nn = sum(c for _, c in nonnull)
            # SQL SUM/AVG over zero non-null rows is NULL
            total = sum(v * c for v, c in nonnull) if nn > 0 else None
            want[grp] = (n, total, None if nn == 0 else total / nn)
        assert got == want

    check()


@HEAVY
def test_delta_join_signed_matches_model_under_random_two_sided_cdc(spark):
    """Property (hypothesis): the bilinear delta rule maintains the
    joined view exactly under ANY two-sided CDC feed — random deletes
    of present rows and random inserts on BOTH join sides — checked
    against an independent Counter model of the recomputed post-change
    join (per-key counts multiply: |A'_k| x |B'_k| rows, each carrying
    its B-side value). Randomization covers the interaction cases the
    fixed gates plant by hand: delete x delete in the cross term,
    key appearing only in a delta, groups vanishing entirely."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.incremental import (
        delta_join_signed,
        finalize_signed,
        merge_partials_signed,
        partial_agg,
        partial_agg_signed,
    )

    a_row = st.sampled_from([(k,) for k in (1, 2, 3)])
    b_row = st.tuples(st.sampled_from([1, 2, 3]), st.sampled_from([1.0, 2.0, 5.0]))

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        a=st.lists(a_row, min_size=1, max_size=6),
        b=st.lists(b_row, min_size=1, max_size=6),
        a_del=st.sets(st.integers(min_value=0, max_value=5)),
        b_del=st.sets(st.integers(min_value=0, max_value=5)),
        a_ins=st.lists(a_row, max_size=3),
        b_ins=st.lists(b_row, max_size=3),
    )
    def check(a, b, a_del, b_del, a_ins, b_ins):
        a_deletes = [a[i] for i in a_del if i < len(a)]
        b_deletes = [b[i] for i in b_del if i < len(b)]
        a_df = spark.createDataFrame(a, "k INT")
        b_df = spark.createDataFrame(b, "k INT, y DOUBLE")
        da = spark.createDataFrame(
            [(k, -1) for (k,) in a_deletes] + [(k, 1) for (k,) in a_ins],
            "k INT, _mult INT",
        )
        db = spark.createDataFrame(
            [(k, y, -1) for k, y in b_deletes] + [(k, y, 1) for k, y in b_ins],
            "k INT, y DOUBLE, _mult INT",
        )
        old_state = partial_agg(a_df.join(b_df, "k"), ["k"], "y")
        delta = delta_join_signed(a_df, da, b_df, db, "k")
        got = {
            r["k"]: (r["n_rows"], r["total"])
            for r in finalize_signed(
                merge_partials_signed(old_state, partial_agg_signed(delta, ["k"], "y"))
            ).collect()
        }
        # model: recompute A' join B' per key
        a_net = Counter(k for (k,) in a)
        a_net.subtract(k for (k,) in a_deletes)
        a_net.update(k for (k,) in a_ins)
        b_net = Counter(b)
        b_net.subtract(b_deletes)
        b_net.update(b_ins)
        want = {}
        for k in (1, 2, 3):
            na = a_net[k]
            b_rows = [(y, c) for (bk, y), c in b_net.items() if bk == k and c != 0]
            nb = sum(c for _, c in b_rows)
            n = na * nb
            if n == 0:
                continue
            want[k] = (n, na * sum(y * c for y, c in b_rows))
        assert got == want

    check()


@HEAVY
def test_asof_join_matches_pandas_merge_asof(spark):
    """Property (hypothesis): the union-marker as-of join must agree with
    an INDEPENDENT implementation of the same semantics — pandas
    merge_asof (backward, inclusive) — on random tables. Right-side
    (key, ts) pairs are generated unique so both implementations' tie
    rules coincide; left timestamps repeat freely and may precede every
    right row (null match)."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.asof import asof_join

    left_row = st.tuples(
        st.sampled_from([1, 2]), st.integers(min_value=0, max_value=20)
    )
    right_pair = st.tuples(
        st.sampled_from([1, 2]), st.integers(min_value=0, max_value=20)
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        left=st.lists(left_row, min_size=1, max_size=10),
        right_keys=st.sets(right_pair, min_size=1, max_size=10),
    )
    def check(left, right_keys):
        right = [(k, t, float(k * 100 + t)) for k, t in sorted(right_keys)]
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)], "k INT, ts INT, lid INT"
        )
        rdf = spark.createDataFrame(right, "k INT, ts INT, val DOUBLE")
        got = sorted(
            (r["k"], r["ts"], r["lid"], r["val"])
            for r in asof_join(ldf, rdf, "k", "ts", ["val"], tiebreak="lid").collect()
        )
        lpd = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            columns=["k", "ts", "lid"],
        ).sort_values("ts", kind="stable")
        rpd = pd.DataFrame(right, columns=["k", "ts", "val"]).sort_values(
            "ts", kind="stable"
        )
        m = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
        want = sorted(
            (int(r.k), int(r.ts), int(r.lid), None if pd.isna(r.val) else float(r.val))
            for r in m.itertuples()
        )
        assert got == want

    check()


@HEAVY
def test_connected_components_match_union_find(spark):
    """Property (hypothesis): iterative min-label propagation over random
    edge lists must produce exactly the components a trivially-correct
    union-find computes — including long path-shaped components that
    need several propagation rounds, and the min-node-id component
    labeling contract."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.dedup import connected_components

    edge = st.tuples(
        st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(edges=st.lists(edge, min_size=1, max_size=25))
    def check(edges):
        df = spark.createDataFrame(edges, "doc_a INT, doc_b INT")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        # reference: union-find with path compression
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comps: dict[int, list[int]] = {}
        for n in parent:
            comps.setdefault(find(n), []).append(n)
        want = {n: min(members) for members in comps.values() for n in members}
        assert got == want

    check()


@HEAVY
def test_triangle_count_matches_brute_force(spark):
    """Property (hypothesis): both triangle-count methods (edge-iterator
    and wedge-join, each built on the degree-ordered orientation) must
    equal a brute-force triple enumeration on random graphs — self-loops
    and duplicate/reversed edges included, which the canonicalization
    must absorb."""
    from itertools import combinations

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.graph import triangle_count

    edge = st.tuples(
        st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(edges=st.lists(edge, min_size=1, max_size=30))
    def check(edges):
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        nodes = {n for e in und for n in e}
        want = sum(
            1
            for x, y, z in combinations(sorted(nodes), 3)
            if (x, y) in und and (x, z) in und and (y, z) in und
        )
        df = spark.createDataFrame(edges, "a INT, b INT")
        for method in ("edge_iter", "wedge"):
            row = triangle_count(df, method=method).collect()[0]
            assert row["n_triangles"] == want, (method, sorted(und))
            assert row["n_edges"] == len(und) and row["n_nodes"] == len(nodes)

    check()


@HEAVY
def test_pagerank_matches_python_model(spark):
    """Property (hypothesis): the DataFrame PageRank iteration must match
    a plain-Python reference of the same unnormalized recurrence
    (rank = (1-d) + d * sum of in-contributions, duplicate edges each
    contributing) on random digraphs, within float tolerance."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.graph import pagerank

    edge = st.tuples(
        st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(edges=st.lists(edge, min_size=1, max_size=15))
    def check(edges):
        d = 0.85
        iters = 5
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                spark.createDataFrame(edges, "src INT, dst INT"), iterations=iters
            ).collect()
        }
        nodes = {n for e in edges for n in e}
        out_deg: dict[int, int] = {}
        for s, _ in edges:
            out_deg[s] = out_deg.get(s, 0) + 1
        rank = {n: 1.0 for n in nodes}
        for _ in range(iters):
            in_sum = {n: 0.0 for n in nodes}
            for s, t in edges:
                in_sum[t] += rank[s] / out_deg[s]
            rank = {n: (1.0 - d) + d * in_sum[n] for n in nodes}
        assert set(got) == nodes
        for n in nodes:
            assert abs(got[n] - rank[n]) < 1e-9, (n, got[n], rank[n])

    check()


def test_winnow_rows_match_python_reference(spark):
    """Property (hypothesis): the staged winnowing pipeline (lower ->
    char k-grams -> md5 -> window minima -> distinct) must reproduce a
    direct Python implementation of the Schleimer et al. scheme on
    random texts — including the short-document fallback (>= 1 gram but
    < w hashes -> global min) and empty-gram docs (no fingerprints)."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.dedup import winnow_rows

    text = st.text(alphabet="abC xyZ.", min_size=0, max_size=30)
    K, W = 5, 3

    def reference(t: str) -> set[str]:
        t = t.lower()
        grams = [t[i : i + K] for i in range(len(t) - K + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        if not hs:
            return set()
        if len(hs) < W:
            return {min(hs)}
        return {min(hs[i : i + W]) for i in range(len(hs) - W + 1)}

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=st.lists(text, min_size=1, max_size=6))
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id INT, body STRING"
        )
        got: dict[int, set] = {}
        for r in winnow_rows(df, "doc_id", "body", k=K, w=W).collect():
            got.setdefault(r["doc"], set()).add(r["fp"])
        want = {i: reference(t) for i, t in enumerate(texts) if reference(t)}
        assert got == want

    check()


@HEAVY
def test_jaccard_pairs_match_python_model(spark):
    """Property (hypothesis): the inverted-index n-gram Jaccard join must
    produce exactly the pairs a brute-force Python model finds — same
    shingle sets (whitespace tokens, word 3-grams, distinct), same
    |inter|/|union| values, same threshold cut — on random small corpora
    with forced vocabulary overlap. Docs with < n tokens have empty
    shingle sets and must never pair."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.dedup import jaccard_pairs

    doc = st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6
    ).map(" ".join)

    def sh(t: str) -> frozenset:
        toks = t.strip().lower().split() or [""]
        return frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(docs=st.lists(doc, min_size=2, max_size=6))
    def check(docs):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id INT, body STRING"
        )
        got = {
            tuple(sorted((r["doc_a"], r["doc_b"]))): r["jaccard"]
            for r in jaccard_pairs(df, "doc_id", "body", n=3, threshold=0.3).collect()
        }
        want = {}
        sets = {i: sh(t) for i, t in enumerate(docs)}
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    continue
                j = inter / len(sets[a] | sets[b])
                if round(j, 6) >= 0.3:
                    want[(a, b)] = j
        assert set(got) == set(want)
        for p, j in want.items():
            assert abs(got[p] - j) < 1e-6, (p, got[p], j)

    check()


@HEAVY
def test_cosine_topk_matches_numpy_model(spark):
    """Property (hypothesis): the exact brute-force cosine top-k must
    reproduce a numpy model applying the operator's documented contract
    — cosine rounded HALF_UP to 4 decimals, rank by (sim desc, cand_id
    asc) — on random integer vectors (non-zero, so cosine is defined)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_googleplaystore_spark.operators.similarity import cosine_topk

    vec = st.lists(
        st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
    ).filter(lambda v: any(v))

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        corpus=st.lists(vec, min_size=1, max_size=8),
        queries=st.lists(vec, min_size=1, max_size=3),
    )
    def check(corpus, queries):
        cdf = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
            "vec_id INT, embedding ARRAY<DOUBLE>",
        )
        qdf = spark.createDataFrame(
            [(100 + i, [float(x) for x in v]) for i, v in enumerate(queries)],
            "vec_id INT, embedding ARRAY<DOUBLE>",
        )
        got = sorted(
            (r["query_id"], r["rn"], r["cand_id"], r["sim"])
            for r in cosine_topk(cdf, qdf, k=4).collect()
        )
        want = []
        for qi, q in enumerate(queries):
            qa = np.array(q, dtype=np.float64)
            sims = []
            for ci, c in enumerate(corpus):
                ca = np.array(c, dtype=np.float64)
                cos = float(qa @ ca) / (
                    float(np.linalg.norm(qa)) * float(np.linalg.norm(ca))
                )
                r4 = float(
                    Decimal(repr(cos)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
                )
                sims.append((ci, r4))
            sims.sort(key=lambda t: (-t[1], t[0]))
            for rn, (ci, s) in enumerate(sims[:4], start=1):
                want.append((100 + qi, rn, ci, s))
        assert got == sorted(want)

    check()


def test_from_json_failfast_raises_on_corrupt(spark):
    """The FAILFAST face of json_corrupt_record_permissive's contract:
    the same truncated payload that PERMISSIVE quarantines must abort
    the job under mode=FAILFAST (an exception is not oracle-expressible,
    so it is pinned here)."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame([('{"k',), ('{"k": 3}',)], "raw STRING")
    bad = df.select(
        F.from_json("raw", "k LONG", {"mode": "FAILFAST"}).alias("j")
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        bad.collect()
    # sanity: the well-formed row alone parses fine under FAILFAST
    ok = spark.createDataFrame([('{"k": 3}',)], "raw STRING").select(
        F.from_json("raw", "k LONG", {"mode": "FAILFAST"}).alias("j")
    )
    assert ok.collect()[0]["j"]["k"] == 3


def test_null_safe_join_plans_hash_join(spark, sf_dir):
    """null_safe_join_grouping's scale claim on the actual plan:
    EqualNullSafe is a legal equi-join key, so Spark must plan a HASH
    join (broadcast or shuffled), not a BroadcastNestedLoopJoin with
    the null-safe predicate as a residual — and the join must keep the
    NULL-keyed rows an ordinary equality join drops."""
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.catalog import QUERIES
    from bigdata_googleplaystore_spark.sources import load_table

    df = QUERIES["null_safe_join_grouping"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ).alias("k"),
    )
    n_docs, n_nulled = d.count(), d.filter(F.col("k").isNull()).count()
    assert n_nulled > 0
    # null-safe join keeps every document; plain equality loses the nulled
    dim = d.groupBy("k").agg(F.count("*").alias("grp_size"))
    assert df.count() == n_docs
    plain = d.join(dim.withColumnRenamed("k", "k2"), F.col("k") == F.col("k2"))
    assert plain.count() == n_docs - n_nulled
