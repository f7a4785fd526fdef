"""As-of join edge cases on a handcrafted frame (the catalog query covers
the bulk semantics against DuckDB's native ASOF JOIN)."""

from __future__ import annotations

import datetime as dt

import pytest

from bigdata_googleplaystore_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),  # after r2 -> v=20
            (2, "k1", _ts("2024-01-01T09:00:00")),  # equal to r1 ts -> inclusive
            (3, "k1", _ts("2024-01-01T08:00:00")),  # before all -> null
            (4, "k2", _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T09:00:00"), 10),
            ("k1", _ts("2024-01-01T09:30:00"), 20),
        ],
        "k string, ts timestamp, v long",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, key="k", ts="ts", right_value_cols=["v"], tiebreak="event_id"
        ).collect()
    }
    assert out == {1: 20, 2: 10, 3: None, 4: None}


def test_asof_rejects_column_collision(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, key="k", ts="ts", right_value_cols=["ts"])


def test_asof_null_right_value_not_resurrected(spark):
    """A legitimately-null right value must come through as null, not be
    back-filled from an older right row (per-column fill would bleed;
    the struct fill must not)."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T11:00:00"))], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01T09:00:00"), 1, 2),
         ("k", _ts("2024-01-01T10:00:00"), 7, None)],
        "k string, ts timestamp, a long, b long",
    )
    [row] = asof_join(
        left, right, key="k", ts="ts", right_value_cols=["a", "b"]
    ).collect()
    assert row["a"] == 7 and row["b"] is None


def test_asof_matches_bruteforce_on_random_frames(spark):
    """Property: on random (key, ts) data with duplicate timestamps and
    sparse keys, asof_join equals the brute-force definition (max right
    ts <= left ts per key, deterministic max-struct winner on ties)."""
    import random

    rng = random.Random(23)
    keys = ["a", "b", "c", "d"]
    left_rows = [
        (i, rng.choice(keys), _ts(f"2024-01-01T{rng.randrange(24):02d}:00:00"))
        for i in range(60)
    ]
    right_rows = [
        (rng.choice(keys + ["zz"]),
         _ts(f"2024-01-01T{rng.randrange(24):02d}:00:00"),
         rng.randrange(5), 100 + j)
        for j in range(40)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v long, rid long")

    got = {
        r["event_id"]: (r["v"], r["rid"])
        for r in asof_join(
            left, right, key="k", ts="ts", right_value_cols=["v", "rid"]
        ).collect()
    }

    for eid, k, lts in left_rows:
        cands = [rr for rr in right_rows if rr[0] == k and rr[1] <= lts]
        if not cands:
            assert got[eid] == (None, None), (eid, got[eid])
            continue
        best_ts = max(rr[1] for rr in cands)
        # winner among equal-ts rows: the max (v, rid) struct
        winner = max((rr[2], rr[3]) for rr in cands if rr[1] == best_ts)
        assert got[eid] == winner, (eid, got[eid], winner)
