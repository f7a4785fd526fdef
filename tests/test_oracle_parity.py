"""Local replica of the driver's correctness gate.

For every registered query with an oracle, run the PySpark query and the
DuckDB SQL on the same sf dir and compare row count, column names/types and
the order-insensitive multiset of values EXACTLY (no tolerance) — the driver
compares value-hashes, so any numeric daylight between the two engines is a
failure there too. Catch it here first.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from bigdata_googleplaystore_spark.catalog import QUERIES


def normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # collapse -0.0/+0.0
            return 0.0
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def normalize_rows(cols, rows):
    """Sort columns by name (driver contract), then rows lexicographically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


ORACLE_QUERIES = [name for name, qd in QUERIES.items() if qd.oracle]
ROWS_ONLY_QUERIES = [name for name, qd in QUERIES.items() if not qd.oracle]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qd = QUERIES[name]
    sdf = qd.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(qd.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    ncols_s, nrows_s = normalize_rows(scols, srows)
    ncols_d, nrows_d = normalize_rows(dcols, drows)
    assert len(nrows_s) == len(nrows_d), (
        f"{name}: row count spark={len(nrows_s)} duckdb={len(nrows_d)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(nrows_s, nrows_d)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    qd = QUERIES[name]
    sdf = qd.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
