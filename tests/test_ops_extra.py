"""Approximate aggregates: bounded error vs exact."""

from __future__ import annotations

from bigdata_googleplaystore_spark.catalog import QUERIES


def test_approx_distinct_error_bound(spark, sf_dir_mid):
    rows = QUERIES["agg_approx_distinct"].fn(spark, sf_dir_mid).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_orders"] - r["exact_orders"]) / r["exact_orders"]
        # rsd=0.023 -> ~2.3% standard deviation; 4 sigma margin
        assert rel_err < 0.1, (r["l_returnflag"], rel_err)
