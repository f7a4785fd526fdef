"""Layout (Z-order) and incremental-aggregation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import incremental, layout
from bigdata_googleplaystore_spark.sources import load_table


def _files_touched(spark, path, predicate):
    return (
        spark.read.parquet(path)
        .filter(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zorder_clusters_both_dimensions(spark, sf_dir_mid, tmp_path):
    sf_dir = sf_dir_mid  # ~15k orders: enough rows for stable per-file stats
    """Layout quality measured directly: after Z-ordering orders on
    (o_custkey, o_totalprice) into 32 files, a narrow band in EITHER
    dimension concentrates in a minority of files; a custkey-sorted
    layout spreads any totalprice band across every file. (File count
    via input_file_name over matching rows — this asserts the clustering
    property itself, independent of which pruning mechanism exploits
    it.)"""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 32
    zpath = str(tmp_path / "orders_z")
    lpath = str(tmp_path / "orders_lin")
    layout.zorder_write_parquet(o, ["o_custkey", "o_totalprice"], zpath, n_files)
    (
        o.repartitionByRange(n_files, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lo, hi = o.agg(
        F.expr("percentile(o_totalprice, 0.45)"),
        F.expr("percentile(o_totalprice, 0.55)"),
    ).first()
    price_band = (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    z_price = _files_touched(spark, zpath, price_band)
    lin_price = _files_touched(spark, lpath, price_band)
    assert lin_price == n_files  # custkey sort scatters a price band everywhere
    assert z_price <= n_files // 2, (z_price, lin_price)
    # and the z-layout still clusters the other dimension too (a 10% band
    # on a 2-d curve lands in a strict minority of files; single-dim sort
    # can't cluster both)
    cklo, ckhi = o.agg(
        F.expr("percentile(o_custkey, 0.45)"), F.expr("percentile(o_custkey, 0.55)")
    ).first()
    ck_band = (F.col("o_custkey") >= cklo) & (F.col("o_custkey") <= ckhi)
    z_ck = _files_touched(spark, zpath, ck_band)
    assert z_ck <= (2 * n_files) // 3, z_ck


def test_zorder_key_total_and_in_range(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    keyed = layout.zorder_key(o, ["o_custkey", "o_totalprice"], bits=8)
    assert keyed.count() == o.count()
    stats = keyed.agg(F.min("_zvalue"), F.max("_zvalue")).first()
    assert stats[0] >= 0
    assert stats[1] < 1 << 16  # 8 bits x 2 cols


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """merge(partial(A), partial(B), partial(C)) == partial(A ∪ B ∪ C),
    finalized — the correctness contract that lets a daily pipeline fold
    new partitions in without re-reading history."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)
    ]
    merged = incremental.finalize(
        incremental.merge_partials(
            *[incremental.partial_agg(p, ["l_returnflag"], "l_quantity") for p in parts]
        )
    )
    full = incremental.finalize(
        incremental.partial_agg(li, ["l_returnflag"], "l_quantity")
    )
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b


def test_incremental_merge_null_semantics(spark):
    """avg must ignore nulls (SQL) and be null for an all-null key; min/
    max null for all-null groups; counts split n vs n_nonnull."""
    df = spark.createDataFrame(
        [(0, "a", 1.0), (1, "a", None), (2, "b", None), (3, "b", None)],
        "id long, k string, v double",
    ).drop_duplicates()  # id makes rows distinct; subtract-style splits would
    half1 = df.filter(F.col("id") < 2).drop("id")  # collapse the dup nulls
    half2 = df.filter(F.col("id") >= 2).drop("id")
    out = {
        r["k"]: r
        for r in incremental.finalize(
            incremental.merge_partials(
                incremental.partial_agg(half1, ["k"], "v"),
                incremental.partial_agg(half2, ["k"], "v"),
            )
        ).collect()
    }
    assert out["a"]["n_rows"] == 2 and out["a"]["vavg"] == 1.0
    assert out["b"]["n_rows"] == 2 and out["b"]["vavg"] is None
    assert out["b"]["vmin"] is None and out["b"]["vmax"] is None


def test_global_row_numbers_total_order_and_parallel(spark, sf_dir):
    """Ordinals equal the single-window reference for any input
    partitioning and any target partition count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_googleplaystore_spark.operators.layout import global_row_numbers
    from bigdata_googleplaystore_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ref = {
        r["doc_id"]: r["rn"]
        for r in d.withColumn(
            "rn", F.row_number().over(Window.orderBy("source", "doc_id"))
        ).collect()
    }
    for src, nparts in ((d, 4), (d.repartition(13), 7)):
        got = {
            r["doc_id"]: r["rn"]
            for r in global_row_numbers(
                src, ["source", "doc_id"], num_partitions=nparts
            ).collect()
        }
        assert got == ref


def test_merge_upsert_replaces_and_inserts(spark):
    from bigdata_googleplaystore_spark.operators.incremental import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (9, "new", 1.0)], "k int, s string, v double"
    )
    got = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 9: ("new", 1.0)}
