#!/usr/bin/env python
"""Stage decomposition of the two streaming bench rows (r13 opt round):

  scd2_dimension_maintenance = stream replay (manifest_cdf_stream with
    keyColumns -> parquet sink) + batch window/interval pass
  cdf_feed_drain = stream replay (no pairing) -> noop sink

Times each piece separately (min over N runs, fresh checkpoint/sink each
run, same discipline as bench.py) so the optimization targets the part
that actually costs. Run on an idle host.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import bench
from bigdata_googleplaystore_spark.session import get_spark
from bigdata_googleplaystore_spark.sources import manifest_cdf_stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("N_RUNS", "3"))

spark = get_spark(app_name="scd2-decomp")
table = bench._ensure_bench_scd2_table(spark, SF_DIR)
cdf_table = bench._ensure_bench_manifest_table(spark, SF_DIR)
manifest_cdf_stream.register(spark)


def timed(label, fn):
    best = float("inf")
    for _ in range(N):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s (min of {N})")
    return best


# --- piece 1: the scd2 stream replay alone (parquet sink, fresh ckpt) ----
def replay_only(sink_keep=[None]):
    ckpt = tempfile.mkdtemp(prefix="d_ckpt_")
    sink = tempfile.mkdtemp(prefix="d_sink_")
    q = (
        spark.readStream.format("manifest_cdf_stream")
        .schema("k bigint, v double, _change_type string, _commit_version long")
        .option("path", table)
        .option("startingVersion", "0")
        .option("keyColumns", "k")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    if sink_keep[0]:
        shutil.rmtree(sink, ignore_errors=True)
    else:
        sink_keep[0] = sink
    return sink_keep[0]


keep = [None]
timed("scd2 replay->parquet sink", lambda: replay_only(keep))
sink = keep[0]

# --- piece 1b: replay with NOOP sink (isolates parquet-sink cost) -------
def replay_noop():
    ckpt = tempfile.mkdtemp(prefix="d_ckptn_")
    q = (
        spark.readStream.format("manifest_cdf_stream")
        .schema("k bigint, v double, _change_type string, _commit_version long")
        .option("path", table)
        .option("startingVersion", "0")
        .option("keyColumns", "k")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)


timed("scd2 replay->noop sink", replay_noop)

# --- piece 1c: empty-stream fixed cost (start/stop, zero versions) ------
def stream_fixed():
    ckpt = tempfile.mkdtemp(prefix="d_ckptf_")
    q = (
        spark.readStream.format("manifest_cdf_stream")
        .schema("k bigint, v double, _change_type string, _commit_version long")
        .option("path", table)
        .option("startingVersion", "9")  # past latest: zero partitions
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)


timed("stream fixed cost (0-version drain)", stream_fixed)


# --- piece 2: the batch window/interval pass over the drained log --------
def window_pass():
    log = spark.read.parquet(sink).withColumn(
        "is_open", F.col("_change_type").isin("insert", "update_postimage")
    )
    w = Window.partitionBy("k").orderBy(
        F.col("_commit_version"), F.col("is_open").cast("int")
    )
    scd2 = (
        log.withColumn("next_version", F.lead("_commit_version").over(w))
        .withColumn("next_is_open", F.lead("is_open").over(w))
        .filter(F.col("is_open"))
        .select(
            "k",
            "v",
            F.col("_commit_version").alias("valid_from"),
            F.when(~F.col("next_is_open"), F.col("next_version")).alias("valid_to"),
        )
    )
    out = scd2.groupBy(
        "valid_from", F.col("valid_to").isNull().alias("is_current")
    ).agg(F.count("*").alias("n_rows"), F.sum("v").alias("total_value"))
    out.write.format("noop").mode("overwrite").save()


timed("scd2 window/interval pass", window_pass)
shutil.rmtree(sink, ignore_errors=True)


# --- cdf_feed_drain replay (no pairing, noop sink) -----------------------
def cdf_replay():
    ckpt = tempfile.mkdtemp(prefix="d_ckptc_")
    q = (
        spark.readStream.format("manifest_cdf_stream")
        .schema(
            "o_orderkey bigint, o_orderdate timestamp,"
            " o_orderpriority string, o_totalprice double,"
            " _change_type string"
        )
        .option("path", cdf_table)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)


timed("cdf_feed_drain replay->noop", cdf_replay)

# --- partition census (driver-side planning output) ----------------------
from bigdata_googleplaystore_spark.sources.manifest_cdf_stream import (
    ManifestCDFStreamReader,
)
from pyspark.sql.types import StructType

sch = StructType.fromDDL(
    "k bigint, v double, _change_type string, _commit_version long"
)
r = ManifestCDFStreamReader(sch, {"path": table, "startingversion": "0", "keycolumns": "k"})
t0 = time.perf_counter()
parts = r.partitions({"version": -1}, {"version": 9})
dt = time.perf_counter() - t0
from collections import Counter

kinds = Counter(p.kind for p in parts)
print(f"scd2 partitions: {len(parts)} {dict(kinds)} (planning {dt:.3f}s)")

sch2 = StructType.fromDDL(
    "o_orderkey bigint, o_orderdate timestamp, o_orderpriority string,"
    " o_totalprice double, _change_type string"
)
r2 = ManifestCDFStreamReader(sch2, {"path": cdf_table, "startingversion": "0"})
t0 = time.perf_counter()
parts2 = r2.partitions({"version": -1}, {"version": 9})
dt = time.perf_counter() - t0
kinds2 = Counter(p.kind for p in parts2)
print(f"cdf partitions: {len(parts2)} {dict(kinds2)} (planning {dt:.3f}s)")

spark.stop()
