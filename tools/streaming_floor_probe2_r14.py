"""Round-14 probe 2: where do the ~2s/streaming-query go?

Attaches a StreamingQueryListener to capture per-batch durationMs
(latestOffset, getBatch, queryPlanning, addBatch, walCommit, ...), and
wall-times start / processAllAvailable / stop separately, for the
trivial Python source and the CDF drain.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql.streaming import StreamingQueryListener

    from bigdata_googleplaystore_spark.session import get_spark

    spark = get_spark(app_name="streaming-floor-probe2")
    spark.sparkContext.setLogLevel("ERROR")

    progress = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            progress.append(json.loads(e.progress.json))

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    spark.streams.addListener(L())

    import bench

    table = bench._ensure_bench_manifest_table(spark, SF_DIR)
    from bigdata_googleplaystore_spark.sources import manifest_cdf_stream

    manifest_cdf_stream.register(spark)

    from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

    class TrivialReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"v": 0}

        def latestOffset(self):
            return {"v": 1}

        def partitions(self, start, end):
            return [InputPartition(0)]

        def read(self, p):
            yield (1,)

        def commit(self, end):
            pass

    class TrivialSource(DataSource):
        @classmethod
        def name(cls):
            return "trivial_probe_source"

        def schema(self):
            return "x int"

        def streamReader(self, schema):
            return TrivialReader()

    spark.dataSource.register(TrivialSource)

    def run(tag, build_reader):
        ckpt = tempfile.mkdtemp(prefix="probe2_ckpt_")
        progress.clear()
        t0 = time.perf_counter()
        q = build_reader().writeStream.format("noop").option(
            "checkpointLocation", ckpt
        ).start()
        t1 = time.perf_counter()
        q.processAllAvailable()
        t2 = time.perf_counter()
        q.stop()
        t3 = time.perf_counter()
        shutil.rmtree(ckpt, ignore_errors=True)
        time.sleep(0.5)  # let listener drain
        print(f"\n== {tag}: start={t1-t0:.3f}s  drain={t2-t1:.3f}s  stop={t3-t2:.3f}s  total={t3-t0:.3f}s")
        for p in progress:
            print(
                f"  batch {p['batchId']}: rows={p.get('numInputRows')} "
                f"durations={p.get('durationMs')}"
            )

    def cdf():
        return (
            spark.readStream.format("manifest_cdf_stream")
            .schema(
                "o_orderkey bigint, o_orderdate timestamp,"
                " o_orderpriority string, o_totalprice double,"
                " _change_type string"
            )
            .option("path", table)
            .option("startingVersion", "0")
            .load()
        )

    def triv():
        return spark.readStream.format("trivial_probe_source").load()

    run("trivial#0", triv)
    run("trivial#1", triv)
    run("trivial#2", triv)
    run("cdf#0", cdf)
    run("cdf#1", cdf)
    run("cdf#2", cdf)
    spark.stop()


if __name__ == "__main__":
    main()
