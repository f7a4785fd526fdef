"""Round-14 probe: decompose the Python-streaming-source per-query cost.

r13 measured a 1.54 s/query platform floor (fresh Python planner
processes per stream start). This probe answers, on the current Spark
4.1.2 install:

  1. What processes actually spawn per streaming query (watched via
     /proc), and do the driver-side PythonPlannerRunner workers get
     REUSED across queries (PythonWorkerFactory keeps an idle pool and
     PythonPlannerRunner.runInPython releases on success when
     spark.python.worker.reuse=true)?
  2. Per-query wall for N consecutive drains of the SAME pre-built CDF
     table (fresh checkpoint each) — does query 2+ get cheaper than
     query 1 (pool warm)?
  3. The same with a TRIVIAL single-row Python stream source — the
     pure platform floor.

Usage: python tools/streaming_floor_probe_r14.py [n_drains]
"""
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4


class ProcWatch(threading.Thread):
    """Sample /proc every 20 ms; record each new python pid's cmdline."""

    def __init__(self):
        super().__init__(daemon=True)
        self.seen: dict[int, str] = {}
        self.events: list[tuple[float, int, str]] = []
        self.stop_flag = False

    def run(self):
        while not self.stop_flag:
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                ipid = int(pid)
                if ipid in self.seen:
                    continue
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
                except OSError:
                    continue
                self.seen[ipid] = cmd
                if "python" in cmd:
                    self.events.append((time.perf_counter(), ipid, cmd[:160]))
            time.sleep(0.02)


def main():
    from pyspark.sql import SparkSession

    from bigdata_googleplaystore_spark.session import get_spark

    spark = get_spark(app_name="streaming-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    table = bench._ensure_bench_manifest_table(spark, SF_DIR)
    from bigdata_googleplaystore_spark.sources import manifest_cdf_stream

    manifest_cdf_stream.register(spark)

    watch = ProcWatch()
    watch.run_once = None
    watch.start()
    time.sleep(0.1)
    marks = []

    def drain_once(tag):
        ckpt = tempfile.mkdtemp(prefix="probe_cdf_ckpt_")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("manifest_cdf_stream")
            .schema(
                "o_orderkey bigint, o_orderdate timestamp,"
                " o_orderpriority string, o_totalprice double,"
                " _change_type string"
            )
            .option("path", table)
            .option("startingVersion", "0")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        dt = time.perf_counter() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        marks.append((tag, t0, time.perf_counter(), dt))
        print(f"  {tag}: {dt:.3f}s", flush=True)
        return dt

    print(f"== CDF drain x{N} (same session) ==")
    times = [drain_once(f"cdf#{i}") for i in range(N)]

    # Trivial Python stream source: one fixed batch, same machinery.
    print("== trivial python stream source x%d ==" % N)
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

    def trivial_once(tag):
        ckpt = tempfile.mkdtemp(prefix="probe_triv_ckpt_")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("trivial_probe_source")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        dt = time.perf_counter() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        marks.append((tag, t0, time.perf_counter(), dt))
        print(f"  {tag}: {dt:.3f}s", flush=True)
        return dt

    triv = [trivial_once(f"triv#{i}") for i in range(N)]

    time.sleep(0.3)
    watch.stop_flag = True
    watch.join(timeout=1)

    print("\n== python process spawns per window ==")
    for tag, t0, t1, dt in marks:
        spawns = [(t - t0, cmd) for (t, pid, cmd) in watch.events if t0 <= t <= t1]
        print(f"{tag} ({dt:.3f}s): {len(spawns)} spawns")
        for off, cmd in spawns:
            print(f"   +{off:5.2f}s  {cmd}")

    print("\nsummary: cdf", [round(t, 3) for t in times], "trivial", [round(t, 3) for t in triv])
    spark.stop()


if __name__ == "__main__":
    main()
