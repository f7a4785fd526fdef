"""Measure driver-side construction+analysis cost of each bench query's
fn() — the py4j/plan-building time the bench's timed region pays before
any job runs (guide §7.3: driver-side 'nothing is running' time is real).

fn(spark, SF_DIR) is called (no action), then df.schema is touched to
force analysis. min-of-3 per query, queries interleaved.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from bigdata_googleplaystore_spark.catalog import QUERIES  # noqa: E402
from bigdata_googleplaystore_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="construction-probe")
spark.sparkContext.setLogLevel("ERROR")

names = [n for n, qd in QUERIES.items() if "bench" in qd.tags]
best = {n: float("inf") for n in names}
# warmup one pass (analysis rule warm, file listing cached)
for n in names:
    df = QUERIES[n].fn(spark, SF_DIR)
    _ = df.schema
spark.catalog.clearCache()
for _ in range(3):
    for n in names:
        t0 = time.perf_counter()
        df = QUERIES[n].fn(spark, SF_DIR)
        _ = df.schema
        best[n] = min(best[n], time.perf_counter() - t0)
        spark.catalog.clearCache()
for n, v in sorted(best.items(), key=lambda x: -x[1]):
    print(f"{v:7.3f}  {n}")
print(f"total_construction: {sum(best.values()):.3f}")
spark.stop()
