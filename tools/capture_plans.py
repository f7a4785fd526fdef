#!/usr/bin/env python
"""Dump .explain("formatted") for bench-tagged queries (and the EXTRA_BENCH
batch-expressible ones) to plans/$PLANS_ROUND (default r14)/<query>_<suffix>.txt.

Usage: python tools/capture_plans.py <suffix> [name ...]
With no names: every bench-tagged registry query. Static (pre-AQE) plans —
cheap, no job execution; the AQE-final posture lives in tools/plan_audit.py.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_googleplaystore_spark.catalog import QUERIES
from bigdata_googleplaystore_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r14"))

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2:]
if not names:
    names = [n for n, qd in QUERIES.items() if "bench" in qd.tags]

spark = get_spark(app_name="plan-capture")
os.makedirs(OUT, exist_ok=True)
for name in names:
    fn = QUERIES[name].fn
    df = fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"{OUT}/{name}_{suffix}.txt", "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")
spark.stop()
