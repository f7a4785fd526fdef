"""Simulate the driver: import __spark_entry__ from the repo, smoke entry(),
then run every queries()[name] vs oracle_sql()[name] at sf0.01 via DuckDB,
comparing row count + column names + order-insensitive values."""
import sys, math, datetime as dt
sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod
from pyspark.sql import SparkSession
import duckdb

spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

import os
SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else (0.0 if v == 0.0 else v)
    if isinstance(v, dt.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date): return v.isoformat()
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

qs, oracles = mod.queries(), mod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} with oracles")
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF)
    scols = sorted(sdf.columns)
    srows = sorted([tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=repr)
    if name not in oracles:
        print(f"  {name}: rows-only, {len(srows)} rows OK"); continue
    res = con.execute(oracles[name])
    dcols = sorted(d[0] for d in res.description)
    drows = sorted([tuple(norm(r[dcols.index(c)] if False else r[i]) for i, c in enumerate(dcols)) for r in
                    [tuple(row[j] for j in sorted(range(len(res.description)), key=lambda k: res.description[k][0])) for row in res.fetchall()]], key=repr)
    ok = scols == dcols and len(srows) == len(drows) and srows == drows
    print(f"  {name}: spark={len(srows)} duck={len(drows)} cols_match={scols==dcols} values_match={srows==drows}")
    if not ok:
        fails += 1
        for a, b in zip(srows, drows):
            if a != b: print("    first diff:", a, "vs", b); break
print("RESULT:", "FAIL" if fails else "PASS", f"({fails} mismatches)")
spark.stop()
