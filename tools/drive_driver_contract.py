"""Emulate the driver: vanilla SparkSession, import __spark_entry__,
smoke entry(), run every queries()[name] vs oracle_sql()[name] at sf0.01."""
import sys, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

_b = (SparkSession.builder.appName("driver-emulation")
      .master(os.environ.get("CONTRACT_MASTER", "local[8]")))
# NO custom configs — vanilla, like the driver. CONTRACT_MASTER /
# CONTRACT_SHUFFLE exist only for the robustness sweeps
# (local[3]/7-partitions partition-invariance runs).
if os.environ.get("CONTRACT_SHUFFLE"):
    _b = _b.config("spark.sql.shuffle.partitions", os.environ["CONTRACT_SHUFFLE"])
spark = _b.getOrCreate()
import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for name in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{name}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

def canon(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    out = []
    for tup in pdf.itertuples(index=False, name=None):
        r = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v): r.append("NULL")
            elif isinstance(v, float): r.append(repr(v))
            elif hasattr(v, "isoformat"): r.append(v.isoformat())
            else: r.append(str(v))
        out.append(tuple(r))
    out.sort()
    return cols, out

qs, osql = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:  # optional subset: names on argv
    want = set(sys.argv[1:])
    qs = {k: v for k, v in qs.items() if k in want}
fails = []
for name, fn in sorted(qs.items()):
    try:
        spdf = fn(spark, sf).toPandas()
        if name not in osql:
            print(f"  {name}: rows-only ({len(spdf)} rows) OK")
            continue
        dpdf = con.execute(osql[name]).fetchdf()
        sc, sr = canon(spdf); dc, dr = canon(dpdf)
        ok = sc == dc and sr == dr
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(sr)} rows)")
        if not ok:
            fails.append(name)
            if sc != dc: print(f"    cols: {sc} vs {dc}")
            else:
                d = [(a,b) for a,b in zip(sr,dr) if a!=b][:2]
                print(f"    first diffs: {d}")
    except Exception as ex:
        fails.append(name); print(f"  {name}: ERROR {ex}")
print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
