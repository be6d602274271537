"""Fresh-process driver simulation per /root/repo/.claude/skills/verify.

Loads /root/repo/__spark_entry__.py, builds a VANILLA SparkSession (no
semantics confs — the engine must self-pin at the read edge), smoke-runs
entry(spark), then runs the first N window queries at sf0.01 and compares
row count + order-insensitive SHA-256 of sorted repr rows (columns sorted
by name, NaN/None -> "NULL") against oracle_sql() through DuckDB.

Usage: python /tmp/driver_sim.py [n_queries=50]
"""
import hashlib
import importlib.util
import math
import sys
import time

import duckdb
import pandas as pd

# args: an integer = first N window queries (default 50); any
# non-integer args = explicit entry names (targeted re-verification of
# just-changed entries through the canonical compare)
N = 50
NAMES_ARG = []
for a in sys.argv[1:]:
    if a.isdigit():
        N = int(a)
    else:
        NAMES_ARG.append(a)
SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def norm(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    return repr(v)


def frame_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(tuple(norm(v) for v in r)
                  for r in pdf.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


# smoke: entry twice, schema stable, >0 rows
e1 = mod.entry(spark)
n1 = e1.count()
s1 = e1.schema
e2 = mod.entry(spark)
assert e2.schema == s1, "entry schema unstable"
assert n1 > 0, "entry returned 0 rows"
print(f"entry ok: {n1} rows, schema stable", flush=True)

qs = mod.queries()
oracles = mod.oracle_sql()
assert set(oracles) <= set(qs), "oracle keys not a subset of queries"

if NAMES_ARG:
    unknown = [n for n in NAMES_ARG if n not in qs]
    assert not unknown, f"unknown queries: {unknown}"
names = NAMES_ARG or list(qs)[:N]
fails = []
t0 = time.time()
for i, name in enumerate(names):
    try:
        spdf = qs[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"[{i+1}/{len(names)}] {name}: rows-only "
                  f"({len(spdf)} rows)", flush=True)
            continue
        opdf = con.execute(oracles[name]).fetchdf()
        ok_rows = len(spdf) == len(opdf)
        ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
        ok_hash = ok_rows and ok_cols and frame_hash(spdf) == frame_hash(opdf)
        status = "OK" if ok_hash else "FAIL"
        if not ok_hash:
            fails.append(name)
        print(f"[{i+1}/{len(names)}] {name}: {status} "
              f"(spark={len(spdf)} oracle={len(opdf)} cols={ok_cols})",
              flush=True)
    except Exception as ex:  # noqa: BLE001
        fails.append(name)
        print(f"[{i+1}/{len(names)}] {name}: ERROR {type(ex).__name__}: "
              f"{str(ex)[:300]}", flush=True)

print(f"\n{len(names) - len(fails)}/{len(names)} green "
      f"in {time.time() - t0:.1f}s; fails={fails}", flush=True)
spark.stop()
sys.exit(1 if fails else 0)
