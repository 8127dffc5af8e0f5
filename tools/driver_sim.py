"""Driver simulation: bare SparkSession + __spark_entry__ contract vs DuckDB.

Mirrors the external correctness sweep — entry() smoke check, then every
queries() entry vs its oracle_sql() on the fixture tables (column-name
set, row count, order-insensitive 6dp-stringified values). Run from
anywhere: ``python tools/driver_sim.py [sf_dir]``
(default /root/testdata/sf0.01; run sf0.1 too after touching operators).
Extra args after sf_dir restrict the sweep to those query names —
``python tools/driver_sim.py /root/testdata/sf0.01 q5 dedup_simhash``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

duck = duckdb.connect()
for t in TABLES:
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
    )


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# 1. entry()
edf = E.entry(spark)
erows = edf.collect()
print(f"entry: {len(erows)} rows, schema={[f.name for f in edf.schema.fields]}")
assert len(erows) > 0

# 2. queries vs oracle
qs = E.queries()
oracles = E.oracle_sql()
if ONLY:
    unknown = ONLY - set(qs)
    assert not unknown, f"unknown query names: {sorted(unknown)}"
    qs = {n: f for n, f in qs.items() if n in ONLY}
fails, rows_only = [], []
t_all = time.time()
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as exc:
        fails.append((name, f"SPARK-ERR {type(exc).__name__}: {exc}"[:200]))
        print(f"  {name}: SPARK ERROR {exc}")
        continue
    if name not in oracles:
        rows_only.append((name, len(srows)))
        print(f"  {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
        continue
    try:
        res = duck.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as exc:
        fails.append((name, f"ORACLE-ERR {type(exc).__name__}: {exc}"[:200]))
        print(f"  {name}: ORACLE ERROR {exc}")
        continue
    ok = True
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"cols spark={sorted(scols)} duck={sorted(dcols)}"))
        ok = False
    elif len(srows) != len(drows):
        fails.append((name, f"rowcount spark={len(srows)} duck={len(drows)}"))
        ok = False
    elif canon(scols, srows) != canon(dcols, drows):
        a, b = canon(scols, srows), canon(dcols, drows)
        d1 = [r for r in a if r not in set(b)][:2]
        d2 = [r for r in b if r not in set(a)][:2]
        fails.append((name, f"values spark-only={d1} duck-only={d2}"))
        ok = False
    print(f"  {name}: {'OK' if ok else 'FAIL'} ({len(srows)} rows) [{time.time()-t0:.1f}s]")

print(f"\n=== {len(qs)} queries, {len(fails)} failures, "
      f"{len(rows_only)} rows-only, {time.time()-t_all:.0f}s total ===")
for name, why in fails:
    print(f"FAIL {name}: {why}")
spark.stop()
sys.exit(1 if fails else 0)
