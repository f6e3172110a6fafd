"""Local twin of the round driver's CORRECTNESS run.

Creates a deliberately VANILLA SparkSession (no engine factory — the real
driver won't use ours either, so runtime self-tuning must work), runs
``entry()`` as a smoke check, then every ``queries()`` entry against its
``oracle_sql()`` twin via DuckDB with order-insensitive value hashing
(columns sorted by name, doubles rounded to 9dp, timestamps floored to µs).

Usage:
    python tools/driver_sim.py [sf_dir] [only_query1,only_query2,...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e  # noqa: E402
from tools.codegen_gate import StderrCodegenGate  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# r11 gate: any silent whole-stage-codegen fallback (ERROR CodeGenerator /
# 64 KB janino overflow) fails the sim even when every hash MATCHes — the
# r10 judge caught exactly that class slipping through a green run.
_gate = StderrCodegenGate()
_gate.__enter__()

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

print("== entry() smoke ==")
df = e.entry(spark)
n = df.count()
print(f"entry rows={n} schema={[f'{f.name}:{f.dataType.simpleString()}' for f in df.schema.fields]}")
assert n > 0

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon_hash(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("NULL")
            elif isinstance(v, float):
                out.append(f"{round(v, 9):.9f}")
            elif isinstance(v, pd.Timestamp):
                out.append(v.floor("us").isoformat())
            else:
                out.append(str(v))
        rows.append("|".join(out))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16], len(rows)


qs, os_ = e.queries(), e.oracle_sql()
# SIM_EXTRA=1: also check the pytest-oracled extra_queries() (the driver
# itself never runs these; this is the sf0.01 double-check).
if os.environ.get("SIM_EXTRA") == "1":
    qs = {**qs, **e.extra_queries()}
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    sdf = fn(spark, SF).toPandas()
    if name not in os_:
        print(f"{name:24s} rows-only rows={len(sdf)}")
        continue
    ddf = con.sql(os_[name]).df()
    hs, ns = canon_hash(sdf)
    hd, nd = canon_hash(ddf)
    ok = hs == hd and sorted(sdf.columns) == sorted(ddf.columns)
    print(f"{name:24s} spark_rows={ns:5d} duck_rows={nd:5d} hash={'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        fails.append(name)

spark.stop()
_gate.__exit__()
gate_failed = _gate.report(out=sys.stdout)

print("RESULT:", "ALL MATCH" if not (fails or gate_failed)
      else f"FAILURES: {fails + (['codegen-gate'] if gate_failed else [])}")
sys.exit(1 if (fails or gate_failed) else 0)
