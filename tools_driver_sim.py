"""Simulate the external driver's correctness gate: vanilla SparkSession
(no engine confs, non-UTC timezone), entry() smoke check, then every
registered query vs its DuckDB oracle at sf0.01 with the driver's
compare semantics (sorted columns, order-insensitive multiset, floats
rounded 9dp, timestamps naive-ISO).

Run before every commit: ``python tools_driver_sim.py`` — exits 1 on
any mismatch. Referenced by .claude/skills/verify/SKILL.md.
"""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ["TZ"] = "America/New_York"  # probe: driver may not run in UTC
import time
time.tzset()
from pyspark.sql import SparkSession
import duckdb

spark = (SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# smoke: entry()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[(f.name, f.dataType.simpleString()) for f in df.schema.fields]}")
assert len(rows) > 0
print("sample:", rows[0])

# correctness: queries vs oracle at sf0.01
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, oracles = E.queries(), E.oracle_sql()
import math
from datetime import datetime
def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    import decimal
    if isinstance(v, decimal.Decimal):
        f = float(v); return int(f) if f.is_integer() else round(f, 9)
    return v

fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    scols = sorted(sdf.columns)
    srows = sorted((tuple(norm(r[c]) for c in scols) for r in sdf.collect()), key=repr)
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows")
        continue
    res = con.execute(oracles[name])
    dcols_raw = [d[0] for d in res.description]
    dcols = sorted(dcols_raw)
    idx = {c: i for i, c in enumerate(dcols_raw)}
    drows = sorted((tuple(norm(r[idx[c]]) for c in dcols) for r in res.fetchall()), key=repr)
    ok = scols == dcols and srows == drows
    print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} spark rows / {len(drows)} duck rows)")
    if not ok:
        fails.append(name)
        if scols != dcols: print("  cols:", scols, "vs", dcols)
        else:
            for a, b in list(zip(srows, drows))[:200]:
                if a != b: print("  spark:", a, "\n  duck :", b); break
print("FAILS:", fails or "none")
spark.stop()
import sys as _sys
_sys.exit(1 if fails else 0)
