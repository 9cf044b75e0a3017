#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY §5.2-2).

Usage: python3 tools/preflight.py [sfDir] [verifyOutDir]

Reads each `SparkEntry.queries` result parquet written by graft.Verify,
runs the matching oracle SQL in DuckDB over the same testdata parquet,
and compares values with columns sorted by name (mirroring the driver's
hash compare). Exact equality required; floats reported with max-abs-diff
when they mismatch so rounding-boundary issues are visible.

Driver-side python (duckdb/pandas/pyarrow) — NOT part of the Spark library.
"""
import sys, json, math, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    t = type(v).__name__
    if t in ("Decimal",):
        return float(v)
    if t in ("Timestamp", "datetime64", "datetime"):
        return pd.Timestamp(v).isoformat()
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            pass
    if isinstance(v, (list, tuple)) or t == "ndarray":
        return tuple(canon(x) for x in v)
    return v


def frame(df):
    df = df[sorted(df.columns)]
    return [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]


fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    pq = f"{OUT}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output dir")
        fails.append(name)
        continue
    sdf = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name)
        continue
    if sorted(sdf.columns) != sorted(ddf.columns):
        print(f"FAIL {name}: cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        fails.append(name)
        continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        fails.append(name)
        continue
    s, d = frame(sdf), frame(ddf)
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(s)} rows differ; first @row {i}:")
        print(f"  spark: {a}")
        print(f"  duck : {b}")
        fails.append(name)
    else:
        passes.append(name)

print(f"\n{len(passes)} PASS, {len(fails)} FAIL of {len(oracle)}")
if fails:
    print("failing:", " ".join(fails))
sys.exit(1 if fails else 0)
