#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY §5.2-2).

Usage: python3 tools/preflight.py [sfDir] [verifyOutDir]

DTYPE-STRICT (round-2 hardening, VERDICT.md "What's wrong" #5): the round-1
version loaded the Spark parquet through DuckDB's float-coercing `fetchdf`
and canonicalized Decimal->float, which erased exactly the representation
differences the driver hashes — it green-lit 22 queries the driver failed.

This version is driver-faithful:
  * Spark side: pandas.read_parquet (pyarrow) — preserves Decimal objects,
    int64, date32, exactly like the driver's load path.
  * Oracle side: duckdb .fetchdf() — coerces DECIMAL and HUGEINT to float64,
    DATE to datetime64, exactly like the driver.
  * Rows sorted with pandas sort_values on all columns (crashes on array
    columns — same as the driver's comparator; reported as ERR).
  * Cells compared as (type-tag, canonical-repr) pairs: Decimal vs float,
    int vs float, date vs timestamp all FAIL even when numerically equal.

Driver-side python (duckdb/pandas/pyarrow) — NOT part of the Spark library.
"""
import sys, json, os, datetime, decimal
import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # single-file driver fixture OR a resharded directory of parts
    # (tools/reshard.py layout: <table>.parquet/part-*.parquet)
    path = f"{SF}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(
        f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def tag(v):
    """(type-tag, canonical repr) — strict: no cross-type coercion."""
    if v is None:
        return None
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        # NaN is tagged, NOT conflated with NULL — a NaN-vs-NULL split
        # between engines must fail here like it would at the driver
        return ("f", "nan") if f != f else ("f", repr(f))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return ("ts", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("ARR", tuple(tag(x) for x in v))
    if v is pd.NaT:
        return None
    return (type(v).__name__, str(v))


def prep(df):
    """Driver-style: columns sorted by name, rows sorted on all columns."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells(df):
    return [tuple(tag(v) for v in row) for row in df.itertuples(index=False)]


fails, passes, errs = [], [], []
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    sql = oracle[name]
    pq = f"{OUT}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output dir")
        fails.append(name)
        continue
    sdf = pd.read_parquet(pq)  # pyarrow: dtype-faithful, like the driver
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERR  {name}: oracle error: {e}")
        errs.append(name)
        continue
    if sorted(sdf.columns) != sorted(ddf.columns):
        print(f"FAIL {name}: cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        fails.append(name)
        continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        fails.append(name)
        continue
    try:
        sdf, ddf = prep(sdf), prep(ddf)
    except Exception as e:
        print(f"ERR  {name}: comparator crash (driver would too): {type(e).__name__}: {e}")
        errs.append(name)
        continue
    # dtype kinds must agree (f vs O vs i vs M); widths warn only
    kind_bad = [(c, str(sdf[c].dtype), str(ddf[c].dtype)) for c in sdf.columns
                if sdf[c].dtype.kind != ddf[c].dtype.kind]
    s, d = cells(sdf), cells(ddf)
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    if bad or kind_bad:
        nb = len(bad)
        print(f"FAIL {name}: {nb}/{len(s)} rows differ; dtype-kind mismatches: {kind_bad}")
        for i, a, b in bad[:3]:
            print(f"  @row {i}\n   spark: {a}\n   duck : {b}")
        fails.append(name)
    else:
        wid = [(c, str(sdf[c].dtype), str(ddf[c].dtype)) for c in sdf.columns
               if str(sdf[c].dtype) != str(ddf[c].dtype)]
        if wid:
            print(f"pass {name} (width-only dtype diffs: {wid})")
        passes.append(name)

print(f"\n{len(passes)} PASS, {len(fails)} FAIL, {len(errs)} ERR "
      f"of {len(oracle) if not ONLY else len(ONLY)}")
if fails:
    print("failing:", " ".join(fails))
if errs:
    print("erroring:", " ".join(errs))
sys.exit(1 if (fails or errs) else 0)
