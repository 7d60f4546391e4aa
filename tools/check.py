#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs DuckDB on oracle_sql.json over the sf tables and compares each result
against the Spark parquet dumps written by `graft.Verify`.

Usage: python3 tools/check.py [sfDir] [outDir]
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, glob, os, sys, json
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(df):
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif k == "O":
            # DATE columns: spark parquet → datetime.date objects, duckdb
            # → datetime64; normalize both to datetime64[us].
            nonnull = df[c].dropna()
            if len(nonnull) and all(isinstance(v, __import__("datetime").date) for v in nonnull.head(5)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name in sorted(oracle):
    try:
        s = norm(pd.read_parquet(f"{out}/{name}"))
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        n_fail += 1
        continue
    try:
        d = norm(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        n_fail += 1
        continue
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        n_fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        n_fail += 1
        continue
    bad = []
    for c in s.columns:
        a, b = s[c].values, d[c].values
        if s[c].dtype.kind == "f":
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            eq = a == b
        if not eq.all():
            i = int(np.argmin(eq))
            detail = f"{c}[{i}]: spark={a[i]!r} duck={b[i]!r}"
            if s[c].dtype.kind == "f" and np.isclose(a[i], b[i], rtol=1e-9, equal_nan=True):
                detail += " (close — float drift)"
            bad.append(detail)
    if bad:
        print(f"FAIL {name}: {len(bad)} col(s) differ; first: {bad[0]}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total")
sys.exit(1 if n_fail else 0)
