#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs DuckDB on oracle_sql.json over the sf tables and compares each result
against the Spark parquet dumps written by `graft.Verify`.

Usage: python3 tools/check.py [sfDir] [outDir]
         [--skip q1,q2] [--timeout SECS] [--json results.json]
--skip: oracle queries to mark "skipped" instead of running (the sf10
  DuckDB DNF set: recursive-CTE closure, uncapped in-bucket pair scans).
--timeout: per-oracle DuckDB cap; an interrupted oracle records
  "oracle_timeout" (engine capacity, not a correctness verdict).
--json: also write a CORRECTNESS-style per-query JSON report.
Exit codes: 0 all verified; 1 any FAIL; 2 no fails but some queries
unverified (skipped/timeout).
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, glob, os, sys, json, threading
import numpy as np
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0][2:]: (a.split("=", 1)[1] if "=" in a else True)
        for a in sys.argv[1:] if a.startswith("--")}
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out = args[1] if len(args) > 1 else "/root/repo/target/verify_out"
skip = set(str(opts.get("skip", "")).split(",")) - {""}
cap = float(opts["timeout"]) if "timeout" in opts else None
report = {}

def fresh_con():
    c = duckdb.connect()
    # --memlimit=NGB bounds the oracle engine and spills to disk instead
    # of riding the OS OOM killer (a twin whose hash tables exceed RAM
    # should page through temp, not kill the whole gate run)
    if "memlimit" in opts:
        c.execute(f"SET memory_limit='{opts['memlimit']}'")
        c.execute("SET temp_directory='/tmp/duckspill'")
        c.execute("SET max_temp_directory_size='50GB'")
    # --threads=N: DuckDB 1.0.0's radix-partitioned aggregates allocate
    # per thread, and the PQ-family struct-argmin twins amplify ~3 GB/
    # thread at sf1 — 32 threads OOMs a 125 GB box where 4 threads peak
    # under 60 GB. Throttle the oracle, not the twin.
    if "threads" in opts:
        c.execute(f"SET threads TO {int(opts['threads'])}")
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        c.execute(f"create view {name} as select * from '{p}'")
    return c

con = fresh_con()

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

def run_oracle(sql):
    """Run one oracle, optionally under the per-query cap."""
    global con
    if cap is None:
        return con.sql(sql).df()
    box, err = [], []
    c = con
    def work():
        try:
            box.append(c.sql(sql).df())
        except Exception as e:
            err.append(e)
    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(cap)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        if t.is_alive():
            # the worker is wedged past the grace join — abandon this
            # connection entirely (it is not thread-safe) and give the
            # remaining oracles a fresh one
            con = fresh_con()
        raise TimeoutError(f"oracle exceeded {cap}s")
    if err:
        raise err[0]
    return box[0]

n_pass = n_fail = n_skip = n_timeout = 0
for name in sorted(oracle):
    if name in skip:
        print(f"SKIP {name} (listed in --skip)")
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "err": "skipped_oracle_dnf"}
        n_skip += 1
        continue
    try:
        s = norm(pd.read_parquet(f"{out}/{name}"))
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "err": f"spark_unreadable: {e}"}
        n_fail += 1
        continue
    try:
        d = norm(run_oracle(oracle[name]))
    except TimeoutError as e:
        print(f"SKIP {name}: {e}")
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": len(s),
                        "err": "oracle_timeout"}
        n_timeout += 1
        continue
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "err": f"oracle_error: {e}"}
        n_fail += 1
        continue
    report[name] = {"rows_match": len(s) == len(d),
                    "schema_match": list(s.columns) == list(d.columns),
                    "hash_match": False, "spark_rows": len(s),
                    "oracle_rows": len(d), "err": None}
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
        report[name]["err"] = f"value_mismatch: {bad[0]}"
        n_fail += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")
        report[name]["hash_match"] = True
        n_pass += 1

if "json" in opts:
    with open(str(opts["json"]), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
# skipped/timed-out oracles are UNVERIFIED, not passed: name them in the
# summary and exit 2 (distinct from both clean=0 and fail=1) so a caller
# chaining on exit 0 can't mistake an unverified run for a green one
extra = ""
if n_skip or n_timeout:
    extra = f", {n_skip} skipped, {n_timeout} timeout (UNVERIFIED)"
print(f"\n{n_pass} pass, {n_fail} fail{extra}, {len(oracle)} total")
sys.exit(1 if n_fail else (2 if n_skip or n_timeout else 0))
