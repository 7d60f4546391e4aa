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
--threads=N / --memlimit=NGB: global DuckDB budget (see fresh_con).
--qthreads=name=N,name=N / --qmem=name=NGB,...: PER-ORACLE budget
  overrides — the named oracle runs on a dedicated connection with its
  own thread/memory budget (the e18 sf10 recipe: DuckDB 1.0.0's
  radix-partitioned aggs allocate untracked ~3 GB/thread on the
  PQ-family struct-argmin twins, so those twins need --qthreads=...=2
  while the rest of the battery keeps 32).
--qsplit=name:col=v1|v2|...: run the named oracle ONCE PER VALUE with
  a pushed equality filter (SELECT * FROM (<sql>) WHERE col = 'v'),
  concatenating the results — for a report oracle whose final SELECT
  is a UNION ALL of independent branches (e18), DuckDB prunes the
  other branches at plan time, so peak memory is the LARGEST single
  branch instead of the sum (the sf10 capacity recipe; shared
  MATERIALIZED CTEs recompute per branch — slower, but it fits).
  Two guards keep the split from weakening the gate: the enumerated
  values must COVER the dump's distinct split-column values (else
  FAIL — unenumerated oracle rows would silently vanish), and the
  --timeout cap is a single budget ACROSS parts, not per part.
  Split parts run with `AS MATERIALIZED` stripped (result-neutral
  hint; DuckDB 1.0 disables union-branch pruning when any
  materialized CTE is present, defeating the split) — disclosed on
  the report row as qsplit.dematerialized.
Exit codes: 0 all verified; 1 any FAIL; 2 no fails but some queries
unverified (skipped/timeout).
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, glob, os, re, sys, json, threading
import numpy as np
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0][2:]: (a.split("=", 1)[1] if "=" in a else True)
        for a in sys.argv[1:] if a.startswith("--")}
# every option carries a value: a bare `--threads` would parse to True
# and int(True) would silently throttle DuckDB to ONE thread — reject
# it (and any typo'd option) up front instead of corrupting the run
VALUE_OPTS = ("skip", "timeout", "json", "memlimit", "threads",
              "qthreads", "qmem", "qsplit")
for k, v in opts.items():
    if k not in VALUE_OPTS:
        sys.exit(f"check.py: unknown option --{k}")
    if v is True:
        sys.exit(f"check.py: --{k} requires a value (--{k}=...)")
if "memlimit" in opts and not re.fullmatch(
        r"\d+(\.\d+)?[KMGT]i?B", str(opts["memlimit"])):
    sys.exit("check.py: --memlimit must look like 48GB / 512MiB")
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out = args[1] if len(args) > 1 else "/root/repo/target/verify_out"
skip = set(str(opts.get("skip", "")).split(",")) - {""}
cap = float(opts["timeout"]) if "timeout" in opts else None

def parse_per_query(opt):
    """--qthreads=e18=2,e20=4 -> {'e18': '2', 'e20': '4'}"""
    d = {}
    for kv in str(opts.get(opt, "")).split(","):
        if not kv:
            continue
        if "=" not in kv:
            sys.exit(f"check.py: --{opt} entries must be name=value")
        q, val = kv.split("=", 1)
        d[q] = val
    return d

qthreads = parse_per_query("qthreads")
qmem = parse_per_query("qmem")

def parse_qsplit():
    """--qsplit=e18:method=ivf|lsh -> {'e18': ('method', ['ivf','lsh'])}"""
    d = {}
    for spec in str(opts.get("qsplit", "")).split(","):
        if not spec:
            continue
        m = re.fullmatch(r"([^:]+):(\w+)=([\w|]+)", spec)
        if not m:
            sys.exit("check.py: --qsplit entries must be name:col=v1|v2|...")
        d[m.group(1)] = (m.group(2), m.group(3).split("|"))
    return d

qsplit = parse_qsplit()
report = {}

def flush_report():
    """Write the --json report after EVERY query (temp+rename, so the
    file is always whole). A long oracle batch can die mid-run on the
    OS OOM killer (the sf10 PQ twins' untracked allocations); an
    end-of-run-only dump loses every completed verdict with it."""
    if "json" in opts:
        tmp = str(opts["json"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        os.replace(tmp, str(opts["json"]))

def table_src(p):
    """A fixture table is one parquet file OR a directory of them (the
    r15 multi-file layout for >64 MB tables — see replicate.py)."""
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"

def fresh_con(threads=None, memlimit=None):
    c = duckdb.connect()
    # row order never matters here (norm() sorts both sides before the
    # compare), and preserving insertion order makes DuckDB buffer whole
    # materializations — measurably more RSS on the PQ-family twins
    c.execute("SET preserve_insertion_order=false")
    # --memlimit=NGB bounds the oracle engine and spills to disk instead
    # of riding the OS OOM killer (a twin whose hash tables exceed RAM
    # should page through temp, not kill the whole gate run)
    ml = memlimit if memlimit is not None else opts.get("memlimit")
    if ml is not None:
        c.execute(f"SET memory_limit='{ml}'")
        c.execute("SET temp_directory='/tmp/duckspill'")
        c.execute("SET max_temp_directory_size='50GB'")
    # --threads=N: DuckDB 1.0.0's radix-partitioned aggregates allocate
    # per thread, and the PQ-family struct-argmin twins amplify ~3 GB/
    # thread at sf1 — 32 threads OOMs a 125 GB box where 4 threads peak
    # under 60 GB. Throttle the oracle, not the twin.
    th = threads if threads is not None else opts.get("threads")
    if th is not None:
        c.execute(f"SET threads TO {int(th)}")
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        c.execute(f"create view {name} as select * from {table_src(p)}")
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

def run_oracle(sql, name=None):
    """Run one oracle, optionally under the per-query cap. An oracle
    named in --qthreads/--qmem runs on a DEDICATED connection with its
    own budget (closed afterwards); one named in --qsplit runs once per
    split value with a pushed filter, results concatenated. The
    documented per-oracle cap holds ACROSS the split: each part gets
    the time remaining of the single budget, not a fresh cap (a k-way
    split must not quietly become k*cap)."""
    if name is not None and name in qsplit:
        import time
        col_, vals = qsplit[name]
        # Strip the MATERIALIZED hint under --qsplit: it is result-neutral
        # (a pure optimizer hint), but DuckDB 1.0 disables union-branch
        # pruning whenever ANY materialized CTE is present — with it, each
        # "split" part still plans and executes every branch's pipeline,
        # which is exactly the capacity blow-up the split exists to avoid.
        # Disclosed per-row in the report ("qsplit": {..., dematerialized}).
        base = re.sub(r"\bAS MATERIALIZED\b", "AS", sql)
        t0 = time.monotonic()
        parts = []
        for v in vals:
            remaining = None if cap is None else cap - (time.monotonic() - t0)
            if remaining is not None and remaining <= 0:
                raise TimeoutError(f"oracle exceeded {cap}s (across qsplit parts)")
            parts.append(run_oracle_once(
                f"SELECT * FROM ({base}) __g WHERE {col_} = '{v}'", name,
                cap_override=remaining))
        return pd.concat(parts, ignore_index=True)
    return run_oracle_once(sql, name)

def run_oracle_once(sql, name=None, cap_override=None):
    global con
    dedicated = name is not None and (name in qthreads or name in qmem)
    c = (fresh_con(threads=qthreads.get(name), memlimit=qmem.get(name))
         if dedicated else con)
    qcap = cap if cap_override is None else cap_override
    wedged = False
    try:
        if qcap is None:
            return c.sql(sql).df()
        box, err = [], []
        def work():
            try:
                box.append(c.sql(sql).df())
            except Exception as e:
                err.append(e)
        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(qcap)
        if t.is_alive():
            c.interrupt()
            t.join(30)
            if t.is_alive():
                # the worker is wedged past the grace join — abandon
                # this connection entirely (it is not thread-safe) and,
                # if it was the shared one, give the remaining oracles
                # a fresh one
                wedged = True
                if not dedicated:
                    con = fresh_con()
            raise TimeoutError(f"oracle exceeded {qcap}s")
        if err:
            raise err[0]
        return box[0]
    finally:
        if dedicated and not wedged:
            c.close()

n_pass = n_fail = n_skip = n_timeout = 0
for name in sorted(oracle):
    flush_report()  # persist all verdicts so far before the next oracle runs
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
    if name in qsplit:
        # the split enumeration must COVER the dumped artifact: a value
        # present in the dump but absent from --qsplit would silently
        # vanish from the oracle result, weakening the gate to "matches
        # on the enumerated subset" (e.g. an engine bug duplicating rows
        # into a branch the list missed would false-pass)
        scol, svals = qsplit[name]
        if scol.lower() not in s.columns:
            print(f"FAIL {name}: --qsplit column {scol} not in dump columns")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "err": f"qsplit_column_missing: {scol}"}
            n_fail += 1
            continue
        uncovered = sorted(set(s[scol.lower()].astype(str)) - set(svals))
        if uncovered:
            print(f"FAIL {name}: dump has {scol} values not enumerated "
                  f"in --qsplit: {uncovered}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "err": f"qsplit_uncovered_values: {uncovered}"}
            n_fail += 1
            continue
    try:
        d = norm(run_oracle(oracle[name], name))
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
    if name in qsplit:  # disclose the split protocol on the row itself
        report[name]["qsplit"] = {"column": qsplit[name][0],
                                  "values": qsplit[name][1],
                                  "dematerialized": True}
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

flush_report()
# skipped/timed-out oracles are UNVERIFIED, not passed: name them in the
# summary and exit 2 (distinct from both clean=0 and fail=1) so a caller
# chaining on exit 0 can't mistake an unverified run for a green one
extra = ""
if n_skip or n_timeout:
    extra = f", {n_skip} skipped, {n_timeout} timeout (UNVERIFIED)"
print(f"\n{n_pass} pass, {n_fail} fail{extra}, {len(oracle)} total")
sys.exit(1 if n_fail else (2 if n_skip or n_timeout else 0))
