#!/usr/bin/env python3
"""Time the DuckDB oracle battery — the baseline side of the matched-run
engine comparison in BENCH_NOTES.

Runs every query in outDir/oracle_sql.json against the sf tables on 32
threads, prints ONE JSON line mirroring Bench.scala's shape
({"metric","value","queries",...}), so matched Spark/DuckDB pairs come
from the same harness instead of ad-hoc timing.

Usage: python3 tools/duckbench.py [sfDir] [outDir]
         [--skip=q1,q2] [--timeout=SECS] [--runs=N]
         [--qthreads=name=N,...] [--qmem=name=NGB,...]
--runs: per-query min-of-N (default 1; BENCH_NOTES matched pairs use 2).
--qthreads/--qmem: PER-QUERY DuckDB budget overrides — the named query
  runs on a dedicated connection with its own thread/memory budget
  (DuckDB 1.0.0's radix-partitioned aggs allocate untracked ~3 GB/thread
  on the PQ-family struct-argmin twins at sf1+; throttling just those
  twins lets the full battery fit one box). Budgets used are disclosed
  per query in the output ("budgets"), and the dedicated connection is
  built OUTSIDE the timed region — the twin is charged for its query,
  not for view setup.
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, glob, os, sys, json, time, threading

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0][2:]: (a.split("=", 1)[1] if "=" in a else True)
        for a in sys.argv[1:] if a.startswith("--")}
# every option carries a value: a bare `--threads` parsing to True would
# silently become 1 thread — reject bare flags and unknown options
VALUE_OPTS = ("skip", "timeout", "runs", "qthreads", "qmem")
for k, v in opts.items():
    if k not in VALUE_OPTS:
        sys.exit(f"duckbench.py: unknown option --{k}")
    if v is True:
        sys.exit(f"duckbench.py: --{k} requires a value (--{k}=...)")
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
out = args[1] if len(args) > 1 else "/root/repo/target/verify_out"
skip = set(str(opts.get("skip", "")).split(",")) - {""}
cap = float(opts["timeout"]) if "timeout" in opts else None
runs = int(opts.get("runs", 1))

def parse_per_query(opt):
    d = {}
    for kv in str(opts.get(opt, "")).split(","):
        if not kv:
            continue
        if "=" not in kv:
            sys.exit(f"duckbench.py: --{opt} entries must be name=value")
        q, val = kv.split("=", 1)
        d[q] = val
    return d

qthreads = parse_per_query("qthreads")
qmem = parse_per_query("qmem")


def make_con(threads="32", memlimit=None):
    c = duckdb.connect()
    c.execute(f"SET threads TO {int(threads)}")
    if memlimit is not None:
        c.execute(f"SET memory_limit='{memlimit}'")
        c.execute("SET temp_directory='/tmp/duckspill'")
        c.execute("SET max_temp_directory_size='50GB'")
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        # a fixture table is one parquet file OR a directory of them
        # (the r15 multi-file layout for >64 MB tables — replicate.py)
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        c.execute(f"create view {name} as select * from {src}")
    return c

con = make_con()

oracle = json.load(open(f"{out}/oracle_sql.json"))
times, times_all, errors, budgets = {}, {}, {}, {}
for name in sorted(oracle):
    if name in skip:
        errors[name] = "skipped"
        continue
    # progress to stderr: a kill mid-battery must name its query
    print(name, file=sys.stderr, flush=True)
    dedicated = name in qthreads or name in qmem
    if dedicated:
        c = make_con(threads=qthreads.get(name, "32"),
                     memlimit=qmem.get(name))
        budgets[name] = {"threads": int(qthreads.get(name, 32)),
                         **({"memlimit": qmem[name]} if name in qmem else {})}
    else:
        c = con
    best, reps = None, []
    for _ in range(runs):
        t0 = time.monotonic()
        try:
            if cap is None:
                c.sql(oracle[name]).fetchall()
            else:
                box = []
                def work():
                    try:
                        c.sql(oracle[name]).fetchall()
                    except Exception as e:
                        box.append(e)
                th = threading.Thread(target=work, daemon=True)
                th.start()
                th.join(cap)
                if th.is_alive():
                    c.interrupt()
                    th.join(30)
                    raise TimeoutError(f"exceeded {cap}s")
                if box:
                    raise box[0]
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            best = None
            break
        dt = time.monotonic() - t0
        reps.append(round(dt, 6))
        best = dt if best is None else min(best, dt)
    if dedicated:
        c.close()
    if best is not None:
        times[name] = round(best, 6)
        times_all[name] = reps

total = round(sum(times.values()), 6)
# "queries" (the minima) MUST precede "queries_all": Bench.scala's
# regex parse anchors on the first "queries" object.
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": times, "queries_all": times_all,
                  "errors": errors, "budgets": budgets, "sf": sf,
                  "n_queries": len(times)}))
