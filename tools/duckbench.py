#!/usr/bin/env python3
"""Time the DuckDB oracle battery — the baseline side of the matched-run
engine comparison in BENCH_NOTES.

Runs every query in outDir/oracle_sql.json against the sf tables on 32
threads, prints ONE JSON line mirroring Bench.scala's shape
({"metric","value","queries",...}), so matched Spark/DuckDB pairs come
from the same harness instead of ad-hoc timing.

Usage: python3 tools/duckbench.py [sfDir] [outDir]
         [--skip q1,q2] [--timeout SECS] [--runs N]
--runs: per-query min-of-N (default 1; BENCH_NOTES matched pairs use 2).
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, glob, os, sys, json, time, threading

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0][2:]: (a.split("=", 1)[1] if "=" in a else True)
        for a in sys.argv[1:] if a.startswith("--")}
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
out = args[1] if len(args) > 1 else "/root/repo/target/verify_out"
skip = set(str(opts.get("skip", "")).split(",")) - {""}
cap = float(opts["timeout"]) if "timeout" in opts else None
runs = int(opts.get("runs", 1))

con = duckdb.connect()
con.execute("SET threads TO 32")
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
times, times_all, errors = {}, {}, {}
for name in sorted(oracle):
    if name in skip:
        errors[name] = "skipped"
        continue
    best, reps = None, []
    for _ in range(runs):
        t0 = time.monotonic()
        try:
            if cap is None:
                con.sql(oracle[name]).fetchall()
            else:
                box = []
                def work():
                    try:
                        con.sql(oracle[name]).fetchall()
                    except Exception as e:
                        box.append(e)
                th = threading.Thread(target=work, daemon=True)
                th.start()
                th.join(cap)
                if th.is_alive():
                    con.interrupt()
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
    if best is not None:
        times[name] = round(best, 6)
        times_all[name] = reps

total = round(sum(times.values()), 6)
# "queries" (the minima) MUST precede "queries_all": Bench.scala's
# regex parse anchors on the first "queries" object.
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": times, "queries_all": times_all,
                  "errors": errors, "sf": sf, "n_queries": len(times)}))
