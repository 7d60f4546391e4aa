#!/usr/bin/env python3
"""Rebuild the large-SF fixtures from the driver's sf0.1 tables.

The driver ships sf <= 0.1; the sf1 (x10) and sf10 (x100) fixtures used
for scale hardening are derived by replicating sf0.1 with OFFSET
surrogate keys (replica r adds r*10^8 to every surrogate key), so join
selectivity and group cardinality per replica are preserved while
near-dup cluster sizes multiply — exactly the regime a 100 TB dedup
pass lives in. region/nation (fixed dimensions) are copied verbatim.
Non-key attributes (timestamps, text, embeddings, labels) are repeated
unchanged.

Layout (r15): any table whose replicated output exceeds SPLIT_MIN bytes
is written as a DIRECTORY of <= FILE_SIZE parquet files instead of one
monolithic file. Production 100 TB tables are always many files; a
single 140 MB file caps Spark's scan at ceil(size/maxPartitionBytes)
tasks (the q03 serial-scan artifact adjudicated in BENCH_NOTES r14) —
the multi-file layout makes the bench measure the PLAN, not the
fixture's accidental monolithism. Row contents are unchanged; every
oracle answer is layout-invariant.

Usage: python3 tools/replicate.py sf1        # /tmp/sf1,  x10
       python3 tools/replicate.py sf10       # /tmp/sf10, x100
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, os, shutil, sys

SRC = "/root/testdata/sf0.1"
TARGETS = {"sf1": 10, "sf10": 100}
SPLIT_MIN = 64 * 1024 * 1024   # outputs above this become multi-file
FILE_SIZE = "32MB"             # target size per file in a split table

# table -> columns offset by r*10^8 per replica r
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def clear(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def build(name: str) -> None:
    reps = TARGETS[name]
    out = f"/tmp/{name}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in VERBATIM:
        clear(f"{out}/{t}.parquet")
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: verbatim")
    for t, keys in OFFSET_KEYS.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.off AS {c}" if c in keys else c for c in cols)
        tgt = f"{out}/{t}.parquet"
        clear(tgt)
        # Estimated output ~= source bytes x replicas (same encoding,
        # same data repeated); split big tables into bounded files.
        est = os.path.getsize(f"{SRC}/{t}.parquet") * reps
        fmt = ("FORMAT PARQUET" if est <= SPLIT_MIN
               else f"FORMAT PARQUET, FILE_SIZE_BYTES '{FILE_SIZE}'")
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' CROSS JOIN "
            f"(SELECT unnest(range({reps}))::BIGINT * 100000000 AS off) r) "
            f"TO '{tgt}' ({fmt})")
        src = f"'{tgt}/*.parquet'" if os.path.isdir(tgt) else f"'{tgt}'"
        n = con.sql(f"SELECT count(*) FROM {src}").fetchone()[0]
        layout = (f"{len(os.listdir(tgt))} files" if os.path.isdir(tgt)
                  else "1 file")
        print(f"{t}: x{reps} -> {n} rows ({layout})")


if __name__ == "__main__":
    for name in sys.argv[1:] or ["sf1"]:
        build(name)
