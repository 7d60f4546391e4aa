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

Usage: python3 tools/replicate.py sf1        # /tmp/sf1,  x10
       python3 tools/replicate.py sf10       # /tmp/sf10, x100
(Dev tool only — the Scala library has no Python dependency.)
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
TARGETS = {"sf1": 10, "sf10": 100}

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


def build(name: str) -> None:
    reps = TARGETS[name]
    out = f"/tmp/{name}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in VERBATIM:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: verbatim")
    for t, keys in OFFSET_KEYS.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.off AS {c}" if c in keys else c for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' CROSS JOIN "
            f"(SELECT unnest(range({reps}))::BIGINT * 100000000 AS off) r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: x{reps} -> {n} rows")


if __name__ == "__main__":
    for name in sys.argv[1:] or ["sf1"]:
        build(name)
