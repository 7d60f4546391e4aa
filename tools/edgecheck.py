#!/usr/bin/env python3
"""Edge-case gate: rebuilds a testdata dir whose `documents` table is all
sharp edges (empty/blank/1-2-3-token/unicode/punct-only/very-long/null
text), then the normal Verify + check flow must still pass 55/55.

This catches the "latent at 100 TB" class: semantics that diverge
cross-engine only on inputs absent from the driver's clean synthetic
data (found so far: NULL band-key bucketing in LSH, null-text rolling
hash).

Usage: python3 tools/edgecheck.py   # writes /tmp/edgedata, prints recipe
Then:  sbt "runMain graft.Verify /tmp/edgedata /tmp/verify_edge"
       python3 tools/check.py /tmp/edgedata /tmp/verify_edge
"""
import duckdb, os, shutil

BASE = "/root/testdata/sf0.001"
OUT = "/tmp/edgedata"

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    src = f"{BASE}/{t}.parquet"
    if os.path.exists(src):
        shutil.copyfile(src, f"{OUT}/{t}.parquet")

con = duckdb.connect()
con.sql(f"""
COPY (SELECT * FROM (VALUES
  (0, '', 'en', 'web', 0),
  (1, '   ', 'en', 'web', 3),
  (2, 'single', 'en', 'web', 6),
  (3, 'two tokens', 'en', 'web', 10),
  (4, 'exactly three tokens', 'en', 'web', 20),
  (5, 'Ünïcödé tëxt wíth áccents and ümläuts everywhere', 'de', 'web', 48),
  (6, '123 456 !!! ??? ... 789', 'xx', 'web', 23),
  (7, repeat('long', 500), 'en', 'web', 2000),
  (8, 'dup dup dup dup dup dup dup dup dup dup', 'en', 'web', 40),
  (9, 'a b c d e f g h i j k l m n o p', 'en', 'web', 31),
  (10, 'tab\there and  double  spaces', 'en', 'web', 28),
  (11, NULL, 'en', 'web', 0)
) t(doc_id, text, lang, source, n_chars)) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")
print(f"edge testdata written to {OUT}; run Verify + check against it")
