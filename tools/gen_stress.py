#!/usr/bin/env python3
"""Generate a ~10x stress fixture under target/stress from sf0.1.

The standing gates top out at sf0.1 (~600k-row lineitem); plan audits
pin SHAPES, not constants. This builds a one-off replicated fixture —
TESTDATA.md forbids touching /root/testdata, so it lives under target/
— so the heavy composites can be timed at two scales and checked for
~linear growth (see BASELINE.md "Stress scaling").

Replication: each table is unioned REPL times with per-replica key
shifts chosen to keep join relationships consistent (o_custkey lines up
with c_custkey, l_orderkey with o_orderkey) and well clear of q12's
+10M CDC key trick. documents keeps its text verbatim, so every doc
becomes a 10-clone near-dup cluster — an adversarial but legitimate
dedup input (clone clusters are what dedup exists for); candidate pairs
grow ~45 per doc, still linear in corpus size.

Usage: python3 tools/gen_stress.py [sfDir] [outDir] [repl]
"""
import os
import shutil
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "target", "stress")
REPL = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SCALED = {
    "orders": ("o_orderkey + i*100000000 AS o_orderkey, "
               "o_custkey + i*10000000 AS o_custkey"),
    "lineitem": "l_orderkey + i*100000000 AS l_orderkey",
    "customer": "c_custkey + i*10000000 AS c_custkey",
    "events": ("event_id + i*1000000000 AS event_id, "
               "user_id + i*1000000 AS user_id"),
    "documents": "doc_id + i*100000000 AS doc_id",
}
COPIED = ["region", "nation", "supplier", "part", "embeddings"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, replace in SCALED.items():
        src, dst = f"{SF}/{table}.parquet", f"{OUT}/{table}.parquet"
        con.execute(
            f"COPY (SELECT * EXCLUDE (i) REPLACE ({replace}) FROM '{src}', "
            f"range({REPL}) t(i)) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")
    for table in COPIED:
        shutil.copy(f"{SF}/{table}.parquet", f"{OUT}/{table}.parquet")
    print(f"stress fixture at {OUT} (x{REPL})")


if __name__ == "__main__":
    main()
