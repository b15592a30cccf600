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

Usage: python3 tools/gen_stress.py [sfDir] [outDir] [repl] [--salted]

--salted builds the SCAN-SCALING CONTROL fixture instead: every
document token gets a per-replica suffix (so replicas are mutually
NON-duplicate and the dup-cluster structure is exactly repl x the
original's — real 10x corpora grow cluster COUNT, not cluster SIZE),
and embeddings replicate with per-replica perturbed vectors (so ANN
actually sees 10x the points instead of the copied 1x table). The
default clone fixture measures the adversarial clone-cluster shape
(output pairs grow ~C(repl,2) per doc — superlinear BY CONSTRUCTION);
the salted fixture measures wall-time vs corpus size at constant dup
rate. See BASELINE.md "Stress scaling".
"""
import os
import shutil
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# flags are not positional: filter '--'-prefixed tokens out before
# indexing, as driver_diff.py does — `gen_stress.py sf out --salted`
# must not crash on int('--salted'), and a bare `--salted` must not
# become the sfDir (round-12 ADVICE).
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.1"
OUT = _pos[1] if len(_pos) > 1 else os.path.join(ROOT, "target", "stress")
REPL = int(_pos[2]) if len(_pos) > 2 else 10
SALTED = "--salted" in sys.argv[1:]

SCALED = {
    "orders": ("o_orderkey + i*100000000 AS o_orderkey, "
               "o_custkey + i*10000000 AS o_custkey"),
    "lineitem": "l_orderkey + i*100000000 AS l_orderkey",
    "customer": "c_custkey + i*10000000 AS c_custkey",
    "events": ("event_id + i*1000000000 AS event_id, "
               "user_id + i*1000000 AS user_id"),
    "documents": "doc_id + i*100000000 AS doc_id",
}
if SALTED:
    # every token suffixed with the replica index: all shingles become
    # replica-distinct, so no cross-replica near-dup pairs exist and the
    # dup structure is exactly repl x the original corpus's
    SCALED["documents"] += (", CASE WHEN i = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', '\\1_' || i, 'g') END AS text")
    # embeddings replicate with a per-replica deterministic perturbation
    # (vec_id-seeded, ~1e-3 per dim) so ANN sees repl x distinct points
    SCALED["embeddings"] = (
        "vec_id + i*10000000 AS vec_id, "
        "CASE WHEN i = 0 THEN embedding ELSE "
        "CAST(list_transform(embedding, x -> x + "
        "CAST(((vec_id + i * 7919) % 2001 - 1000) AS FLOAT) * 1e-6) "
        "AS FLOAT[]) END AS embedding")
    COPIED = ["region", "nation", "supplier", "part"]
else:
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
    print(f"stress fixture at {OUT} (x{REPL}"
          + (", salted scan-scaling control)" if SALTED else ", clone)"))


if __name__ == "__main__":
    main()
