#!/usr/bin/env python3
"""Double-run determinism sweep — the standing gate motivated by the two
order-dependence defects the per-round sweeps caught late (round 8:
spark_partition_id rank nondeterminism; round 9: DuckDB tied-interval
window ordering in q_interval_union). Each was invisible to a single
engine-vs-oracle compare at the gate SF and only surfaced when a run was
repeated under different execution order. This script makes that repeat
systematic, on BOTH engines:

  spark mode:  compare two graft.Verify output dirs produced with
               DIFFERENT parallelism (e.g. SPARK_GRAFT_CPUS=32 vs 17 —
               different shuffle partition counts → different reduce
               order → different float accumulation order if any op
               forgot its DECIMAL sum or value-derived ordering).
  oracle mode: run every oracle SQL twice in DuckDB under different
               PRAGMA threads (8 vs 2 → different parallel window /
               aggregate schedules) and flag any query whose two result
               multisets differ at bit level.

Both compares use the selfcheck norm: NaN tokenized, -0.0 distinct from
+0.0 (the driver hashes bits, so must we).

Usage:
  python3 tools/determinism.py spark  <outDirA> <outDirB>
  python3 tools/determinism.py oracle <sfDir> <oracleSqlJson>
"""
import json, math, os, resource, sys
import duckdb

_soft, _hard = resource.getrlimit(resource.RLIMIT_NOFILE)
resource.setrlimit(resource.RLIMIT_NOFILE, (_hard, _hard))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            return "-0.0"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def canon(cols, rows):
    """Column-name-sorted, row-sorted multiset of normalized values —
    the same shape the driver hashes."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(norm(r[i])) for i in order) for r in rows)


def read_dump(con, path):
    t = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetch_arrow_table()
    cols = t.column_names
    rows = list(zip(*(t.column(c).to_pylist() for c in cols))) if cols else []
    return canon(cols, rows)


def spark_mode(dir_a, dir_b):
    con = duckdb.connect()
    # symmetric union of both runs' dump dirs: a query present in only
    # one run (e.g. a partially-killed first dump) must FAIL, not be
    # silently skipped — otherwise an incomplete run makes the gate
    # vacuously pass for the missing queries
    def dumps(d):
        return {n for n in os.listdir(d) if os.path.isdir(os.path.join(d, n))}
    names = sorted(dumps(dir_a) | dumps(dir_b))
    n_pass = n_fail = 0
    for name in names:
        pa = os.path.join(dir_a, name)
        pb = os.path.join(dir_b, name)
        if not os.path.isdir(pa):
            print(f"FAIL {name}: missing in first run")
            n_fail += 1
            continue
        if not os.path.isdir(pb):
            print(f"FAIL {name}: missing in second run")
            n_fail += 1
            continue
        try:
            a = read_dump(con, os.path.join(dir_a, name))
            b = read_dump(con, pb)
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
            continue
        if a != b:
            diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
            print(f"FAIL {name}: runs differ ({diff} rows; {len(a)} vs {len(b)})")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\nspark determinism: {n_pass} stable, {n_fail} unstable")
    return 1 if n_fail else 0


def oracle_mode(sf_dir, oracle_json):
    oracle = json.load(open(oracle_json))
    cons = []
    for threads in (8, 2):
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        cons.append(con)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        outs = []
        for con in cons:
            try:
                t = con.execute(sql).fetch_arrow_table()
                cols = t.column_names
                rows = (list(zip(*(t.column(c).to_pylist() for c in cols)))
                        if cols else [])
                outs.append(canon(cols, rows))
            except Exception as e:
                outs.append(f"ERROR: {e}")
        if outs[0] != outs[1]:
            print(f"FAIL {name}: oracle differs across thread counts")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\noracle determinism: {n_pass} stable, {n_fail} unstable")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "spark":
        sys.exit(spark_mode(sys.argv[2], sys.argv[3]))
    elif sys.argv[1] == "oracle":
        sys.exit(oracle_mode(sys.argv[2], sys.argv[3]))
    else:
        sys.exit(f"unknown mode {sys.argv[1]}")
