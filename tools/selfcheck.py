#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
written by graft.Verify, run the matching oracle SQL in DuckDB over the
same fixture tables and compare (rows, schema-ish, values).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, os, resource, sys
import duckdb
import pyarrow.types as pat

# DuckDB opens one handle per parquet scan; an inlined CTE chain can fan a
# single oracle query into thousands of scans. Raise the soft fd limit to
# the hard cap so a heavy oracle can't die on EMFILE mid-sweep.
_soft, _hard = resource.getrlimit(resource.RLIMIT_NOFILE)
resource.setrlimit(resource.RLIMIT_NOFILE, (_hard, _hard))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def coarse(t):
    """Coarsened arrow type for the column-by-column wire-type compare
    (round 18, ADVICE r17). Width classes that are value-exact and
    driver-stable (signed/unsigned ints <= 64 bits, string vs
    large_string, date32 vs date64) collapse to one token; everything
    that has bitten on the driver dump stays distinct — decimal
    wideness, TIMESTAMP UNIT AND TZ, float width, nested value types."""
    if pat.is_decimal(t):
        return "decimal"
    if pat.is_signed_integer(t) or pat.is_unsigned_integer(t):
        return "int"
    if pat.is_timestamp(t):
        return f"timestamp[{t.unit},tz={t.tz}]"
    if pat.is_date(t):
        return "date"
    if pat.is_floating(t):
        return f"float{t.bit_width}"
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "bin"
    if pat.is_list(t) or pat.is_large_list(t):
        return f"list<{coarse(t.value_type)}>"
    if pat.is_struct(t):
        inner = ",".join(f"{f.name}:{coarse(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)

def allowed(t):
    """Narrow-type allowlist (round 18, VERDICT r17 #2): every output
    column on EITHER side must be one of the wire-proven-safe types.
    Both discovered driver-red wire classes (decimal128 HUGEINT,
    timestamp[ns]) are impossible by construction: anything outside
    {int8..64, float64, utf8, bool, date32/64, timestamp[us],
    list/struct thereof} fails the sweep, even when both engines agree
    on it."""
    if pat.is_signed_integer(t):
        return True
    if pat.is_floating(t):
        return t.bit_width == 64
    if pat.is_string(t) or pat.is_large_string(t):
        return True
    if pat.is_boolean(t):
        return True
    if pat.is_date(t):
        return True
    if pat.is_timestamp(t):
        return t.unit == "us" and t.tz in (None, "UTC")
    if pat.is_list(t) or pat.is_large_list(t):
        return allowed(t.value_type)
    if pat.is_struct(t):
        return all(allowed(f.type) for f in t)
    return False

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver's compare hashes VALUES AT BIT LEVEL, where +0.0 and
        # -0.0 differ even though Python's == calls them equal. Surface
        # signed zero as a distinct token so this replica catches the
        # round(-tiny) class the same way the driver does.
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            return "-0.0"
        return v
    return v

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # WIRE-TYPE GATE (round 17, generalized to the `allowed`
        # narrow-type allowlist in round 18 per VERDICT r17 #2): a column
        # typed outside the proven-safe set rides the driver's bit-level
        # dump differently even when every VALUE is identical — decimal128
        # HUGEINT red-washed q_cox_diag_x/xcov/g1 in r14 and q_cox_ph/
        # kln/kargs through r16 (uncast SUM-of-integers), and raw
        # timestamp[ns] (the tpch3/18 class) was only caught by a manual
        # audit. Values compare equal HERE (Python == is type-coercing),
        # so without this gate the sweep is green-locally/red-on-driver
        # by construction. CAST the offending output in the oracle/query.
        wide = [f"{f.name}:{f.type}" for f in exp.schema
                if not allowed(f.type)]
        if wide:
            print(f"FAIL {name}: disallowed oracle output type (driver "
                  f"dump divergence class): {wide}")
            n_fail += 1
            continue
        got_path = os.path.join(out_dir, name)
        try:
            got = con.execute(
                f"SELECT * FROM '{got_path}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            n_fail += 1
            continue
        # TYPED COMPARE (round 18, ADVICE r17): the r17 gate only checked
        # the ORACLE schema for decimals and the schema compare above is
        # name-only — a Spark-side decimal, or a timestamp whose UNIT
        # differs between engines (the timestamp[ns]-vs-[us] parquet
        # hazard noted in Tpch.scala), coerces equal in to_pylist and
        # passes HERE while diverging on the driver's bit-level dump.
        # Compare coarsened arrow types column by column, and gate
        # Spark-side decimals exactly like oracle-side ones.
        gwide = [f"{f.name}:{f.type}" for f in got.schema
                 if not allowed(f.type)]
        if gwide:
            print(f"FAIL {name}: disallowed spark output type (driver "
                  f"dump divergence class): {gwide}")
            n_fail += 1
            continue
        mism = [f"{c}: oracle={exp.schema.field(c).type} "
                f"spark={got.schema.field(c).type}"
                for c in ecols
                if coarse(exp.schema.field(c).type)
                != coarse(got.schema.field(c).type)]
        if mism:
            print(f"FAIL {name}: wire-type mismatch (driver dump "
                  f"divergence class): {mism}")
            n_fail += 1
            continue
        if exp.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={exp.num_rows} spark={got.num_rows}")
            n_fail += 1
            continue
        # sort columns by name, rows by everything → order-insensitive value
        # compare. The sort key must be None-safe (Python can't order None
        # vs float); any deterministic total order pairs equal multisets.
        def rowkey(row):
            return [(v is None, str(type(v)), repr(v)) for v in row]
        erows = sorted(
            (tuple(norm(v) for v in row)
             for row in zip(*[exp.column(c).to_pylist() for c in ecols])),
            key=rowkey)
        grows = sorted(
            (tuple(norm(v) for v in row)
             for row in zip(*[got.column(c).to_pylist() for c in gcols])),
            key=rowkey)
        if erows != grows:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(erows, grows)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad[0]}:")
            print(f"  oracle: {bad[1]}")
            print(f"  spark : {bad[2]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({got.num_rows} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
