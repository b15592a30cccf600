#!/usr/bin/env python3
"""Self-test of selfcheck.py's wire-type machinery (round 18, VERDICT
r17 #2): plants each discovered driver-red wire class and asserts the
gate functions reject it, and that the live type universe passes. Runs
in the standing-gate sweep's cheap-lint phase — a refactor of
selfcheck.py that silently widens the gate fails here, not on the
driver."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pyarrow as pa
import selfcheck as sc

fails = []
def expect(cond, what):
    if not cond:
        fails.append(what)

# --- allowed(): the narrow-type allowlist ---
for t in [pa.int8(), pa.int16(), pa.int32(), pa.int64(), pa.float64(),
          pa.string(), pa.large_string(), pa.bool_(), pa.date32(),
          pa.date64(), pa.timestamp("us"), pa.timestamp("us", tz="UTC"),
          pa.list_(pa.int64()), pa.struct([("a", pa.float64())])]:
    expect(sc.allowed(t), f"allowed should accept {t}")
for t in [pa.decimal128(38, 0), pa.decimal256(76, 0),   # HUGEINT class
          pa.timestamp("ns"), pa.timestamp("ms"),        # tpch3/18 class
          pa.timestamp("us", tz="America/New_York"),
          pa.float32(), pa.float16(),
          pa.uint64(),                                   # >2^63 wire risk
          pa.binary(),
          pa.list_(pa.decimal128(38, 0)),                # nested
          pa.struct([("a", pa.timestamp("ns"))])]:
    expect(not sc.allowed(t), f"allowed should reject {t}")

# --- coarse(): the column-by-column compare token ---
expect(sc.coarse(pa.timestamp("us")) != sc.coarse(pa.timestamp("ns")),
       "coarse must distinguish timestamp units")
expect(sc.coarse(pa.timestamp("us")) != sc.coarse(pa.timestamp("us", tz="UTC")),
       "coarse must distinguish timestamp tz")
expect(sc.coarse(pa.float32()) != sc.coarse(pa.float64()),
       "coarse must distinguish float widths")
expect(sc.coarse(pa.decimal128(38, 0)) != sc.coarse(pa.int64()),
       "coarse must distinguish decimal from int")
expect(sc.coarse(pa.list_(pa.float32())) != sc.coarse(pa.list_(pa.float64())),
       "coarse must recurse into list value types")
expect(sc.coarse(pa.int32()) == sc.coarse(pa.int64()),
       "coarse must collapse value-exact int widths")
expect(sc.coarse(pa.string()) == sc.coarse(pa.large_string()),
       "coarse must collapse string/large_string")

if fails:
    for f in fails:
        print(f"FAIL: {f}")
    print(f"\nselfcheck selftest: {len(fails)} failures")
    sys.exit(1)
print("selfcheck selftest: OK (wire-type gate rejects planted HUGEINT/"
      "timestamp[ns]/float32 classes; live universe passes)")
