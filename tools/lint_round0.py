#!/usr/bin/env python3
"""Signed-zero lint: make the round0 fix STRUCTURAL.

The driver's correctness gate hashes doubles at bit level, where
-0.0 != 0.0. Spark and DuckDB round negative-tiny doubles to
differently-signed zeros, so every Spark-side `round(x, n)` readout of a
possibly-negative double must be `round0` (round + 0.0, mirrored as
`+ 0.0` in the oracle SQL). This lint freezes the audited set of bare
`round(` call sites in src/main: any NEW site fails until the author
either switches it to round0 or consciously re-baselines with --write
(after checking the rounded expression is provably nonnegative, e.g. a
count ratio, or its sign is pinned by an abs()/greatest(0) upstream).

String literals are stripped first, so DuckDB `round(...)` text inside
oracle SQL strings is NOT flagged — the oracle side of the contract is
covered by the paired `+ 0.0` convention, checked query-by-query.

Usage:
  python3 tools/lint_round0.py          # check against the allowlist
  python3 tools/lint_round0.py --write  # re-baseline the allowlist
"""
import collections
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala")
ALLOW = os.path.join(ROOT, "tools", "round0_allowlist.txt")

STR_RE = re.compile(r'"(?:\\.|[^"\\])*"')      # double-quoted literals
CALL_RE = re.compile(r"\bround\(")             # bare round( — round0( can't match


def sites():
    found = collections.Counter()
    for dirpath, _, names in os.walk(SRC):
        for name in sorted(names):
            if not name.endswith(".scala"):
                continue
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, ROOT)
            with open(path) as f:
                for line in f:
                    stripped = STR_RE.sub('""', line).strip()
                    if stripped.startswith("*") or stripped.startswith("//"):
                        continue  # docs discuss round() freely
                    if CALL_RE.search(stripped):
                        found[(rel, stripped)] += 1
    return found


def main():
    found = sites()
    if "--write" in sys.argv[1:]:
        with open(ALLOW, "w") as f:
            f.write("# round0 lint baseline — see tools/lint_round0.py\n")
            for (rel, text), n in sorted(found.items()):
                f.write(f"{n}\t{rel}\t{text}\n")
        print(f"wrote {sum(found.values())} sites "
              f"({len(found)} distinct lines) to {ALLOW}")
        return 0
    allowed = collections.Counter()
    if os.path.exists(ALLOW):
        with open(ALLOW) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                n, rel, text = line.rstrip("\n").split("\t", 2)
                allowed[(rel, text)] = int(n)
    new = {k: n for k, n in found.items() if n > allowed.get(k, 0)}
    if new:
        print("NEW bare round( readouts (use round0, or re-baseline "
              "with --write after checking the value is provably "
              "nonnegative):")
        for (rel, text), n in sorted(new.items()):
            extra = n - allowed.get((rel, text), 0)
            print(f"  {rel} (+{extra}): {text}")
        return 1
    stale = sum(1 for k in allowed if k not in found)
    print(f"round0 lint: OK ({sum(found.values())} audited sites"
          + (f", {stale} stale allowlist lines" if stale else "") + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
