#!/usr/bin/env python3
"""Round/cast determinism lint: freeze the engine-round and
DECIMAL<->DOUBLE cast inventory of dual-engine value paths.

The class that burned rounds 10-12 (q_cox_ph):
  1. engine `round(double, n)`: Spark rounds HALF_UP on the shortest
     decimal repr; DuckDB rounds in 10^n-scaled double arithmetic —
     the engines disagree BY ALGORITHM near half boundaries, and
     DuckDB's behavior has changed across builds.
  2. `CAST(raw double AS DECIMAL(38,s))` of an UNPINNED double: Spark
     shortest-repr-then-scale vs DuckDB multiply-by-10^s-in-double —
     the s-th decimal differs ~4e-4 per value.
  3. `CAST(DECIMAL AS DOUBLE)` whose unscaled value can exceed 2^53:
     Spark converts once (correctly rounded); DuckDB converts
     int128->double THEN divides by 10^s — double rounding, build-
     dependent, ~25% disagreement per out-of-range value. A
     DECIMAL(38,12) sum crosses 2^53 unscaled at just ~9007.

The deterministic replacements live in graft.functions.PortableMath
(pin/pairSum/pairVal) and PortableMathSql (pinSql/pairSumSql/
pairValSql): floor-ladder pins and exact DECIMAL(38,0) integer pair
sums — pure IEEE, bit-identical on any engine or build.

This lint inventories BOTH sides of the contract per file:
  scala_round    bare Spark round( / round0( call sites (code lines,
                 string literals stripped)
  scala_to_dec   .cast("decimal...) on the Scala side
  scala_to_dbl   .cast("double") on the Scala side
  sql_round      round( INSIDE string literals (oracle SQL)
  sql_to_dec     AS DECIMAL( inside string literals
  sql_to_dbl     AS DOUBLE) inside string literals
and freezes the counts: any INCREASE fails until the author either
uses the portable machinery or consciously re-baselines with --write
after auditing the new site against BASELINE.md's determinism memo
(safe patterns: 9-dp-pinned or integer-valued doubles into DECIMAL;
DECIMAL->DOUBLE with unscaled value provably < 2^53; round0 of a
one-shot readout whose upstream is already bit-identical).
Decreases are also flagged (stale baseline) so the inventory always
matches the tree.

Usage:
  python3 tools/lint_round_casts.py          # check vs allowlist
  python3 tools/lint_round_casts.py --write  # re-baseline
"""
import collections
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala")
ALLOW = os.path.join(ROOT, "tools", "round_casts_allowlist.txt")

STR_RE = re.compile(r'"(?:\\.|[^"\\])*"')
SCALA_ROUND_RE = re.compile(r"\bround0?\(")
SCALA_TO_DEC_RE = re.compile(r'\.cast\("decimal')
SCALA_TO_DBL_RE = re.compile(r'\.cast\("double"\)')
SQL_PATTERNS = {
    "sql_round": re.compile(r"\bround\(", re.IGNORECASE),
    "sql_to_dec": re.compile(r"\bAS DECIMAL\(", re.IGNORECASE),
    "sql_to_dbl": re.compile(r"\bAS DOUBLE\)", re.IGNORECASE),
}


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
                    literals = STR_RE.findall(line)
                    stripped = STR_RE.sub('""', line).strip()
                    if stripped.startswith("*") or stripped.startswith("//"):
                        continue  # docs discuss the hazard class freely
                    # .cast("double")/.cast("decimal(38,0)") carry the
                    # type INSIDE a literal, so the scala cast patterns
                    # match the raw line; round matches the stripped one
                    if SCALA_ROUND_RE.search(stripped):
                        found[(rel, "scala_round")] += 1
                    raw = line.strip()
                    if SCALA_TO_DEC_RE.search(raw):
                        found[(rel, "scala_to_dec")] += 1
                    if SCALA_TO_DBL_RE.search(raw):
                        found[(rel, "scala_to_dbl")] += 1
                    body = " ".join(literals)
                    for key, pat in SQL_PATTERNS.items():
                        n = len(pat.findall(body))
                        if n:
                            found[(rel, key)] += n
    return found


def main():
    found = sites()
    if "--write" in sys.argv[1:]:
        with open(ALLOW, "w") as f:
            f.write("# round/cast lint baseline — see "
                    "tools/lint_round_casts.py\n")
            for (rel, key), n in sorted(found.items()):
                f.write(f"{n}\t{rel}\t{key}\n")
        print(f"wrote {sum(found.values())} sites "
              f"({len(found)} file/class rows) to {ALLOW}")
        return 0
    allowed = collections.Counter()
    if os.path.exists(ALLOW):
        with open(ALLOW) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                n, rel, key = line.rstrip("\n").split("\t", 2)
                allowed[(rel, key)] = int(n)
    grew = {k: (allowed.get(k, 0), n)
            for k, n in found.items() if n > allowed.get(k, 0)}
    if grew:
        print("NEW engine-round / DECIMAL<->DOUBLE cast sites (use the "
              "portable pin/pair-sum machinery in "
              "graft.functions.PortableMath(Sql), or re-baseline with "
              "--write after auditing against BASELINE.md's determinism "
              "memo):")
        for (rel, key), (a, n) in sorted(grew.items()):
            print(f"  {rel} [{key}] {a} -> {n}")
        return 1
    shrank = {k: (allowed[k], found.get(k, 0))
              for k in allowed if found.get(k, 0) < allowed[k]}
    if shrank:
        print("STALE baseline rows (count below baseline — re-baseline "
              "with --write so the inventory matches the tree):")
        for (rel, key), (a, n) in sorted(shrank.items()):
            print(f"  {rel} [{key}] {a} -> {n}")
        return 1
    by_class = collections.Counter()
    for (rel, key), n in found.items():
        by_class[key] += n
    print("round/cast lint: OK — " + ", ".join(
        f"{k}={by_class[k]}" for k in sorted(by_class)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
