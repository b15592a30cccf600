#!/usr/bin/env python3
"""Duplicate-registration lint for SparkEntry.

Scala Map literals silently keep the LAST entry for a duplicated key, so
a query or oracle registered twice shadows its earlier twin — the
earlier pair becomes dead code while every gate stays green (this
happened to q_skew_report for several rounds, and nearly to q_benford
in round 10). This lint fails on any query-lambda or oracle-SQL key
that appears more than once in SparkEntry.scala.
"""
import collections
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(ROOT, "src", "main", "scala", "graft", "SparkEntry.scala")

QUERY_RE = re.compile(r'"(q_[a-z0-9_]+)" -> \(\(s')
ORACLE_RE = re.compile(r'"(q_[a-z0-9_]+)" ->\s*\n?\s*\(?"', re.M)


def main():
    src = open(ENTRY).read()
    bad = False
    for label, pat in [("query", QUERY_RE), ("oracle", ORACLE_RE)]:
        dups = [k for k, n in collections.Counter(pat.findall(src)).items()
                if n > 1]
        if dups:
            bad = True
            print(f"DUPLICATE {label} keys (the earlier entry is silently "
                  f"dead): {sorted(dups)}")
    if not bad:
        nq = len(QUERY_RE.findall(src))
        print(f"dupkey lint: OK ({nq} query registrations, all distinct)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
