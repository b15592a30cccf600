#!/usr/bin/env python3
"""Transcendental-output lint: freeze the audited set of libm call sites.

exp/ln/log2/log10/pow of IDENTICAL inputs can differ by an ulp between
libms (JVM Math vs the driver box's DuckDB), and a raw transcendental
OUTPUT that feeds an exact DECIMAL sum or a rounding boundary can flip
the driver's bit-level hash even when every local gate is green —
q_cox_ph went red in the round-10 DRIVER run exactly this way while
three local sweeps recorded it green.

The repo convention (BASELINE.md "Cross-engine transcendental outputs"):
every transcendental whose output feeds a DECIMAL cast, an exact sum,
or a comparison/rounding readout must pin its OUTPUT to 9 dp on BOTH
engines (round(expr, 9) / round0), unless the site is documented
boundary-safe (e.g. a bounded distinct-input set pinned elsewhere, or
an output consumed only by a later pinned expression).

Like lint_round0, this freezes the AUDITED set of Scala-side call sites
(string literals stripped, so mirrored oracle SQL is not double-counted;
the SQL side is covered by the per-query mirror convention): any NEW
site fails until the author either pins the output or consciously
re-baselines with --write after auditing it against the convention.

Usage:
  python3 tools/lint_transcendental.py          # check vs allowlist
  python3 tools/lint_transcendental.py --write  # re-baseline
"""
import collections
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala")
ALLOW = os.path.join(ROOT, "tools", "transcendental_allowlist.txt")

STR_RE = re.compile(r'"(?:\\.|[^"\\])*"')
# Scala-side libm surfaces: o.a.s.sql.functions and java.lang.Math.
# sqrt/cbrt are IEEE-correctly-rounded (excluded); pow is libm (included).
CALL_RE = re.compile(r"\b(exp|expm1|log|log1p|log2|log10|pow)\(")
# The PORTABLE class: graft.functions.PortableMath sites evaluate
# exp/ln from pure IEEE arithmetic — bit-DETERMINISTIC cross-engine by
# construction, no pin needed. Counted separately so the report shows
# which class each family is in (the allowlist freezes only the
# pinned-output probabilistic class).
PORTABLE_RE = re.compile(
    r"\b(?:PortableMath(?:Kernel)?\.(?:pexp|pln)|"
    r"(?:pm|PortableMathSql)\.(?:expFrom|lnFrom))\(")


def sites():
    found = collections.Counter()
    portable = 0
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
                        continue  # docs discuss the convention freely
                    # count portable sites on the SAME string-stripped,
                    # comment-filtered line as CALL_RE — doc/scaladoc
                    # mentions must not inflate the deterministic-site
                    # count (round-12 ADVICE).
                    portable += len(PORTABLE_RE.findall(stripped))
                    if CALL_RE.search(stripped):
                        found[(rel, stripped)] += 1
    return found, portable


def main():
    found, portable = sites()
    if "--write" in sys.argv[1:]:
        with open(ALLOW, "w") as f:
            f.write("# transcendental lint baseline — see "
                    "tools/lint_transcendental.py\n")
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
        print("NEW transcendental call sites (pin the OUTPUT to 9 dp "
              "before any DECIMAL cast / exact sum / rounding boundary, "
              "use the portable kernel (graft.functions.PortableMath) for "
              "iterated-fit value paths, mirror in the oracle, or "
              "re-baseline with --write after auditing — see BASELINE.md "
              "'Cross-engine transcendental outputs'):")
        for (rel, text), n in sorted(new.items()):
            extra = n - allowed.get((rel, text), 0)
            print(f"  {rel} (+{extra}): {text}")
        return 1
    # Below-baseline is ALSO a failure: removed sites would otherwise
    # leave allowlist slack a later re-added raw libm call could hide
    # in, and stale lines make the frozen set lie about the tree
    # (round-11 ADVICE). The allowlist must match the tree exactly.
    stale = {k: (allowed[k], found.get(k, 0))
             for k in allowed if found.get(k, 0) < allowed[k]}
    if stale:
        print("STALE allowlist lines (site count below baseline — "
              "re-baseline with --write so the frozen set matches the "
              "tree exactly):")
        for (rel, text), (a, f) in sorted(stale.items()):
            print(f"  {rel} ({f} < {a}): {text}")
        return 1
    print(f"transcendental lint: OK — "
          f"{sum(found.values())} pinned-output (probabilistic) libm "
          f"sites audited, {portable} portable-kernel (deterministic) "
          f"sites (iterated fits: Cox/GMM/logistic are portable-class)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
