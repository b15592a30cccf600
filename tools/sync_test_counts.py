#!/usr/bin/env python3
"""Sync the test-count figures in README.md and BASELINE.md from the sbt
test reports (target/test-reports/*.xml) — the single source of truth —
so the docs can't drift from the real suite again (round-6/7 advice).

Run AFTER a green `sbt test`:  python3 tools/sync_test_counts.py
"""
import glob, os, re, sys
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    reports = sorted(glob.glob(os.path.join(ROOT, "target/test-reports/*.xml")))
    if not reports:
        sys.exit("no test reports found — run `sbt test` first")
    # staleness guard (round 13: a sync from reports predating the last
    # test-source edit wrote a wrong count): every report must be newer
    # than the newest file under src/.
    newest_src = max(
        os.path.getmtime(os.path.join(d, f))
        for d, _, fs in os.walk(os.path.join(ROOT, "src")) for f in fs)
    stale = [p for p in reports if os.path.getmtime(p) < newest_src]
    if stale:
        sys.exit(f"refusing to sync: {len(stale)} report(s) older than the "
                 "newest src/ file — re-run `sbt test` first "
                 f"(e.g. {os.path.basename(stale[0])})")
    suites, tests, failures = 0, 0, 0
    for path in reports:
        s = ET.parse(path).getroot()
        suites += 1
        tests += int(s.get("tests", 0))
        failures += int(s.get("failures", 0)) + int(s.get("errors", 0))
    if failures:
        sys.exit(f"refusing to sync: {failures} failing tests in reports")
    phrase = f"{tests} tests in {suites} suites"
    edits = [
        ("README.md", r"\d+ tests in \d+ suites", phrase),
        ("BASELINE.md", r"\*\*\d+ tests in \d+ suites\*\*", f"**{phrase}**"),
    ]
    for fname, pat, repl in edits:
        p = os.path.join(ROOT, fname)
        old = open(p).read()
        new, n = re.subn(pat, repl, old, count=1)
        if n == 0:
            sys.exit(f"{fname}: marker line not found (pattern {pat!r})")
        if new != old:
            open(p, "w").write(new)
        print(f"{fname}: {phrase}" + ("" if new != old else " (already current)"))


if __name__ == "__main__":
    main()
