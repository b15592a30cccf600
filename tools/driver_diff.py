#!/usr/bin/env python3
"""Driver-artifact diff: make the DRIVER's correctness run the gate of
record.

The local gate sweep (run_gates.sh) compares Spark vs a LOCAL DuckDB.
That is pre-flight only: the driver's box runs its own DuckDB/libm, and
transcendental ulps can differ per host — round 10 shipped q_cox_ph
green in every local gate and red in the driver's CORRECTNESS_r10.json.
This check reads the NEWEST driver artifact in the repo root and fails
loudly on any query it records as red, so a local sweep can never again
be read as the contract.

A red that has since been fixed locally (awaiting the next driver run)
must be ACKNOWLEDGED in tools/driver_red_ack.txt with a line
    r<N> <query> <why it is believed fixed>
which downgrades it to a warning. The ack is per-artifact: when the
next driver artifact lands, stale acks are ignored and the query must
be driver-green for real.

Usage:
  python3 tools/driver_diff.py            # newest CORRECTNESS_r*.json
  python3 tools/driver_diff.py <file>     # explicit artifact (testing)
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ACK = os.path.join(ROOT, "tools", "driver_red_ack.txt")


def newest_artifact():
    best, best_n = None, -1
    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best, best_n


def load_acks(tag):
    acks = {}
    if os.path.exists(ACK):
        with open(ACK) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(None, 2)
                if len(parts) >= 2 and parts[0] == tag:
                    acks[parts[1]] = parts[2] if len(parts) > 2 else ""
    return acks


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        path = args[0]
        m = re.search(r"CORRECTNESS_(r\d+)", os.path.basename(path))
        tag = m.group(1) if m else "r?"
    else:
        path, n = newest_artifact()
        tag = f"r{n}"
        if path is None:
            # The artifacts are git-tracked; absence means a broken or
            # partial checkout, and "no evidence" must not read as green
            # (round-11 ADVICE). --allow-missing is the explicit
            # override for environments that genuinely predate round 1.
            if "--allow-missing" in sys.argv[1:]:
                print("driver diff: no CORRECTNESS_r*.json present — "
                      "skipped by --allow-missing")
                return 0
            print("driver diff: FAIL — no CORRECTNESS_r*.json present "
                  "(artifacts are git-tracked; a gate of record with no "
                  "evidence is not green; pass --allow-missing to "
                  "override)")
            return 1
    with open(path) as f:
        data = json.load(f)
    reds = {}
    for q, rec in sorted(data.items()):
        if not isinstance(rec, dict):
            continue
        bad = [k for k in ("rows_match", "schema_match", "hash_match")
               if rec.get(k) is False]
        if rec.get("err"):
            bad.append(f"err={rec['err']!r}")
        if bad:
            reds[q] = ", ".join(bad)
    acks = load_acks(tag)
    unacked = {q: why for q, why in reds.items() if q not in acks}
    for q in sorted(set(reds) & set(acks)):
        print(f"driver diff: {tag} {q} RED ({reds[q]}) — ACKED: {acks[q]}")
    if unacked:
        print(f"driver diff: {len(unacked)} UNACKED red queries in "
              f"{os.path.basename(path)} (the gate of record):")
        for q, why in sorted(unacked.items()):
            print(f"  {q}: {why}")
        print("fix the query (and ack it in tools/driver_red_ack.txt "
              "pending the next driver run) — a local-green sweep does "
              "NOT override the driver artifact")
        return 1
    print(f"driver diff: OK — {os.path.basename(path)}: "
          f"{len(data) - len(reds)}/{len(data)} green"
          + (f", {len(reds)} red all acked" if reds else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
