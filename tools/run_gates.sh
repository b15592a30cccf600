#!/bin/bash
# Standing-gate sweep: full-suite oracle compare at all three SFs plus the
# double-run determinism gate (Spark 32-vs-17 threads; DuckDB 8-vs-2
# threads) — the round-end checklist's compute half, scripted so a round
# can't ship with the recorded gates lagging the tree (round-9 VERDICT
# "What's wrong" #2).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-target/gates}
mkdir -p "$OUT"
log() { echo "[gates $(date +%H:%M:%S)] $*"; }

run_verify() { # sfdir outdir cpus
  log "Verify $1 cpus=$3 -> $2"
  SPARK_GRAFT_CPUS=$3 sbt -batch "runMain graft.Verify $1 $2" \
    > "$OUT/verify_$(basename $2).log" 2>&1
  log "Verify $1 cpus=$3 done (exit $?)"
}

run_verify /root/testdata/sf0.001 "$OUT/v001"  32
run_verify /root/testdata/sf0.01  "$OUT/v01a"  32
run_verify /root/testdata/sf0.01  "$OUT/v01b"  17
run_verify /root/testdata/sf0.1   "$OUT/v1a"   32
run_verify /root/testdata/sf0.1   "$OUT/v1b"   17

log "selfcheck sf0.001"
python3 tools/selfcheck.py /root/testdata/sf0.001 "$OUT/v001" > "$OUT/sc_001.log" 2>&1
log "selfcheck sf0.001 exit $? : $(tail -1 "$OUT/sc_001.log")"
log "selfcheck sf0.01"
python3 tools/selfcheck.py /root/testdata/sf0.01 "$OUT/v01a" > "$OUT/sc_01.log" 2>&1
log "selfcheck sf0.01 exit $? : $(tail -1 "$OUT/sc_01.log")"
log "selfcheck sf0.1"
python3 tools/selfcheck.py /root/testdata/sf0.1 "$OUT/v1a" > "$OUT/sc_1.log" 2>&1
log "selfcheck sf0.1 exit $? : $(tail -1 "$OUT/sc_1.log")"

log "determinism spark sf0.01 (32 vs 17)"
python3 tools/determinism.py spark "$OUT/v01a" "$OUT/v01b" > "$OUT/det_spark_01.log" 2>&1
log "det spark sf0.01 exit $? : $(tail -1 "$OUT/det_spark_01.log")"
log "determinism spark sf0.1 (32 vs 17)"
python3 tools/determinism.py spark "$OUT/v1a" "$OUT/v1b" > "$OUT/det_spark_1.log" 2>&1
log "det spark sf0.1 exit $? : $(tail -1 "$OUT/det_spark_1.log")"
log "determinism oracle sf0.01 (duckdb 8 vs 2)"
python3 tools/determinism.py oracle /root/testdata/sf0.01 "$OUT/v01a/oracle_sql.json" > "$OUT/det_oracle_01.log" 2>&1
log "det oracle sf0.01 exit $? : $(tail -1 "$OUT/det_oracle_01.log")"
log "determinism oracle sf0.1 (duckdb 8 vs 2)"
python3 tools/determinism.py oracle /root/testdata/sf0.1 "$OUT/v1a/oracle_sql.json" > "$OUT/det_oracle_1.log" 2>&1
log "det oracle sf0.1 exit $? : $(tail -1 "$OUT/det_oracle_1.log")"
log "ALL GATES DONE"
