#!/bin/bash
# Round-close gate — the executable form of the protocol documented in
# PLANS.md ("Round-N bench + gate adjudication"):
#
#   1. full test suite green;
#   2. every registered query green against the DuckDB oracle at
#      sf0.01 (the driver's correctness gate, run locally);
#   3. a fresh median-of-3 bench at sf0.1, gated by bench_diff
#      against the last committed artifact at 1.5x.
#
# A nonzero exit from any step blocks the artifact refresh. bench_diff
# flags are a STOP-AND-ADJUDICATE signal, not an auto-fail: per the
# protocol, compare complete runs (non-overlapping flag sets across
# runs = box noise) and write the adjudication in PLANS.md either way.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 test suite =="
sbt -batch test 2>&1 | grep -E "Tests: |All tests|TEST FAILED"

echo "== 2/3 oracle sweep (sf0.01) =="
out=$(mktemp -d)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out" > /dev/null 2>&1
summary=$(python3 tools/oracle_check.py /root/testdata/sf0.01 "$out" | tail -1)
echo "$summary"
grep -q " 0 failed" <<< "$summary"

echo "== 3/3 bench + gate (sf0.1, median of 3) =="
cp BENCH_FULL.json /tmp/bench_prev_gate.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /dev/null 2>&1
python3 tools/bench_diff.py /tmp/bench_prev_gate.json BENCH_FULL.json \
  --threshold 1.5

echo "round close: all gates green"
