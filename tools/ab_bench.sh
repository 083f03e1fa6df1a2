#!/bin/bash
# Same-window A/B adjudication of the r20 vs r21 binaries (VERDICT r21 item 1).
# Runs the full 221-query bench alternately from the r20 worktree and the r21
# tree in ONE session, with ref-retry disabled on both binaries (the r20 binary
# predates retry v2; pointing SPARK_GRAFT_BENCH_REF at a nonexistent file makes
# the r21 harness behave identically: v1 own-min retry only) so the medians are
# directly comparable raw reads. Artifacts land in bench_evidence/.
set -euo pipefail
R20=/tmp/r20wt
R21=/root/repo
OUT=/root/repo/bench_evidence
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_REF=/nonexistent-ab-no-ref

run_one() {
  local dir=$1 label=$2
  cd "$dir"
  echo "=== $label start $(date +%T) ==="
  sbt -batch "runMain graft.Bench" > "/tmp/ab_${label}.log" 2>&1
  cp "$dir/bench_out.json" "$OUT/r22_ab_${label}.json"
  tail -c 400 "/tmp/ab_${label}.log"
  echo "=== $label done $(date +%T) ==="
}

run_one "$R20" r20a
run_one "$R21" r21a
run_one "$R20" r20b
run_one "$R21" r21b
echo "AB COMPLETE"
