#!/bin/bash
# Round-6 env-side A/B on the real chip: today's default-path wins (packed
# cell/route tables, zero-NPC static skips) + the three opt-in levers
# (fused Pallas physics step, scan unrolls).  Env-only (train bench
# skipped per run — see bench.py CDRL_SKIP_TRAIN_BENCH); one process at a
# time, 60 s cooldowns.  Baseline for comparison: r5 shipped 512,988
# steps/s (logs/r5-bench.log).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
run() {
  name=$1; shift
  echo "=== $name ($*) ===" | tee -a logs/r6-env-ab.log
  env "$@" CDRL_SKIP_TRAIN_BENCH=1 timeout 2400 python bench.py \
    2> >(tail -40 > "logs/r6-env-ab-$name.err") | tee -a logs/r6-env-ab.log
  echo "rc=$?" | tee -a logs/r6-env-ab.log
  sleep 60
}
run default      CDRL_DUMMY=0
run fused        CDRL_FUSED_STEP=1
run fused-unroll CDRL_FUSED_STEP=1 CDRL_PHYS_UNROLL=4 CDRL_BLOCK_UNROLL=2
run unroll       CDRL_PHYS_UNROLL=4 CDRL_BLOCK_UNROLL=2
echo "AB_DONE" | tee -a logs/r6-env-ab.log
