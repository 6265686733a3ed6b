#!/bin/bash
# Round-4 measurement queue: waits for the fast chain (pid in /tmp/chain.pid,
# a bash wrapping main.py --curriculum + safety_finetune) to exit, then runs
# the TPU measurement jobs SERIALLY (1-vCPU host + remote worker: one TPU
# program at a time, CLAUDE.md):
#   1. smoke_shuffle_fused_tpu  — first real-TPU compile of the fused Pallas
#      ShuffleUnit (fast Mosaic-rejection check before the expensive A/B)
#   2. bench_parts              — fresh env part costs incl. the physics
#      splits (npc/offroad/routewin/dyn/rng), post fetch-fix
#   3. bench_train_ab           — fused-f32 (shipped) vs fused-f32-punit
# Each step is bounded; a wedged worker can't hold the queue forever.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

CHAIN_PID=$(cat /tmp/chain.pid 2>/dev/null || echo "")
if [ -n "$CHAIN_PID" ]; then
  echo "[queue] waiting for chain pid $CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 20; done
  echo "[queue] chain exited at $(date +%H:%M:%S)"
fi
sleep 60   # worker cooldown between programs (CLAUDE.md crash hygiene)

echo "[queue] 1/3 smoke_shuffle_fused_tpu"
timeout 1200 python scripts/smoke_shuffle_fused_tpu.py \
  > logs/r4-smoke-punit-tpu.log 2>&1
echo "[queue] smoke rc=$? ($(date +%H:%M:%S))"
sleep 60

echo "[queue] 2/3 bench_parts"
timeout 3600 python scripts/bench_parts.py > logs/r4-bench-parts.log 2>&1
echo "[queue] bench_parts rc=$? ($(date +%H:%M:%S))"
sleep 60

echo "[queue] 3/3 bench_train_ab fused-f32 vs fused-f32-punit"
timeout 5400 python scripts/bench_train_ab.py \
  --variants fused-f32,fused-f32-punit \
  > logs/r4-train-ab-punit.log 2>&1
echo "[queue] bench_train_ab rc=$? ($(date +%H:%M:%S))"
echo "[queue] DONE $(date +%H:%M:%S)"
