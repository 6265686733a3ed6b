#!/bin/bash
# Round-5 post-chain pipeline: wait for the safe-from-s1 curriculum trainer
# (pid $1) to exit, then keep the TPU busy unattended:
#   1. Town03 gate (no/regular/dense, 50 trials) of the chain endpoint
#   2. on-chip probes of the halo-tiled fused ShuffleUnit kernels at the
#      real stage-2 geometry (each in its own process — a wedged Mosaic
#      program must not poison the next)
# Logs: logs/r5-safechain-gate.log, logs/r5-punit-halo.log
set -u
PID=${1:?usage: run_r5_post_chain.sh <trainer-pid>}
cd "$(dirname "$0")/.."

while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[post-chain $(date +%H:%M:%S)] trainer $PID exited" | tee -a logs/r5-post-chain.log
sleep 120   # let the worker settle between programs

# ---- 1. gate the chain endpoint ----
if [ -d weights-safechain/stage-s5 ]; then
  rm -rf weights/safe-chain
  cp -r weights-safechain/stage-s5 weights/safe-chain
  rm -f weights/safe-chain/.train.lock
  timeout 5400 python - <<'PY' > logs/r5-safechain-gate.log 2>&1
import json
from carla_driving_rl_agent_tpu.curriculum import stages as learning
for traffic in ("no", "regular", "dense"):
    learning.evaluate(mode="train", town="Town03", seeds=[42], traffic=traffic,
                      steps=512, trials=50, weights="safe-chain", num_envs=50)
    f = ("weights/safe-chain/evaluation/"
         f"safe-chain-train-512-50-Town03-{traffic}-42.json")
    d = json.load(open(f))
    keys = ("collision_rate_mean", "total_reward_mean", "speed_mean",
            "similarity_mean", "timesteps_mean")
    print(f"[gate {traffic}]", {k: round(d[k], 3) for k in keys if k in d},
          flush=True)
PY
  echo "[post-chain $(date +%H:%M:%S)] gate done (rc=$?)" | tee -a logs/r5-post-chain.log
  grep "\[gate" logs/r5-safechain-gate.log | tee -a logs/r5-post-chain.log
fi
sleep 120

# ---- 2. halo punit probes at the stage-2 geometry ----
for what in infer train bwd; do
  echo "[post-chain $(date +%H:%M:%S)] probe $what (stage-2 halo)" | tee -a logs/r5-post-chain.log
  timeout 2400 python scripts/probe_punit_kernel.py --what "$what" \
    --n 64 --hw 23 90 --c 48 >> logs/r5-punit-halo.log 2>&1
  echo "[post-chain $(date +%H:%M:%S)] probe $what rc=$?" | tee -a logs/r5-post-chain.log
  sleep 60
done
echo "[post-chain $(date +%H:%M:%S)] ALL DONE" | tee -a logs/r5-post-chain.log
