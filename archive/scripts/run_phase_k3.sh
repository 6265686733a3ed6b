#!/bin/bash
# Phase K3: imitation probe v3 — the ratio-clamp rerun (CARLAgentConfig.
# ratio_clamp=20 fixes the inf-zeroed minibatches that dropped braking
# lessons from v1/v2) — then gate, then sweep the best imitation candidate
# so far if it clears the reference-calibrated bar (Town03/no collision
# <= 0.72 AND reward >= 1500; reference curriculum: 0.80/3024 on this gate).
# Takes the pid of the preceding TPU job (phase K2 shell) to wait on.
set -u
cd /root/repo
PREV_PID=${1:?previous TPU pipeline pid}

while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "=== $(date -u +%H:%M:%S) previous pipeline done; probe v3 starts ==="
sleep 60

timeout 7200 python scripts/imitation_probe.py --updates 120 \
  --name imitation-probe-v3 --mix normal,aggressive,aggressive \
  > logs/r2s2-probe-v3.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) probe v3 rc=$rc ==="
grep -ha "\[gate\|\[imitate" logs/r2s2-probe-v3.log | tail -3
sleep 60

PICK=$(python - <<'P'
import json, os
def gate(name):
    f = f"weights/{name}/evaluation/{name}-train-512-50-Town03-no-42.json"
    try:
        return json.load(open(f))
    except Exception:
        return None
best, best_key = None, None
for name in ("imitation-probe-v3", "imitation-final", "imitation-probe"):
    g = gate(name)
    if g is None:
        continue
    if not (g["collision_rate_mean"] <= 0.72
            and g["total_reward_mean"] >= 1500):
        continue
    key = (-g["total_reward_mean"])
    if best is None or key < best_key:
        best, best_key = name, key
print(best or "none")
P
)
echo "=== sweep candidate: $PICK ==="

if [ "$PICK" != "none" ] && [ ! -f "weights/$PICK/evaluation/.swept" ]; then
  timeout 10800 python evaluation/sweep.py --weights "$PICK" \
    > logs/r2s2-sweep-imitation.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) $PICK sweep rc=$rc ==="
  [ $rc -eq 0 ] && touch "weights/$PICK/evaluation/.swept"
  python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
  echo "=== finalize rc=$? ==="
fi
echo "=== $(date -u +%H:%M:%S) phase K3 complete ==="
