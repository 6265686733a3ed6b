#!/bin/bash
# Phase K (round-2 session-2): after the imitation-probe-v2 train+gate —
#   1. pick the better probe (v2 unless it regresses v1 on the Town03/no
#      gate, same rule as phase J),
#   2. RL fine-tune with per-epoch snapshot gating (imitation_finetune.py:
#      regular traffic, 10 epochs, auto-picks the best snapshot into
#      weights/imitation-final and gates it no+dense),
#   3. fine-grained bench ablation (bench_parts.py — fast, informs the
#      env-step optimization pass while the sweep runs),
#   4. full 48-scenario sweep of imitation-final + finalize.
# Serialized, one TPU process at a time; kills nothing.
set -u
cd /root/repo
PROBE_PID=${1:?probe v2 python pid}

while kill -0 "$PROBE_PID" 2>/dev/null; do sleep 20; done
echo "=== $(date -u +%H:%M:%S) probe v2 done ==="
grep -h "\[gate\|\[imitate" logs/r2s2-probe-v2.log | tail -3
sleep 60

PICK=$(python - <<'P'
import json
def gate(name, traffic):
    f = f"weights/{name}/evaluation/{name}-train-512-50-Town03-{traffic}-42.json"
    try:
        return json.load(open(f))
    except Exception:
        return None
v1, v2 = gate("imitation-probe", "no"), gate("imitation-probe-v2", "no")
if v2 is None:
    print("imitation-probe"); raise SystemExit
worse_coll = v2["collision_rate_mean"] > v1["collision_rate_mean"] + 0.08
worse_rew = v2["total_reward_mean"] < 0.8 * v1["total_reward_mean"]
print("imitation-probe" if (worse_coll or worse_rew) else "imitation-probe-v2")
P
)
echo "=== fine-tune source: $PICK ==="

# ablation first: 10 minutes of TPU buys the optimization pass a 4-hour
# head start while the fine-tune + sweep occupy the chip
timeout 1800 python scripts/bench_parts.py > logs/r2s2-bench-parts.log 2>&1
echo "=== $(date -u +%H:%M:%S) bench_parts rc=$? ==="
grep -h '"summary"' logs/r2s2-bench-parts.log | tail -1
sleep 60

timeout 10800 python scripts/imitation_finetune.py --src "$PICK" \
  > logs/r2s2-finetune.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) finetune rc=$rc ==="
grep -h "\[gate\|\[pick" logs/r2s2-finetune.log | tail -14
sleep 60

if [ -d weights/imitation-final ]; then
  timeout 10800 python evaluation/sweep.py --weights imitation-final \
    > logs/r2s2-sweep-imitation.log 2>&1
  echo "=== $(date -u +%H:%M:%S) imitation-final sweep rc=$? ==="
  python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
  echo "=== $(date -u +%H:%M:%S) phase K complete (finalize rc=$?) ==="
else
  echo "=== no imitation-final — finetune failed; phase K stops ==="
fi
