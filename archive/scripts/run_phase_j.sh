#!/bin/bash
# Phase J (round-2 tail): after the standard-sharp sweep —
#   1. finalize (banks the honest standard baseline),
#   2. imitation probe v2 (120 updates, faster expert mix) + Town03 gate,
#   3. sweep whichever imitation probe gates better (v2 unless it regresses
#      v1 on the no-traffic gate), finalize after.
# Serialized, one TPU process at a time; kills nothing.
set -u
cd /root/repo
SWEEP_PID=${1:?standard sweep python pid}

while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 20; done
echo "=== $(date -u +%H:%M:%S) standard-sharp sweep done ==="
python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== finalize rc=$? ==="
sleep 60

timeout 5400 python scripts/imitation_probe.py --updates 120 \
  --name imitation-probe-v2 --mix normal,aggressive,aggressive \
  > logs/r2-probe-v2.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) probe v2 rc=$rc ==="
grep -h "\[gate\|\[imitate" logs/r2-probe-v2.log | tail -3
sleep 60

# pick the sweep target: v2 unless it regresses v1 on the Town03/no gate
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
echo "=== sweep target: $PICK ==="

timeout 9000 python evaluation/sweep.py --weights "$PICK" \
  > logs/r2-sweep-imitation.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) imitation sweep ($PICK) rc=$rc ==="
python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== $(date -u +%H:%M:%S) phase J complete (finalize rc=$?) ==="
