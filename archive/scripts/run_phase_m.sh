#!/bin/bash
# Phase M (next session after the r2s3 safety fine-tune): finish whatever
# the session cutoff interrupted, then spend remaining time on sweeps.
# One TPU program at a time (single-vCPU host — never overlap with pytest).
#
# State on entry (r2s3 results, check weights/*/evaluation JSONs):
#   * safe-s5 v1 (divisor=5, cap=15, 12 ep): gate 0.94/4168 @ 16.8 km/h —
#     FAILED; archived at weights/safe-s5-v1. Penalty scaling doesn't
#     deter (forfeited future reward already dwarfs it); the agent also
#     cruises ABOVE the reward cap since over-speed isn't negative.
#   * safe-s5 v2 (divisor=1, cap=8, 16 ep) ran at session end — check its
#     gate in weights/safe-s5/evaluation/ (log was logs/r2s3-safe-v2.log,
#     wiped by the snapshot; the eval JSONs survive via git).
#   * NEW knob available: speed_over_cap_penalty (world.py; CLI --over-cap)
#     makes over-speed actively negative. v3 recipe if v2 failed:
#       python scripts/safety_finetune.py --epochs 16 --divisor 1 --cap 8 \
#           --over-cap 3
#   * A full train(16ep)+gate cycle is ~25 min wall on the chip (measured);
#     fresh compile included. Iterate, don't wait.
# FIRST (CPU, before any TPU program): python -m pytest tests/test_world.py -q
set -u
cd /root/repo

GATE_JSON=weights/safe-s5/evaluation/safe-s5-train-512-50-Town03-no-42.json
if [ ! -f "$GATE_JSON" ]; then
  echo "=== $(date -u +%H:%M:%S) safe-s5 gate (resume after cutoff) ==="
  timeout 5400 python scripts/safety_finetune.py --skip-train \
    > logs/r2s4-safe-gate.log 2>&1
  echo "=== gate rc=$? ==="
  grep -ha '\[gate' logs/r2s4-safe-gate.log | tail -2
  sleep 60
fi

GATE_OK=$(python - <<'P'
import json
try:
    g = json.load(open("weights/safe-s5/evaluation/"
                       "safe-s5-train-512-50-Town03-no-42.json"))
    ok = (g["collision_rate_mean"] <= 0.72
          and g["total_reward_mean"] >= 1500)
    print("yes" if ok else "no")
except Exception:
    print("no")
P
)
echo "=== safe-s5 gate ok: $GATE_OK ==="

if [ "$GATE_OK" = "yes" ] && [ ! -f weights/safe-s5/evaluation/.swept ]; then
  timeout 10800 python evaluation/sweep.py --weights safe-s5 \
    > logs/r2s4-sweep-safe.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) safe-s5 sweep rc=$rc ==="
  [ $rc -eq 0 ] && touch weights/safe-s5/evaluation/.swept
  python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
  echo "=== finalize rc=$? ==="
fi

# If the gate failed: next knob is a stronger divisor / lower cap from the
# same endpoint (cheap — program already compiled):
#   python scripts/safety_finetune.py --epochs 8 --divisor 2 --cap 12
# then gate again.  After that, probe v4 (fixed log-space ratio clamp):
sleep 60
if [ ! -d weights/imitation-probe-v4 ]; then
  echo "=== $(date -u +%H:%M:%S) imitation probe v4 ==="
  timeout 9000 python scripts/imitation_probe.py --updates 120 \
    --name imitation-probe-v4 --mix normal,aggressive,aggressive \
    > logs/r2s4-probe-v4.log 2>&1
  echo "=== probe v4 rc=$? ==="
  grep -ha '\[gate\|\[imitate' logs/r2s4-probe-v4.log | tail -3
fi
echo "=== $(date -u +%H:%M:%S) phase M complete ==="
