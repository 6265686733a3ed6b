#!/bin/bash
# Phase M (next session after the r2s3 safety fine-tune): finish whatever
# the session cutoff interrupted, then spend remaining time on sweeps.
# One TPU program at a time (single-vCPU host — never overlap with pytest).
#
# State on entry (check, don't assume):
#   * weights/safe-s5 — per-epoch saves from scripts/safety_finetune.py
#     (12 epochs requested; config.json update_step tells how far it got).
#   * If logs/r2s3-safe-s5.log shows the gate printed, skip straight to
#     the sweep decision; else gate with --skip-train.
set -u
cd /root/repo

if ! grep -q '"gate"' logs/r2s3-safe-s5.log 2>/dev/null; then
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
