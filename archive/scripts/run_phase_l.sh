#!/bin/bash
# Phase L: planar-storage bench reading, then the safety fine-tune
# (scripts/safety_finetune.py — off-road penalty x20, reward speed cap
# 15 km/h, sharp hypers, from the stage-s5-sharp endpoint), then gate,
# then the 48-scenario sweep if the gate clears the reference-calibrated
# bar (Town03/no collision <= 0.72 AND reward >= 1500; reference
# curriculum gates 0.80/3024 here).  One TPU program at a time; the host
# has a single vCPU — never overlap with pytest.
set -u
cd /root/repo

echo "=== $(date -u +%H:%M:%S) phase L: bench (planar storage) ==="
timeout 2400 python bench.py > logs/r2s3-bench-planar.log 2>&1
echo "=== bench rc=$? ==="
grep -h '"metric"' logs/r2s3-bench-planar.log | tail -2
sleep 60

echo "=== $(date -u +%H:%M:%S) safety fine-tune starts ==="
timeout 10800 python scripts/safety_finetune.py --epochs 14 \
  > logs/r2s3-safe-s5.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) safety fine-tune rc=$rc ==="
grep -ha "\[gate\|\[stage" logs/r2s3-safe-s5.log | tail -4
sleep 60

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
    > logs/r2s3-sweep-safe.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) safe-s5 sweep rc=$rc ==="
  [ $rc -eq 0 ] && touch weights/safe-s5/evaluation/.swept
  python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
  echo "=== finalize rc=$? ==="
fi

# ---- probe v4: the v3 rerun with the FIXED log-space ratio clamp --------
# v3 ran with min(exp(x), c): finite loss but 0*inf = NaN gradients on the
# clamped (deep-tail braking) samples, so the NaN-safe clip still zeroed
# those minibatches — the exact silent drop the clamp was meant to fix.
# Gate verdict v3: coll 1.0 (drives fast, never brakes/recovers).
sleep 60
echo "=== $(date -u +%H:%M:%S) imitation probe v4 starts ==="
timeout 9000 python scripts/imitation_probe.py --updates 120 \
  --name imitation-probe-v4 --mix normal,aggressive,aggressive \
  > logs/r2s3-probe-v4.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) probe v4 rc=$rc ==="
grep -ha "\[gate\|\[imitate" logs/r2s3-probe-v4.log | tail -3

V4_OK=$(python - <<'P'
import json
try:
    g = json.load(open("weights/imitation-probe-v4/evaluation/"
                       "imitation-probe-v4-train-512-50-Town03-no-42.json"))
    ok = (g["collision_rate_mean"] <= 0.72
          and g["total_reward_mean"] >= 1500)
    print("yes" if ok else "no")
except Exception:
    print("no")
P
)
echo "=== probe v4 gate ok: $V4_OK ==="
if [ "$V4_OK" = "yes" ] && [ ! -f weights/imitation-probe-v4/evaluation/.swept ]; then
  timeout 10800 python evaluation/sweep.py --weights imitation-probe-v4 \
    > logs/r2s3-sweep-v4.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) v4 sweep rc=$rc ==="
  [ $rc -eq 0 ] && touch weights/imitation-probe-v4/evaluation/.swept
  python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
fi
echo "=== $(date -u +%H:%M:%S) phase L complete ==="
