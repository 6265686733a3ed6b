#!/bin/bash
# Phase K2: after imitation_finetune.py picks weights/imitation-final —
# sweep it across the 48-scenario protocol IF its Town03/no gate clears a
# sanity bar (collision <= 0.72 AND reward >= 1500 — the reference
# curriculum scores 0.80/3024 on this very gate, so anything weaker is not
# worth 2.5 h of chip time), then finalize. Afterwards re-run the parts ablation and
# three bench.py readings with the round-trip-amortized timing.
set -u
cd /root/repo
FT_PID=${1:?finetune python pid}

while kill -0 "$FT_PID" 2>/dev/null; do sleep 30; done
echo "=== $(date -u +%H:%M:%S) finetune done ==="
sleep 60

GO=$(python - <<'P'
import json
try:
    f = ("weights/imitation-final/evaluation/"
         "imitation-final-train-512-50-Town03-no-42.json")
    d = json.load(open(f))
    ok = d["collision_rate_mean"] <= 0.72 and d["total_reward_mean"] >= 1500
    print("yes" if ok else "no")
except Exception as e:
    print("no")
P
)
echo "=== sweep imitation-final? $GO ==="

if [ "$GO" = "yes" ]; then
  timeout 10800 python evaluation/sweep.py --weights imitation-final \
    > logs/r2s2-sweep-imitation.log 2>&1
  echo "=== $(date -u +%H:%M:%S) imitation-final sweep rc=$? ==="
  python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
  echo "=== finalize rc=$? ==="
  sleep 60
fi

timeout 2400 python scripts/bench_parts.py > logs/r2s2-bench-parts2.log 2>&1
echo "=== $(date -u +%H:%M:%S) bench_parts2 rc=$? ==="
grep -h '"summary"' logs/r2s2-bench-parts2.log | tail -1
sleep 60

for i in 1 2 3; do
  timeout 1800 python bench.py > logs/r2s2-bench-$i.log 2>&1
  echo "=== bench $i rc=$? ==="
  grep -h '"metric"' logs/r2s2-bench-$i.log | tail -1
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) phase K2 complete ==="
