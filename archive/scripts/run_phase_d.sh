#!/bin/bash
# Phase D (round-2 tail, reordered from phases B/C): after the running
# standard-sharp training finishes, spend the remaining TPU time in value
# order:
#   1. bench check (validates this round's kernel changes + reproducibility)
#   2. imitation warm-start probe (the remaining collision-gap lever)
#   3. 48-scenario sweep of the functioning standard baseline
#   4. Town04/06 scenario refresh for the three headline agents (those
#      towns became multi-lane this round, so their old single-lane
#      scenario JSONs no longer describe the current protocol)
#   5. sharp-curriculum sweep (remaining groups)  [deadline-gated]
#   6. finalize evaluation.json (CPU, always runs)
# Every TPU step is deadline-gated so nothing holds the chip at round end.
set -u
cd /root/repo
TRAIN_PID=${TRAIN_PID:-29670}
DEADLINE=$(date -u -d "18:50" +%s)

have_time() { [ "$(date -u +%s)" -lt $((DEADLINE - ${1:-0})) ]; }

echo "=== $(date -u +%H:%M:%S) phase D: waiting for trainer pid $TRAIN_PID ==="
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 60; done
echo "=== $(date -u +%H:%M:%S) trainer done ==="
sleep 60

if have_time; then
  timeout 900 python bench.py > logs/r2-bench-check.log 2>&1
  echo "=== bench rc=$? $(tail -1 logs/r2-bench-check.log | cut -c1-200) ==="
fi

if have_time; then
  timeout 900 python scripts/bench_profile.py > logs/r2-bench-ablation.log 2>&1
  echo "=== bench ablation rc=$? ==="
  grep -h '"metric"' logs/r2-bench-ablation.log | tail -4
fi

if have_time 3600; then
  timeout 4800 python scripts/imitation_probe.py > logs/r2-imitation.log 2>&1
  echo "=== imitation probe rc=$? ==="
  grep -h "\[gate" logs/r2-imitation.log | tail -2
fi

if have_time 1800; then
  timeout 4500 python evaluation/sweep.py --weights stage-standard-sharp \
    > logs/r2-sweep-standard.log 2>&1
  echo "=== $(date -u +%H:%M:%S) standard sweep rc=$? ==="
fi

for agent in stage-s5 stage-standard untrained-control; do
  if have_time 900; then
    for f in weights/$agent/evaluation/*-Town0[46]-*.json; do
      [ -e "$f" ] && rm "$f"
    done
    timeout 2400 python evaluation/sweep.py --weights $agent \
      >> logs/r2-resweep-$agent.log 2>&1
    echo "=== $(date -u +%H:%M:%S) $agent Town04/06 refresh rc=$? ==="
  fi
done

if have_time 1800; then
  timeout 3600 python evaluation/sweep.py --weights stage-s5-sharp \
    >> logs/r2-sweep-sharp.log 2>&1
  echo "=== $(date -u +%H:%M:%S) sharp sweep rc=$? ==="
fi

if have_time 3000; then
  timeout 2700 python scripts/validate_block.py --train > logs/r2-blockab.log 2>&1
  echo "=== block A/B rc=$? ==="
  grep -h "block train" logs/r2-blockab.log | tail -2
fi

python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== $(date -u +%H:%M:%S) finalize rc=$? ==="
echo "=== $(date -u +%H:%M:%S) phase D complete ==="
