#!/bin/bash
# Phase E (round-2 second session; machine restarted before phase D ran).
# Serialized TPU queue, deadline-gated; every step is restartable:
#   1. imitation warm-start probe (the remaining collision-gap lever;
#      its gate decides whether an imitation->RL chain is worth training)
#   2. 48-scenario sweep of the functioning standard baseline
#   3. remaining sharp-curriculum sweep groups
#   4. Town04/06 scenario refresh for the three headline agents
#   5. block-rollout train A/B
#   6. finalize evaluation.json (CPU, always runs)
set -u
cd /root/repo
DEADLINE=${DEADLINE:-$(date -u -d "tomorrow 04:00" +%s)}

have_time() { [ "$(date -u +%s)" -lt $((DEADLINE - ${1:-0})) ]; }

echo "=== $(date -u +%H:%M:%S) phase E start (deadline $(date -u -d @$DEADLINE +%H:%M)) ==="

if have_time 3600; then
  timeout 7200 python scripts/imitation_probe.py > logs/r2-imitation.log 2>&1
  echo "=== $(date -u +%H:%M:%S) imitation probe rc=$? ==="
  grep -h "\[gate" logs/r2-imitation.log | tail -2
fi
sleep 30

if have_time 1800; then
  timeout 7200 python evaluation/sweep.py --weights stage-standard-sharp \
    > logs/r2-sweep-standard.log 2>&1
  echo "=== $(date -u +%H:%M:%S) standard-sharp sweep rc=$? ==="
fi
sleep 30

if have_time 1800; then
  timeout 7200 python evaluation/sweep.py --weights stage-s5-sharp \
    >> logs/r2-sweep-sharp.log 2>&1
  echo "=== $(date -u +%H:%M:%S) sharp sweep rc=$? ==="
fi
sleep 30

for agent in stage-s5 stage-standard untrained-control; do
  if have_time 1200; then
    for f in weights/$agent/evaluation/*-Town0[46]-*.json; do
      [ -e "$f" ] && rm "$f"
    done
    timeout 4800 python evaluation/sweep.py --weights $agent \
      >> logs/r2-resweep-$agent.log 2>&1
    echo "=== $(date -u +%H:%M:%S) $agent Town04/06 refresh rc=$? ==="
  fi
done

if have_time 3000; then
  timeout 2700 python scripts/validate_block.py --train > logs/r2-blockab.log 2>&1
  echo "=== block A/B rc=$? ==="
  grep -h "block train" logs/r2-blockab.log | tail -2
fi

python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== $(date -u +%H:%M:%S) finalize rc=$? ==="
echo "=== $(date -u +%H:%M:%S) phase E complete ==="
