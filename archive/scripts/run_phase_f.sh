#!/bin/bash
# Phase F (round-2 third session; worker wedged 17:3x-18:34, recovered).
# Serialized TPU queue, deadline-gated; every step restartable:
#   0. bench health/perf check (route-window commit changed the step program)
#   1. full imitation warm-start probe (collect -> imitate -> Town03 gate)
#   2. 48-scenario sweep of the functioning standard baseline
#   3. imitation -> RL fine-tune chain + gate (the collision-gap lever)
#   4. remaining sharp-curriculum sweep groups
#   5. Town04/06 scenario refresh for the three headline agents
#   6. block-rollout train A/B
#   7. finalize evaluation.json (CPU, always runs)
set -u
cd /root/repo
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 04:00" +%s)}

have_time() { [ "$(date -u +%s)" -lt $((DEADLINE - ${1:-0})) ]; }
cool() { local rc=$1; [ "$rc" -ne 0 ] && sleep 300 || sleep 60; }

echo "=== $(date -u +%H:%M:%S) phase F start (deadline $(date -u -d @$DEADLINE +%H:%M)) ==="

if have_time 7200; then
  timeout 2400 python bench.py > logs/r2-bench-f.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bench rc=$rc ==="
  grep -h '"metric"' logs/r2-bench-f.log | tail -1
  cool $rc
fi

if have_time 5400; then
  timeout 10800 python scripts/imitation_probe.py > logs/r2-imitation.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) imitation probe rc=$rc ==="
  grep -h "\[gate" logs/r2-imitation.log | tail -2
  cool $rc
fi

if have_time 1800; then
  timeout 9000 python evaluation/sweep.py --weights stage-standard-sharp \
    > logs/r2-sweep-standard.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) standard-sharp sweep rc=$rc ==="
  cool $rc
fi

if have_time 5400 && [ -f weights/imitation-probe/params.msgpack ] \
   && grep -q '"gate"' logs/r2-imitation.log 2>/dev/null; then
  timeout 10800 python scripts/imitation_chain.py > logs/r2-chain.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) imitation chain rc=$rc ==="
  grep -h "\[gate" logs/r2-chain.log | tail -2
  cool $rc
fi

if have_time 1800; then
  timeout 9000 python evaluation/sweep.py --weights stage-s5-sharp \
    >> logs/r2-sweep-sharp.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) sharp sweep rc=$rc ==="
  cool $rc
fi

for agent in stage-s5 stage-standard untrained-control; do
  if have_time 1500; then
    for f in weights/$agent/evaluation/*-Town0[46]-*.json; do
      [ -e "$f" ] && rm "$f"
    done
    timeout 4800 python evaluation/sweep.py --weights $agent \
      >> logs/r2-resweep-$agent.log 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) $agent Town04/06 refresh rc=$rc ==="
    cool $rc
  fi
done

if have_time 3000; then
  timeout 2700 python scripts/validate_block.py --train > logs/r2-blockab.log 2>&1
  echo "=== block A/B rc=$? ==="
  grep -h "block train" logs/r2-blockab.log | tail -2
fi

python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== $(date -u +%H:%M:%S) finalize rc=$? ==="
echo "=== $(date -u +%H:%M:%S) phase F complete ==="
