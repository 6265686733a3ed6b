#!/bin/bash
# Phase H (round-2 fourth session, after phase G's bench A/B + ablation):
# the imitation lever now uses the device-resident fused path
# (CARLAgentConfig.expert_rollout) after the file-based probe stalled in
# jax.device_get + npz compression on the 1-vCPU host.  Order: validate the
# fused code on CPU first, then cheap TPU validation, then the lever, then
# the sweeps.  finalize (which also refreshes the charts) runs after every
# sweep so an abrupt end still captures results.
set -u
cd /root/repo
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 04:00" +%s)}

have_time() { [ "$(date -u +%s)" -lt $((DEADLINE - ${1:-0})) ]; }
cool() { local rc=$1; [ "$rc" -ne 0 ] && sleep 300 || sleep 60; }
fin() { python evaluation/finalize.py >> logs/r2-finalize.log 2>&1; \
        echo "=== $(date -u +%H:%M:%S) finalize rc=$? ==="; }

echo "=== $(date -u +%H:%M:%S) phase H start (deadline $(date -u -d @$DEADLINE +%H:%M)) ==="

# 1. CPU validation of the fused imitation path (TPU idle; serialized)
timeout 1800 python -m pytest tests/test_curriculum.py -x -q \
  -k "fused or expert_rollout" > logs/r2-fused-tests.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) fused CPU tests rc=$rc ==="
tail -2 logs/r2-fused-tests.log
if [ $rc -ne 0 ]; then
  echo "=== fused tests FAILED — skipping probe/chain, straight to sweeps ==="
  FUSED_OK=0
else
  FUSED_OK=1
fi

timeout 1800 python scripts/imitation_probe.py --tiny \
  > logs/r2-probe-tiny2.log 2>&1
rc=$?
echo "=== $(date -u +%H:%M:%S) tiny fused probe rc=$rc ==="
grep -h "\[gate\|\[imitate" logs/r2-probe-tiny2.log | tail -3
[ $rc -ne 0 ] && FUSED_OK=0

# 2. TPU: validate the restructured bench.py (doubles as a second HEAD
#    reading for run-to-run variance)
if have_time 1200; then
  timeout 2400 python bench.py > logs/r2-bench-h-head2.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bench HEAD(2, new bench.py) rc=$rc ==="
  grep -h '"metric"' logs/r2-bench-h-head2.log | tail -1
  cool $rc
fi

# 3. TPU: full fused imitation probe + Town03 gate
if [ "$FUSED_OK" = "1" ] && have_time 3600; then
  timeout 7200 python scripts/imitation_probe.py > logs/r2-imitation.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) fused imitation probe rc=$rc ==="
  grep -h "\[gate\|\[imitate" logs/r2-imitation.log | tail -3
  cool $rc
fi

# 4. TPU: imitation -> RL fine-tune chain + gate
if have_time 5400 && [ -f weights/imitation-probe/params.msgpack ] \
   && grep -q '"gate"' logs/r2-imitation.log 2>/dev/null; then
  timeout 10800 python scripts/imitation_chain.py > logs/r2-chain.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) imitation chain rc=$rc ==="
  grep -h "\[gate" logs/r2-chain.log | tail -2
  cool $rc
fi

# 5. standard-sharp sweep (honest no-curriculum baseline)
if have_time 1800; then
  timeout 9000 python evaluation/sweep.py --weights stage-standard-sharp \
    > logs/r2-sweep-standard.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) standard-sharp sweep rc=$rc ==="
  fin
  cool $rc
fi

# 6. sharp s5 sweep remaining groups
if have_time 1800; then
  timeout 9000 python evaluation/sweep.py --weights stage-s5-sharp \
    >> logs/r2-sweep-sharp.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) sharp sweep rc=$rc ==="
  fin
  cool $rc
fi

# 7. imitation-rl full sweep, only if the chain produced a gate
if have_time 1800 && grep -q '"gate"' logs/r2-chain.log 2>/dev/null; then
  timeout 9000 python evaluation/sweep.py --weights imitation-rl \
    > logs/r2-sweep-imitation.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) imitation-rl sweep rc=$rc ==="
  fin
  cool $rc
fi

# 8. Town04/06 refresh for the three headline agents
for agent in stage-s5 stage-standard untrained-control; do
  if have_time 1500; then
    for f in weights/$agent/evaluation/*-Town0[46]-*.json; do
      [ -e "$f" ] && rm "$f"
    done
    timeout 4800 python evaluation/sweep.py --weights $agent \
      >> logs/r2-resweep-$agent.log 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) $agent Town04/06 refresh rc=$rc ==="
    fin
    cool $rc
  fi
done

# 9. block-rollout train A/B
if have_time 3000; then
  timeout 2700 python scripts/validate_block.py --train > logs/r2-blockab.log 2>&1
  echo "=== block A/B rc=$? ==="
  grep -h "block train" logs/r2-blockab.log | tail -2
fi

fin
echo "=== $(date -u +%H:%M:%S) phase H complete ==="
