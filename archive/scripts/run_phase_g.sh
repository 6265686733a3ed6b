#!/bin/bash
# Phase G (round-2 fourth session): takes over from phase F mid-queue (the
# phase F orchestrator is stopped; its running imitation-probe child is left
# to finish).  Re-prioritized: results that affect committed code or the
# headline evaluation.json land earliest, and finalize.py runs after EVERY
# sweep so an abrupt round end still captures progress.
#   0. wait for the already-running imitation probe (PROBE_PID)
#   1. bench A/B: HEAD vs pre-route-window parent f6f00c8 (decides whether
#      to revert b39f669 before the driver's BENCH_r02 capture)
#   2. standard-sharp 48-scenario sweep + finalize   (honest no-curriculum
#      baseline: VERDICT Weak #4)
#   3. imitation -> RL fine-tune chain + Town03 gate (collision-gap lever)
#   4. sharp s5 sweep remaining groups + finalize
#   5. imitation-rl 48-scenario sweep (only if its gate JSON exists) + finalize
#   6. Town04/06 scenario refresh for the three headline agents + finalize
#   7. block-rollout train A/B
# Every TPU step is serialized (1-vCPU host: concurrency starves dispatch),
# timeout-bounded, and restartable.
set -u
cd /root/repo
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 04:00" +%s)}
PROBE_PID=${PROBE_PID:-0}

have_time() { [ "$(date -u +%s)" -lt $((DEADLINE - ${1:-0})) ]; }
cool() { local rc=$1; [ "$rc" -ne 0 ] && sleep 300 || sleep 60; }
fin() { python evaluation/finalize.py >> logs/r2-finalize.log 2>&1; \
        echo "=== $(date -u +%H:%M:%S) finalize rc=$? ==="; }

echo "=== $(date -u +%H:%M:%S) phase G start (deadline $(date -u -d @$DEADLINE +%H:%M), probe pid $PROBE_PID) ==="

# 0. wait for the in-flight imitation probe
if [ "$PROBE_PID" -gt 0 ]; then
  while kill -0 "$PROBE_PID" 2>/dev/null; do sleep 60; done
  echo "=== $(date -u +%H:%M:%S) imitation probe finished ==="
  grep -h "\[gate\|\[collect\|\[imitate" logs/r2-imitation.log | tail -8
  sleep 60
fi

# 1. bench A/B (HEAD vs f6f00c8) — ~10 min each with a warm compile cache
if have_time 1200; then
  timeout 2400 python bench.py > logs/r2-bench-g-head.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bench HEAD rc=$rc ==="
  grep -h '"metric"' logs/r2-bench-g-head.log | tail -1
  cool $rc
fi
if have_time 1200; then
  git worktree add -f .abwt f6f00c8 >/dev/null 2>&1
  (cd .abwt && timeout 2400 python bench.py) > logs/r2-bench-g-parent.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bench parent(f6f00c8) rc=$rc ==="
  grep -h '"metric"' logs/r2-bench-g-parent.log | tail -1
  cool $rc
fi

# 1b. physics/render ablation — directs the next perf lever (the split was
# asserted in b39f669's rationale but never captured in a surviving log)
if have_time 1800; then
  timeout 2400 python scripts/bench_profile.py > logs/r2-bench-ablation.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bench ablation rc=$rc ==="
  grep -h '"variant"\|"metric"' logs/r2-bench-ablation.log | tail -4
  cool $rc
fi

# 2. standard-sharp sweep (honest baseline)
if have_time 1800; then
  timeout 9000 python evaluation/sweep.py --weights stage-standard-sharp \
    > logs/r2-sweep-standard.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) standard-sharp sweep rc=$rc ==="
  fin
  cool $rc
fi

# 3. imitation -> RL chain (needs the probe's checkpoint)
if have_time 5400 && [ -f weights/imitation-probe/params.msgpack ] \
   && grep -q '"gate"' logs/r2-imitation.log 2>/dev/null; then
  timeout 10800 python scripts/imitation_chain.py > logs/r2-chain.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) imitation chain rc=$rc ==="
  grep -h "\[gate" logs/r2-chain.log | tail -2
  cool $rc
fi

# 4. sharp s5 sweep remaining groups
if have_time 1800; then
  timeout 9000 python evaluation/sweep.py --weights stage-s5-sharp \
    >> logs/r2-sweep-sharp.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) sharp sweep rc=$rc ==="
  fin
  cool $rc
fi

# 5. imitation-rl full sweep, only if the chain produced a gate
if have_time 1800 && grep -q '"gate"' logs/r2-chain.log 2>/dev/null; then
  timeout 9000 python evaluation/sweep.py --weights imitation-rl \
    > logs/r2-sweep-imitation.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) imitation-rl sweep rc=$rc ==="
  fin
  cool $rc
fi

# 6. Town04/06 refresh for the three headline agents
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

# 7. block-rollout train A/B
if have_time 3000; then
  timeout 2700 python scripts/validate_block.py --train > logs/r2-blockab.log 2>&1
  echo "=== block A/B rc=$? ==="
  grep -h "block train" logs/r2-blockab.log | tail -2
fi

fin
echo "=== $(date -u +%H:%M:%S) phase G complete ==="
