#!/bin/bash
# Phase C (after phase B): bench verification of the kernel change, the
# imitation-warm-start probe, and the block-rollout train A/B.  Each step
# is skipped if past the deadline so nothing holds the TPU at round end.
set -u
cd /root/repo
DEADLINE=${DEADLINE:-$(date -u -d "19:05" +%s)}

have_time() { [ "$(date -u +%s)" -lt "$DEADLINE" ]; }

echo "=== $(date -u +%H:%M:%S) phase C start ==="
if have_time; then
  timeout 900 python bench.py > logs/r2-bench-check.log 2>&1
  echo "=== bench rc=$? $(tail -1 logs/r2-bench-check.log | cut -c1-200) ==="
fi
if have_time; then
  timeout 4500 python scripts/imitation_probe.py > logs/r2-imitation.log 2>&1
  echo "=== imitation probe rc=$? ==="
  grep -h "\[gate" logs/r2-imitation.log | tail -2
fi
if have_time; then
  timeout 2700 python scripts/validate_block.py --train > logs/r2-blockab.log 2>&1
  echo "=== block A/B rc=$? ==="
  grep -h "block train" logs/r2-blockab.log | tail -2
fi
echo "=== $(date -u +%H:%M:%S) phase C complete ==="
