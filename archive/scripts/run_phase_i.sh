#!/bin/bash
# Phase I (round-2 tail, after phase H's imitation lever + sweeps): the
# consolidation pass — full CPU test suite, bf16 train A/B (CPU numerics
# smoke first, then on-chip), profiler trace of the env-step chunk, final
# finalize.  Everything serialized (1 vCPU host); TPU steps one at a time.
set -u
cd /root/repo
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 04:30" +%s)}

have_time() { [ "$(date -u +%s)" -lt $((DEADLINE - ${1:-0})) ]; }
cool() { local rc=$1; [ "$rc" -ne 0 ] && sleep 300 || sleep 60; }

echo "=== $(date -u +%H:%M:%S) phase I start ==="

# 1. full CPU test suite (TPU idle by now)
if have_time 2400; then
  timeout 2400 python -m pytest tests/ -q > logs/r2-pytest-final.log 2>&1
  echo "=== $(date -u +%H:%M:%S) pytest rc=$? ==="
  tail -2 logs/r2-pytest-final.log
fi

# 2. bf16 numerics smoke on CPU, then the on-chip A/B
if have_time 1800; then
  timeout 1200 python scripts/bench_bf16.py --tiny > logs/r2-bf16-tiny.log 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) bf16 CPU smoke rc=$rc ==="
  tail -2 logs/r2-bf16-tiny.log
  if [ $rc -eq 0 ] && ! grep -q '"bf16_nan": true' logs/r2-bf16-tiny.log; then
    timeout 3600 python scripts/bench_bf16.py > logs/r2-bf16-ab.log 2>&1
    echo "=== $(date -u +%H:%M:%S) bf16 on-chip A/B rc=$? ==="
    grep -h '"summary"\|"variant"' logs/r2-bf16-ab.log | tail -3
    cool 0
  fi
fi

# 3. profiler trace of the env chunk (for next-round perf work)
if have_time 1500; then
  timeout 1800 python scripts/bench_profile.py --trace \
    > logs/r2-trace.log 2>&1
  echo "=== $(date -u +%H:%M:%S) profile trace rc=$? ==="
  grep -h '"summary"' logs/r2-trace.log | tail -1
  cool 0
fi

# 4. final finalize (charts + evaluation.json)
python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== $(date -u +%H:%M:%S) phase I complete (finalize rc=$?) ==="
