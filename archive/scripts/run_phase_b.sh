#!/bin/bash
# Phase B (after the sharp chain + gate): the functioning standard baseline
# FIRST (highest-value item — a stall must not cost us this), then the full
# sweeps. Serialized on the one TPU chip; every part is restartable
# (sweep.py skips existing scenario JSONs).
set -u
cd /root/repo

echo "=== $(date -u +%H:%M:%S) phase B start ==="

# 1. functioning no-curriculum control: sharp recipe minus curriculum,
#    390-update budget (78 epochs x 5 updates)
if [ ! -f weights/stage-standard-sharp/params.msgpack ]; then
  python main.py --standard --sharp --epochs 78 >> logs/r2-standard-sharp.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== standard-sharp failed rc=$rc; cooldown + retry ==="
    sleep 300
    python main.py --standard --sharp --epochs 78 >> logs/r2-standard-sharp.log 2>&1
  fi
fi
echo "=== $(date -u +%H:%M:%S) standard-sharp trained ==="

# 2. sweep it
python evaluation/sweep.py --weights stage-standard-sharp >> logs/r2-sweep-standard.log 2>&1
echo "=== $(date -u +%H:%M:%S) standard sweep rc=$? ==="

# 3. full 48-scenario sweep for the sharp curriculum agent
python evaluation/sweep.py --weights stage-s5-sharp >> logs/r2-sweep-sharp.log 2>&1
echo "=== $(date -u +%H:%M:%S) sharp sweep rc=$? ==="

# 4. refresh Town04/Town06 scenarios for the existing agents: those towns
#    became multi-lane this round, so their old single-lane scenario JSONs
#    no longer describe the current protocol
for agent in stage-s5 stage-standard untrained-control; do
  for f in weights/$agent/evaluation/*-Town0[46]-*.json; do
    [ -e "$f" ] && rm "$f"
  done
  python evaluation/sweep.py --weights $agent >> logs/r2-resweep-$agent.log 2>&1
  echo "=== $(date -u +%H:%M:%S) $agent Town04/06 refresh rc=$? ==="
done

# 5. rebuild the headline evaluation.json
python evaluation/finalize.py >> logs/r2-finalize.log 2>&1
echo "=== $(date -u +%H:%M:%S) phase B complete ==="
