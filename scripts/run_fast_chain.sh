#!/bin/bash
# FULL-CHAIN quality gate for the current main.FAST_TRAIN config: the full
# sharp curriculum (s1..s5, epochs 30,16,12,10,10 — the same budget the
# shipped safe-s5 chain trained with) plus the 14-epoch safety fine-tune,
# into weights-fast/.  Gate: safety_finetune's Town03 no/dense collision vs
# the recorded sequential-config safe-s5 gate (0.26 / 0.48).  Round-4
# history: this gate REJECTED fused+bf16 (0.90/1.0/1.0) and then fused-f32
# (0.94/1.0/1.0) — any future FAST_TRAIN candidate must pass HERE, not just
# a 14-epoch fine-tune probe (those read near-clean for fused-f32).
set -e
cd "$(dirname "$0")/.."
mkdir -p logs
T0=$(date +%s)
python main.py --curriculum --epochs 30,16,12,10,10 --sharp \
  --weights-dir weights-fast 2>&1 | tee logs/r4-fast-curriculum.log
T1=$(date +%s)
echo "CURRICULUM_WALL_S $((T1-T0))" | tee -a logs/r4-fast-chain.log
rm -rf weights/stage-s5-fast
cp -r weights-fast/stage-s5 weights/stage-s5-fast
rm -f weights/stage-s5-fast/.train.lock weights/stage-s5-fast/.train.lock
python scripts/safety_finetune.py --epochs 14 --source stage-s5-fast \
  --name safe-fast 2>&1 | tee logs/r4-fast-finetune.log
T2=$(date +%s)
echo "FINETUNE_WALL_S $((T2-T1))" | tee -a logs/r4-fast-chain.log
echo "TOTAL_WALL_S $((T2-T0))" | tee -a logs/r4-fast-chain.log
