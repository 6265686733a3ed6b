#!/bin/bash
# Round-4 fast-trainer gate A/B (VERDICT item 1): the full sharp curriculum
# (s1..s5, epochs 30,16,12,10,10 — the same budget the shipped safe-s5 chain
# trained with) plus the 14-epoch safety fine-tune, trained end-to-end with
# FAST_TRAIN (fused_update + bfloat16 + chunked dispatch), into weights-fast/.
# Quality gate: safety_finetune's Town03 no/dense gate vs the recorded
# slow-config safe-s5 gate (collision 0.26 / 0.48).  Also yields the measured
# end-to-end curriculum wall-clock for README (BASELINE.md <1h target).
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
