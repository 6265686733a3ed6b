#!/bin/bash
# Round-5 FULL-CHAIN quality gate for FAST_TRAIN = dict(two_step_update=True):
# full sharp curriculum (s1..s5, 30,16,12,10,10) + 14-epoch safety fine-tune
# + Town03 no/regular/dense gate vs the sequential safe-s5 record (0.26/0.48).
set -e
cd "$(dirname "$0")/.."
mkdir -p logs
T0=$(date +%s)
python main.py --curriculum --epochs 30,16,12,10,10 --sharp \
  --weights-dir weights-fast2 2>&1 | tee logs/r5-fast2-curriculum.log
T1=$(date +%s)
echo "CURRICULUM_WALL_S $((T1-T0))" | tee -a logs/r5-fast2-chain.log
rm -rf weights/stage-s5-fast2
cp -r weights-fast2/stage-s5 weights/stage-s5-fast2
rm -f weights/stage-s5-fast2/.train.lock
python scripts/safety_finetune.py --epochs 14 --source stage-s5-fast2 \
  --name safe-fast2 2>&1 | tee logs/r5-fast2-finetune.log
T2=$(date +%s)
echo "FINETUNE_WALL_S $((T2-T1))" | tee -a logs/r5-fast2-chain.log
echo "TOTAL_WALL_S $((T2-T0))" | tee -a logs/r5-fast2-chain.log
