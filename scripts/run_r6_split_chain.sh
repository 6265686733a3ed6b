#!/bin/bash
# Round-6 FULL-CHAIN quality gate for FAST_TRAIN candidate
# dict(two_step_update=True, two_step_split_adam=True): per-phase backbone
# Adam states remove the diagnosed round-5 failure mechanism (interleaved
# small-policy/large-value grads through ONE backbone Adam state pin the
# 2nd moment at value scale, muting policy steps — the r5 two_step chain
# gated 0.80/0.90/0.88 vs sequential's 0.26/0.48).
# Full sharp curriculum (s1..s5, 30,16,12,10,10) + 14-epoch safety
# fine-tune + Town03 no/regular/dense gate.  Ship two_step only if the
# gate lands in the 0.26-0.5 band (sequential safe-s5 record: 0.26/0.48).
set -e
cd "$(dirname "$0")/.."
mkdir -p logs
T0=$(date +%s)
python main.py --curriculum --epochs 30,16,12,10,10 --sharp \
  --probe-cfg '{"two_step_split_adam": true}' \
  --weights-dir weights-split 2>&1 | tee logs/r6-split-curriculum.log
T1=$(date +%s)
echo "CURRICULUM_WALL_S $((T1-T0))" | tee -a logs/r6-split-chain.log
rm -rf weights/stage-s5-split
cp -r weights-split/stage-s5 weights/stage-s5-split
rm -f weights/stage-s5-split/.train.lock
python scripts/safety_finetune.py --epochs 14 --source stage-s5-split \
  --name safe-split --two-step-split 2>&1 | tee logs/r6-split-finetune.log
T2=$(date +%s)
echo "FINETUNE_WALL_S $((T2-T1))" | tee -a logs/r6-split-chain.log
echo "TOTAL_WALL_S $((T2-T0))" | tee -a logs/r6-split-chain.log
