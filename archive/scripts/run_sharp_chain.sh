#!/bin/bash
# Continue the sharp-v3 chain: wait for the running stage, then hand off and
# train the next stages, then gate-evaluate on Town03 no+dense.
# Each stage retries once after a 5-min worker cooldown on failure.
set -u
cd /root/repo

wait_pid() {
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

run_stage() {  # stage epochs
  local stage=$1 epochs=$2
  echo "=== $(date -u +%H:%M:%S) launching $stage ($epochs epochs) ==="
  python main.py --stage "$stage" --epochs "$epochs" --sharp \
      --weights-dir weights-sharp >> "logs/r2-$stage.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== $stage failed rc=$rc; 5-min cooldown + one retry ==="
    sleep 300
    python main.py --stage "$stage" --epochs "$epochs" --sharp \
        --weights-dir weights-sharp >> "logs/r2-$stage.log" 2>&1
    rc=$?
  fi
  return $rc
}

# 1. wait for the already-running s3 (pid in /tmp/run.pid)
if [ -f /tmp/run.pid ]; then
  echo "waiting for running stage (pid $(cat /tmp/run.pid))"
  wait_pid "$(cat /tmp/run.pid)"
fi

# s3 is (or was) the running stage; verify it produced an updated checkpoint
python - <<'EOF'
import json, sys
cfg = json.load(open("weights-sharp/stage-s3/config.json"))
step = cfg.get("update_step", 0)
print(f"s3 checkpoint update_step={step}")
sys.exit(0 if step > 310 else 1)
EOF
if [ $? -ne 0 ]; then run_stage s3 12 || exit 1; fi

python - <<'EOF'
import main
main.hand_off('s3', 's4', weights_dir='weights-sharp')
EOF
run_stage s4 10 || exit 1

python - <<'EOF'
import main
main.hand_off('s4', 's5', weights_dir='weights-sharp')
EOF
run_stage s5 10 || exit 1

# 2. archive + gate evaluation (Town03, train weather, no + dense traffic)
rm -rf weights/sharp-v3-s5 && cp -r weights-sharp/stage-s5 weights/sharp-v3-s5
rm -rf weights/stage-s5-sharp && cp -r weights-sharp/stage-s5 weights/stage-s5-sharp
echo "=== $(date -u +%H:%M:%S) gate evaluation ==="
python - >> logs/r2-gate.log 2>&1 <<'EOF'
from carla_driving_rl_agent_tpu.curriculum import stages as learning
for traffic in ("no", "dense"):
    learning.evaluate(mode="train", town="Town03", seeds=[42], traffic=traffic,
                      steps=512, trials=50, weights="stage-s5-sharp")
EOF
echo "=== $(date -u +%H:%M:%S) chain complete ==="
