#!/bin/bash
# Wait for phase G's ablation step to report, then stop phase G (it would
# start the standard sweep next; phase H re-orders the queue around the
# fused imitation lever) and launch phase H.  Kills by EXPLICIT pid only.
set -u
cd /root/repo
PGPID=${1:?phase G pid}

while ! grep -q "bench ablation rc=" logs/r2-phase-g.log 2>/dev/null; do
  # bail out if phase G died on its own
  kill -0 "$PGPID" 2>/dev/null || break
  sleep 15
done
kill "$PGPID" 2>/dev/null
sleep 2
echo "=== handover: phase G ($PGPID) stopped at $(date -u +%H:%M:%S) ==="
nohup bash scripts/run_phase_h.sh > logs/r2-phase-h.log 2>&1 &
echo $! > /tmp/phaseh.pid
echo "=== handover: phase H launched as $(cat /tmp/phaseh.pid) ==="
