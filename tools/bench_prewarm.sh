#!/bin/bash
# Waits for the TPU queue to drain, then pre-warms bench.py once so the
# driver's end-of-round bench hits the persistent compile cache instead of
# paying a fresh multi-minute compile (the goal-directed frontier changed
# the collect program's fingerprint). Skips if past the deadline.
#
# Usage: tools/bench_prewarm.sh <done_flag_file> <deadline_epoch>
set -u
cd /root/repo
FLAG=${1:?done_flag}
DEADLINE=${2:?deadline_epoch}

while [ ! -f "$FLAG" ]; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && exit 0
  sleep 30
done

LEFT=$(( DEADLINE - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  timeout $(( LEFT - 60 )) python bench.py > /tmp/bench_prewarm.log 2>&1
  echo "prewarm done $(date)" >> /tmp/bench_prewarm.log
else
  echo "prewarm skipped: ${LEFT}s left" > /tmp/bench_prewarm.log
fi
