#!/bin/bash
# Round-5 TPU orchestration (one TPU process at a time, serialized):
#   1. wait for the round-start bench prewarm (PID file) to exit
#   2. sanity-check it emitted all 4 JSON rows (cache now warm)
#   3. run tools/tpu_queue11.sh with the given deadline
#   4. after the queue drains, re-run bench.py once (cache-hit verify) so
#      the driver's end-of-round bench is guaranteed warm
# Usage: tools/orchestrate_r5.sh <queue_deadline_epoch> <verify_deadline_epoch>
set -u
cd /root/repo
Q_DEADLINE=${1:?queue_deadline}
V_DEADLINE=${2:?verify_deadline}

# 1. wait for prewarm
if [ -f /tmp/bench_prewarm.pid ]; then
  pid=$(cat /tmp/bench_prewarm.pid)
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
fi

rows=$(grep -c '"metric"' /tmp/bench_prewarm_r5.log 2>/dev/null || echo 0)
echo "prewarm rows: $rows (want 4)" > /tmp/orchestrate_r5.status
date >> /tmp/orchestrate_r5.status

# 3. run the queue (blocks until drained or deadline)
bash tools/tpu_queue11.sh "$Q_DEADLINE" >> /tmp/orchestrate_r5.status 2>&1

# 4. final cache-hit verification bench
LEFT=$(( V_DEADLINE - $(date +%s) ))
if [ "$LEFT" -gt 480 ]; then
  timeout $(( LEFT - 60 )) python bench.py > /tmp/bench_verify_r5.log 2>&1
  echo "verify bench rc=$? $(date)" >> /tmp/orchestrate_r5.status
else
  echo "verify bench skipped: ${LEFT}s left" >> /tmp/orchestrate_r5.status
fi
echo "orchestrate_r5 done $(date)" >> /tmp/orchestrate_r5.status
