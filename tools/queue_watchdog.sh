#!/bin/bash
# Queue watchdog (round 5): the TPU relay can stall/flap (RESULTS.md r8
# incident note). A trainer blocked on a dead relay RPC never reaches its
# own max_time check, which would stall tpu_queue11's wait_pid forever and
# starve every later job. This watches the ACTIVE queue job's log: if the
# log goes stale for > STALE_S while the process is alive, SIGTERM (clean
# ckpt if the relay is back), then SIGKILL after GRACE_S.
# STALE_S must exceed the longest legitimate silent gap: a cold remote
# compile of a full train program is 400-530 s; we use 1200 s.
# Usage: tools/queue_watchdog.sh <end_epoch> <name1> <name2> ...
set -u
END=${1:?end_epoch}; shift
STALE_S=1200
GRACE_S=180
while [ "$(date +%s)" -lt "$END" ]; do
  for name in "$@"; do
    pidf=/tmp/${name}.pid; logf=/tmp/${name}.log
    [ -f "$pidf" ] && [ -f "$logf" ] || continue
    pid=$(cat "$pidf")
    kill -0 "$pid" 2>/dev/null || continue
    age=$(( $(date +%s) - $(stat -c %Y "$logf") ))
    if [ "$age" -gt "$STALE_S" ]; then
      echo "$(date) watchdog: $name (pid $pid) log stale ${age}s -> SIGTERM" \
        >> /tmp/queue_watchdog.log
      kill -TERM "$pid" 2>/dev/null
      sleep "$GRACE_S"
      if kill -0 "$pid" 2>/dev/null; then
        echo "$(date) watchdog: $name still alive -> SIGKILL" \
          >> /tmp/queue_watchdog.log
        kill -KILL "$pid" 2>/dev/null
      fi
    fi
  done
  sleep 60
done
