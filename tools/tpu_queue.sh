#!/bin/bash
# Serialize TPU runs: ONE process may own the TPU at a time (a second gets
# FAILED_PRECONDITION and can wedge the first — CLAUDE.md). This waits for
# the currently-running job's pid file, archives its evidence, then starts
# the next queued run. Kill via the pid files, never by ps|grep pattern.
set -u
cd /root/repo

wait_pid() {  # wait_pid <pidfile>
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

# ---- job 1 (already running): antmaze-v3 4M seed=11 ----
wait_pid /tmp/v3_run.pid
python tools/archive_run.py runs/antmaze_v3_r3 || true

# ---- job 2: Panda Reach sparse DDiffPG (VERDICT r2 item 2) ----
nohup python train.py algo=ddiffpg env.name=PandaReachJoints-v3 \
  num_envs=256 max_step=2000000 eval_freq=100 max_time=5400 \
  run_name=panda_ddiffpg_r3 seed=42 > /tmp/panda_run.log 2>&1 &
echo $! > /tmp/panda_run.pid
wait_pid /tmp/panda_run.pid
python tools/archive_run.py runs/panda_ddiffpg_r3 || true

echo "queue drained $(date)" > /tmp/tpu_queue_done
