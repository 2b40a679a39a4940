#!/bin/bash
# Session-3 TPU queue: v1 fresh run -> parity probe -> panda rerun -> v2.
# ONE process may own the TPU at a time (CLAUDE.md); this serializes and
# archives evidence at every boundary. Kill via pid files only.
set -u
cd /root/repo

wait_pid() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

# ---- job 1 (already running): antmaze-v1 fresh 5M seed=3 ----
wait_pid /tmp/v1f_run.pid
python tools/archive_run.py runs/antmaze_v1_r3f || true

# ---- job 2: TPU-side parity probe on the panda_sb checkpoint ----
timeout 3000 python tools/probe_tpu_parity.py \
  runs/panda_sb_r3/ckpt_final.pkl device=tpu \
  > runs_archive/parity_tpu.jsonl 2> /tmp/parity_tpu.err || true

# ---- job 3: Panda Reach sparse DDiffPG rerun on the FIXED eval path ----
# stop_ratio=0.35: both archived panda runs show the intrinsic-only
# explore policy never reaches; zero-embedding acting + noise finds the
# goal quickly once the override moves p off 0 — so move it earlier.
nohup python train.py algo=ddiffpg env.name=PandaReachJoints-v3 \
  num_envs=256 max_step=2500000 eval_freq=100 max_time=4500 \
  run_name=panda_ddiffpg_r3b seed=42 algo.success_bias=0.7 \
  algo.exp.stop_ratio=0.35 > /tmp/panda_b.log 2>&1 &
echo $! > /tmp/panda_b.pid
wait_pid /tmp/panda_b.pid
python tools/archive_run.py runs/panda_ddiffpg_r3b || true

# ---- job 4: antmaze-v2 fresh multi-goal, success-biased ----
nohup python train.py algo=ddiffpg env.name=antmaze-v2 \
  num_envs=256 max_step=4000000 eval_freq=100 max_time=7200 \
  run_name=antmaze_v2_r3c seed=7 algo.success_bias=0.7 \
  > /tmp/v2c_run.log 2>&1 &
echo $! > /tmp/v2c_run.pid
wait_pid /tmp/v2c_run.pid
python tools/archive_run.py runs/antmaze_v2_r3c || true

echo "queue2 drained $(date)" > /tmp/tpu_queue2_done
