#!/bin/bash
# Round-4 TPU queue (fresh workspace — round-3 runs/ wiped, only archives
# survive). Order = headline first: antmaze-v2 structural run (VERDICT
# item 1) gets the biggest slice, then the post-fix parity digests
# (item 5), the second Panda task (item 3), and a bench pre-warm so the
# driver's end-of-round bench hits the persistent compile cache (item 4).
# Trailing jobs (dense validation, DIPO) run only if wall-clock remains;
# every job is bounded by max_time and archived immediately.
set -u
cd /root/repo

wait_pid() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

# ---- job 1: antmaze-v2 seed 42, structural levers (VERDICT item 1) ----
# hold_until_goals=2 keeps p < 1.0 until BOTH goals have success trajs;
# split_by_goal + success-protected eviction keep the rare mode alive;
# success_bias keeps its mode batches from distilling the stall.
nohup python train.py algo=ddiffpg env.name=antmaze-v2 \
  num_envs=256 max_step=5000000 eval_freq=100 max_time=10500 \
  run_name=antmaze_v2_r4b seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=2 \
  > /tmp/v2_r4b.log 2>&1 &
echo $! > /tmp/v2_r4b.pid
wait_pid /tmp/v2_r4b.pid
python tools/archive_run.py runs/antmaze_v2_r4b || true

# ---- job 2: post-fix engine-parity digests on real TPU (VERDICT item 5) ----
timeout 1500 python tools/probe_tpu_parity.py random device=tpu \
  env=PandaReachJoints-v3 \
  > runs_archive/parity_tpu_r4_panda.jsonl 2> /tmp/parity_panda.err
timeout 1500 python tools/probe_tpu_parity.py random device=tpu \
  env=antmaze-v1 \
  > runs_archive/parity_tpu_r4_antmaze.jsonl 2> /tmp/parity_antmaze.err

# ---- job 3: Panda DrawerMulti sparse — second manipulation task ----
nohup python train.py algo=ddiffpg env.name=PandaDrawerMultiJoints-v3 \
  num_envs=256 max_step=2500000 eval_freq=100 max_time=3300 \
  run_name=panda_drawer_r4 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_mode=true \
  > /tmp/drawer_r4.log 2>&1 &
echo $! > /tmp/drawer_r4.pid
wait_pid /tmp/drawer_r4.pid
python tools/archive_run.py runs/panda_drawer_r4 || true

# ---- job 4: bench pre-warm (populates the compile cache for the driver) ----
timeout 3000 python bench.py > /tmp/bench_warm_r4.json 2> /tmp/bench_warm_r4.err

# ---- job 5 (bonus): dense-reward end-to-end validation (VERDICT item 6) ----
nohup python train.py algo=ddiffpg env.name=PandaReachJointsDense-v3 \
  num_envs=256 max_step=1500000 eval_freq=100 max_time=2000 \
  run_name=panda_dense_r4 seed=42 \
  > /tmp/dense_r4.log 2>&1 &
echo $! > /tmp/dense_r4.pid
wait_pid /tmp/dense_r4.pid
python tools/archive_run.py runs/panda_dense_r4 || true

# ---- job 6 (bonus): DIPO baseline curve on antmaze-v1 (VERDICT item 7) ----
nohup python train.py algo=dipo env.name=antmaze-v1 \
  num_envs=256 max_step=2000000 eval_freq=100 max_time=2400 \
  run_name=dipo_v1_r4 seed=42 \
  > /tmp/dipo_r4.log 2>&1 &
echo $! > /tmp/dipo_r4.pid
wait_pid /tmp/dipo_r4.pid
python tools/archive_run.py runs/dipo_v1_r4 || true

echo "queue5 drained $(date)" > /tmp/tpu_queue5_done
