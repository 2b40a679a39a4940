#!/bin/bash
# Follow-on TPU queue (run when queue5 drains, or as the round-5 opener):
#  - antmaze-v3 with the round-4 structural levers (hold_until_mode so
#    exploration never freezes at stop_ratio without a mode, and the
#    depth-scaled NovelD bonus for the 17 m corridors — VERDICT r3 item 2)
#  - antmaze-v4 first-ever attempt (VERDICT r3 item 8; 5M reference budget)
#  - antmaze-v2 replication at a second seed (VERDICT r3 item 1: seed as
#    replication, not rescue)
set -u
cd /root/repo

wait_pid() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

# ---- job 1: antmaze-v3 structural retry ----
nohup python train.py algo=ddiffpg env.name=antmaze-v3 \
  num_envs=256 max_step=6000000 eval_freq=100 max_time=12000 \
  run_name=antmaze_v3_r4 seed=11 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_mode=true \
  intrinsic.depth_scale=0.15 \
  > /tmp/v3_r4.log 2>&1 &
echo $! > /tmp/v3_r4.pid
wait_pid /tmp/v3_r4.pid
python tools/archive_run.py runs/antmaze_v3_r4 || true

# ---- job 2: antmaze-v4 first attempt ----
nohup python train.py algo=ddiffpg env.name=antmaze-v4 \
  num_envs=256 max_step=5000000 eval_freq=100 max_time=10000 \
  run_name=antmaze_v4_r4 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_mode=true \
  > /tmp/v4_r4.log 2>&1 &
echo $! > /tmp/v4_r4.pid
wait_pid /tmp/v4_r4.pid
python tools/archive_run.py runs/antmaze_v4_r4 || true

# ---- job 3: antmaze-v2 replication, second seed ----
nohup python train.py algo=ddiffpg env.name=antmaze-v2 \
  num_envs=256 max_step=5000000 eval_freq=100 max_time=10500 \
  run_name=antmaze_v2_r4c seed=3 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=2 \
  > /tmp/v2_r4c.log 2>&1 &
echo $! > /tmp/v2_r4c.pid
wait_pid /tmp/v2_r4c.pid
python tools/archive_run.py runs/antmaze_v2_r4c || true

echo "queue6 drained $(date)" > /tmp/tpu_queue6_done
