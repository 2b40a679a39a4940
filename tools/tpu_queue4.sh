#!/bin/bash
# Round-4 TPU queue, revision 2 (seed-7 v2 attempt was a clean negative:
# exploration never reached goal1 before p->1.0; the seed-42 history DID
# reach it 99 times in 3M). v2 retry -> Panda DrawerMulti -> v3.
set -u
cd /root/repo

wait_pid() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

# ---- job 0: wait for the SIGTERMed seed-7 run to finish its final ckpt ----
wait_pid /tmp/v2_r4a.pid
python tools/archive_run.py runs/antmaze_v2_r4a || true

# ---- job 1: antmaze-v2 retry, seed 42, exploration extended to 3.2M ----
nohup python train.py algo=ddiffpg env.name=antmaze-v2 \
  num_envs=256 max_step=4000000 eval_freq=100 max_time=9000 \
  run_name=antmaze_v2_r4b seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.stop_ratio=0.8 \
  > /tmp/v2_r4b.log 2>&1 &
echo $! > /tmp/v2_r4b.pid
wait_pid /tmp/v2_r4b.pid
python tools/archive_run.py runs/antmaze_v2_r4b || true

# ---- job 2: Panda DrawerMulti sparse (4 drawers = 4 goal modes) ----
nohup python train.py algo=ddiffpg env.name=PandaDrawerMultiJoints-v3 \
  num_envs=256 max_step=2500000 eval_freq=100 max_time=6000 \
  run_name=panda_drawer_r4 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.stop_ratio=0.35 \
  > /tmp/drawer_r4.log 2>&1 &
echo $! > /tmp/drawer_r4.pid
wait_pid /tmp/drawer_r4.pid
python tools/archive_run.py runs/panda_drawer_r4 || true

# ---- job 3: antmaze-v3 with hold_until_mode + 6M cap ----
nohup python train.py algo=ddiffpg env.name=antmaze-v3 \
  num_envs=256 max_step=6000000 eval_freq=100 max_time=12000 \
  run_name=antmaze_v3_r4 seed=11 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_mode=true \
  > /tmp/v3_r4.log 2>&1 &
echo $! > /tmp/v3_r4.pid
wait_pid /tmp/v3_r4.pid
python tools/archive_run.py runs/antmaze_v3_r4 || true

echo "queue4 drained $(date)" > /tmp/tpu_queue4_done
