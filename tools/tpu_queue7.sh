#!/bin/bash
# Round-4 remainder queue: the drawer run was TAKING OFF when its 2.5M
# budget ended (first successes at 2.4M, eval 0.05 at the final eval,
# 5 modes) — resuming it with a bigger budget is the best marginal TPU
# hour left this round. Replaces queue5's jobs 5/6 (dense, DIPO), which
# move to the round-5 opener (tools/tpu_queue8.sh).
#
# Usage: tools/tpu_queue7.sh <wait_pid> <deadline_epoch>
#   wait_pid:        process to wait for before touching the TPU (the
#                    in-flight bench pre-warm)
#   deadline_epoch:  unix time by which the TPU must be FREE again
set -u
cd /root/repo

WAIT_PID=${1:?wait_pid}
DEADLINE=${2:?deadline_epoch}

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done

# leave ~6 min for the final checkpoint write over the tunnel
MAX_T=$(( DEADLINE - $(date +%s) - 360 ))
if [ "$MAX_T" -lt 600 ]; then
  echo "not enough time left for a resume (${MAX_T}s)" > /tmp/queue7_skipped
  exit 0
fi

nohup python train.py algo=ddiffpg env.name=PandaDrawerMultiJoints-v3 \
  num_envs=256 max_step=6000000 eval_freq=100 max_time=$MAX_T \
  run_name=panda_drawer_r4b seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_mode=true \
  resume=runs/panda_drawer_r4/ckpt_final.pkl \
  > /tmp/drawer_r4b.log 2>&1 &
echo $! > /tmp/drawer_r4b.pid
pid=$(cat /tmp/drawer_r4b.pid)
while kill -0 "$pid" 2>/dev/null; do sleep 30; done
python tools/archive_run.py runs/panda_drawer_r4b || true
echo "queue7 drained $(date)" > /tmp/tpu_queue7_done
