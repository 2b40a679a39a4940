#!/bin/bash
# ROUND-5 QUEUE (supersedes queue10 — same jobs, re-budgeted for the ~5.5 h
# of TPU left after the round-start cache prewarm, and with the third Panda
# task VERDICT r4 item 8 asked for). Ordering = judge value per TPU-hour:
#  1. antmaze_v2_r8 — the decisive far-goal run; first ever with all three
#     frontier pieces (f76a3de success-flood fix, c5e1a65 recluster sparing,
#     doorstep escalation). Win = eval/success_goal1 > 0.
#  2. panda_dense_r5b — close the dense-reward loop end-to-end (both
#     dead-critic class members fixed; VERDICT item 4).
#  3. dipo_v1_r5 — first DIPO training curve (VERDICT item 6).
#  4. panda_peg_r5 — third Panda task, Drawer recipe (VERDICT item 8).
#  5. panda_reach_stock_r5 — stock-config control (VERDICT item 7).
#  6. f32-matmul parity probe for engine_cl-on-TPU (VERDICT item 10).
#  7. antmaze_v3_r5 — whatever TPU time remains (VERDICT item 5; skipped
#     if < 1 h — an honest partial beats nothing, but not at any cost).
# All runs benefit from the weak_type recompile fix (this round): round-4
# runs paid a hidden 400-530 s remote recompile per process.
#
# Usage: tools/tpu_queue11.sh <deadline_epoch>   (TPU free by then)
set -u
cd /root/repo

DEADLINE=${1:?deadline_epoch}
: > /tmp/queue11_skips

wait_pid() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

run() {  # run <name> <nominal_max_time> <min_useful> <args...>
  local name=$1 mt=$2 min_useful=$3; shift 3
  local left=$(( DEADLINE - $(date +%s) - 420 ))
  if [ "$left" -lt "$min_useful" ]; then
    echo "skip $name: only ${left}s left (< ${min_useful})" >> /tmp/queue11_skips
    return 0
  fi
  [ "$mt" -gt "$left" ] && mt=$left
  nohup python train.py "$@" run_name="$name" max_time="$mt" \
    > "/tmp/${name}.log" 2>&1 &
  echo $! > "/tmp/${name}.pid"
  wait_pid "/tmp/${name}.pid"
  python tools/archive_run.py "runs/${name}" || true
}

run antmaze_v2_r8 7800 3600 algo=ddiffpg env.name=antmaze-v2 num_envs=256 \
  max_step=5000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=2 \
  algo.frontier_keep=64 algo.frontier_frac=0.25 \
  algo.frontier_frac_near=0.6 algo.frontier_near_dist=2.0 \
  intrinsic.depth_scale=0.15

# dense rerun: DDiffPG's extrinsic path only activates once a success makes
# a mode group; sparse Reach's first success came at 1.18M (r3b) — budget
# past that.
run panda_dense_r5b 2700 1500 algo=ddiffpg \
  env.name=PandaReachJointsDense-v3 num_envs=256 max_step=2500000 \
  eval_freq=100 seed=42

run dipo_v1_r5 2100 1200 algo=dipo env.name=antmaze-v1 num_envs=256 \
  max_step=2000000 eval_freq=100 seed=42

# third Panda task: PegInsertion sparse + NovelD, the exact DrawerMulti
# recipe (runs_archive/panda_drawer_r4b/config.json) on the new task.
run panda_peg_r5 4200 1800 algo=ddiffpg \
  env.name=PandaPegInsertionJoints-v3 num_envs=256 max_step=4000000 \
  eval_freq=100 seed=42 algo.success_bias=0.7 algo.split_by_goal=true \
  algo.exp.hold_until_mode=true

run panda_reach_stock_r5 1500 900 algo=ddiffpg \
  env.name=PandaReachJoints-v3 num_envs=256 max_step=2000000 \
  eval_freq=100 seed=42

if [ $(( DEADLINE - $(date +%s) - 420 )) -gt 1300 ]; then
  JAX_DEFAULT_MATMUL_PRECISION=highest timeout 1200 \
    python tools/probe_tpu_parity.py random device=tpu \
    env=PandaReachJoints-v3 \
    > runs_archive/parity_tpu_r5_panda_f32.jsonl 2> /tmp/parity_f32.err
else
  echo "skip parity_f32 probe" >> /tmp/queue11_skips
fi

run antmaze_v3_r5 10800 3600 algo=ddiffpg env.name=antmaze-v3 num_envs=256 \
  max_step=6000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=4 \
  algo.frontier_keep=64 algo.frontier_frac=0.25 \
  algo.frontier_frac_near=0.6 algo.frontier_near_dist=2.0 \
  intrinsic.depth_scale=0.15

echo "queue11 drained $(date)" > /tmp/tpu_queue11_done
