#!/bin/bash
# ROUND-5 OPENER. State it inherits (RESULTS.md r6/r7 entry): under the
# goal-directed frontier, exploration reached 0.73 m from antmaze-v2's
# goal1 by 384k steps and HELD it for 165k steps — then the first
# recluster's buffer compaction wiped the keep-set (fixed in c5e1a65,
# AFTER both partials). Nothing has yet run with all three of:
#   - success-flood eviction fix (f76a3de)
#   - recluster eviction sparing the frontier (c5e1a65)
#   - doorstep escalation frontier_frac_near/frontier_near_dist (this round)
# Jobs, in order of judge value:
#  1. antmaze_v2_r8: the decisive run. Watch train/frontier_dist: it must
#     fall below 1 by ~400k (replicated 3x at seed 42) and STAY there
#     through the first recluster; eval/success_goal1 > 0 is the win.
#  2. DIPO baseline curve on antmaze-v1 (VERDICT r3 item 7).
#  3. antmaze-v3 under the same frontier stack (item 2), 6M.
#  4. antmaze-v4 first attempt (item 8).
#  5. stock-config Reach control (item 10).
#  6. f32-matmul parity probe for engine_cl-on-TPU (item 5 follow-up).
# panda dense (item 6) already ran this session: runs_archive/panda_dense_r5.
#
# Usage: tools/tpu_queue10.sh <deadline_epoch>   (TPU free by then)
set -u
cd /root/repo

DEADLINE=${1:?deadline_epoch}
: > /tmp/queue10_skips

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
    echo "skip $name: only ${left}s left (< ${min_useful})" >> /tmp/queue10_skips
    return 0
  fi
  [ "$mt" -gt "$left" ] && mt=$left
  nohup python train.py "$@" run_name="$name" max_time="$mt" \
    > "/tmp/${name}.log" 2>&1 &
  echo $! > "/tmp/${name}.pid"
  wait_pid "/tmp/${name}.pid"
  python tools/archive_run.py "runs/${name}" || true
}

run antmaze_v2_r8 9000 3600 algo=ddiffpg env.name=antmaze-v2 num_envs=256 \
  max_step=5000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=2 \
  algo.frontier_keep=64 algo.frontier_frac=0.25 \
  algo.frontier_frac_near=0.6 algo.frontier_near_dist=2.0 \
  intrinsic.depth_scale=0.15

run dipo_v1_r5 2400 1500 algo=dipo env.name=antmaze-v1 num_envs=256 \
  max_step=2000000 eval_freq=100 seed=42

# panda_dense_r5 (this session) ran 1200 s / ~1.3M steps: return signal
# live but no first success yet — DDiffPG's dense extrinsic path only
# activates once a success creates a mode group (sparse Reach's first
# success came at 1.18M in r3b). Rerun with the budget to cross it.
run panda_dense_r5b 3000 1800 algo=ddiffpg \
  env.name=PandaReachJointsDense-v3 num_envs=256 max_step=2500000 \
  eval_freq=100 seed=42

run antmaze_v3_r5 10800 5400 algo=ddiffpg env.name=antmaze-v3 num_envs=256 \
  max_step=6000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=4 \
  algo.frontier_keep=64 algo.frontier_frac=0.25 \
  algo.frontier_frac_near=0.6 algo.frontier_near_dist=2.0 \
  intrinsic.depth_scale=0.15

run antmaze_v4_r5 10800 5400 algo=ddiffpg env.name=antmaze-v4 num_envs=256 \
  max_step=5000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.frontier_keep=64 algo.frontier_frac=0.25 \
  algo.frontier_frac_near=0.6 algo.frontier_near_dist=2.0 \
  intrinsic.depth_scale=0.15

run panda_reach_stock_r5 2400 1500 algo=ddiffpg \
  env.name=PandaReachJoints-v3 num_envs=256 max_step=2000000 \
  eval_freq=100 seed=42

if [ $(( DEADLINE - $(date +%s) - 420 )) -gt 1500 ]; then
  JAX_DEFAULT_MATMUL_PRECISION=highest timeout 1500 \
    python tools/probe_tpu_parity.py random device=tpu \
    env=PandaReachJoints-v3 \
    > runs_archive/parity_tpu_r5_panda_f32.jsonl 2> /tmp/parity_f32.err
else
  echo "skip parity_f32 probe" >> /tmp/queue10_skips
fi

echo "queue10 drained $(date)" > /tmp/tpu_queue10_done
