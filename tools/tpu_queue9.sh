#!/bin/bash
# Takes over from tpu_queue8.sh after its antmaze_v2_r5 job was cut short:
# r5 replicated the structural stall with the depth-based frontier (goal2
# 1.00 by 1M, goal1 0.00, coverage plateau 0.46, failure plot saturating
# the solved right corridor — RESULTS.md). Jobs, in order:
#  1. antmaze-v2 with the GOAL-DIRECTED frontier (9c0b9ea): frontier set =
#     failures closest to the unreached goal, so the keep/frac levers feed
#     goal1-corridor data instead of right-corridor dead-ends. Watch
#     train/frontier_dist: falls toward 0 as exploration nears goal1.
#  2. dense-reward validation (VERDICT r3 item 6) — short.
#  3. DIPO baseline curve on antmaze-v1 (item 7) — short.
#  4. f32-matmul parity probe for the engine_cl-on-TPU divergence — short.
#
# Usage: tools/tpu_queue9.sh <deadline_epoch>  (TPU must be FREE by then)
set -u
cd /root/repo

DEADLINE=${1:?deadline_epoch}
: > /tmp/queue9_skips

# wait for the TPU's current owner (the v2_r5 final checkpoint write)
pid=$(cat /tmp/antmaze_v2_r7.pid 2>/dev/null)
while [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do sleep 20; done
python tools/archive_run.py runs/antmaze_v2_r7 || true

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
    echo "skip $name: only ${left}s left (< ${min_useful})" >> /tmp/queue9_skips
    return 0
  fi
  [ "$mt" -gt "$left" ] && mt=$left
  nohup python train.py "$@" run_name="$name" max_time="$mt" \
    > "/tmp/${name}.log" 2>&1 &
  echo $! > "/tmp/${name}.pid"
  wait_pid "/tmp/${name}.pid"
  python tools/archive_run.py "runs/${name}" || true
}

run antmaze_v2_r8 8400 3600 algo=ddiffpg env.name=antmaze-v2 num_envs=256 \
  max_step=5000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=2 \
  algo.frontier_keep=64 algo.frontier_frac=0.25 intrinsic.depth_scale=0.15

run panda_dense_r5 2000 1200 algo=ddiffpg env.name=PandaReachJointsDense-v3 \
  num_envs=256 max_step=1500000 eval_freq=100 seed=42

run dipo_v1_r5 2400 1500 algo=dipo env.name=antmaze-v1 num_envs=256 \
  max_step=2000000 eval_freq=100 seed=42

# discriminating experiment for the engine_cl-on-TPU panda divergence
# (RESULTS.md parity entry): if forcing f32 matmuls everywhere closes the
# lockstep gap, the cause is an unpinned dot op; chase and pin it.
if [ $(( DEADLINE - $(date +%s) - 420 )) -gt 1500 ]; then
  JAX_DEFAULT_MATMUL_PRECISION=highest timeout 1500 \
    python tools/probe_tpu_parity.py random device=tpu \
    env=PandaReachJoints-v3 \
    > runs_archive/parity_tpu_r5_panda_f32.jsonl 2> /tmp/parity_f32.err
else
  echo "skip parity_f32 probe" >> /tmp/queue9_skips
fi

echo "queue9 drained $(date)" > /tmp/tpu_queue9_done
