#!/bin/bash
# Round-4 continuation queue. Ordered by verdict weight:
#  1. antmaze-v2 with the round-4 FRONTIER levers (frontier_keep /
#     frontier_frac + depth-scaled NovelD). The r4b forensics (RESULTS.md)
#     measured the binding constraint: the NovelD field points down the
#     goal1 corridor (4x gradient) but corridor data was 0.2% of the
#     buffer and aged out — these levers protect it and feed it to the
#     explore critic. Watch train/frontier_depth: r4b would read 11.2
#     flat; the levers working = it climbs toward 16+.
#  2. dense-reward validation (VERDICT r3 item 6) — short.
#  3. DIPO baseline curve on antmaze-v1 (item 7) — short.
#  4. f32-matmul parity probe for the engine_cl-on-TPU divergence — short.
#  5. antmaze-v3 with frontier + depth levers (item 2).
#  6. antmaze-v4 first attempt (item 8).
#  7. Reach control run at stock config (item 10).
#
# Usage: tools/tpu_queue8.sh <deadline_epoch>
#   deadline_epoch: unix time by which the TPU must be FREE (driver bench).
# Each job's max_time is clamped to the time remaining minus a reserve for
# the final checkpoint write (~6 min over the tunnel); jobs that can't get
# a useful slice are skipped (logged to /tmp/queue8_skips).
set -u
cd /root/repo

DEADLINE=${1:?deadline_epoch}
: > /tmp/queue8_skips

# wait for whatever currently owns the TPU (queue7 / drawer resume)
for f in /tmp/queue7.pid /tmp/drawer_r4b.pid; do
  pid=$(cat "$f" 2>/dev/null) || continue
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
done

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
    echo "skip $name: only ${left}s left (< ${min_useful})" >> /tmp/queue8_skips
    return 0
  fi
  [ "$mt" -gt "$left" ] && mt=$left
  nohup python train.py "$@" run_name="$name" max_time="$mt" \
    > "/tmp/${name}.log" 2>&1 &
  echo $! > "/tmp/${name}.pid"
  wait_pid "/tmp/${name}.pid"
  python tools/archive_run.py "runs/${name}" || true
}

run antmaze_v2_r5 10500 3600 algo=ddiffpg env.name=antmaze-v2 num_envs=256 \
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
  echo "skip parity_f32 probe" >> /tmp/queue8_skips
fi

run antmaze_v3_r5 12000 5400 algo=ddiffpg env.name=antmaze-v3 num_envs=256 \
  max_step=6000000 eval_freq=100 seed=11 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_mode=true \
  algo.frontier_keep=64 algo.frontier_frac=0.25 intrinsic.depth_scale=0.15

run antmaze_v4_r5 10000 3600 algo=ddiffpg env.name=antmaze-v4 num_envs=256 \
  max_step=5000000 eval_freq=100 seed=42 algo.success_bias=0.7 \
  algo.split_by_goal=true algo.exp.hold_until_goals=2 \
  algo.frontier_keep=64 algo.frontier_frac=0.25 intrinsic.depth_scale=0.15

run panda_reach_stock_r5 5400 2400 algo=ddiffpg env.name=PandaReachJoints-v3 \
  num_envs=256 max_step=2500000 eval_freq=100 seed=42

echo "queue8 drained $(date)" > /tmp/tpu_queue8_done
