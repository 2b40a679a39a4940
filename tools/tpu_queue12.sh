#!/bin/bash
# ROUND-5 QUEUE, part 2 (takes over from tpu_queue11 after job 2).
# Rationale: under queue11's ordering the remaining ~5400 s would be spent
# on dipo (2100) + a peg run clipped to ~2500 s — less than the 4200 s the
# DrawerMulti recipe needed to produce its FIRST success, so the peg run
# would almost certainly archive as an uninformative zero. Instead spend
# the same window on three deliverables with achievable bars:
#   1. dipo_v1_r5      — first DIPO training curve (VERDICT r4 item 6)
#   2. panda_reach_stock_r5 — stock-config control, outcome-either-way bar
#                        (VERDICT r4 item 7)
#   3. f32-matmul parity probe for engine_cl-on-TPU (VERDICT r4 item 10)
# then the cache-hit verify bench that orchestrate_r5 step 4 would have run.
# Peg/v3 remain the first jobs to start if the round turns out to extend
# past the assumed ~11:30 end.
# Usage: tools/tpu_queue12.sh <queue_deadline_epoch> <verify_deadline_epoch>
set -u
cd /root/repo
Q_DEADLINE=${1:?queue_deadline}
V_DEADLINE=${2:?verify_deadline}
: > /tmp/queue12_skips

wait_pid() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 0
  [ -z "$pid" ] && return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

run() {  # run <name> <nominal_max_time> <min_useful> <args...>
  local name=$1 mt=$2 min_useful=$3; shift 3
  local left=$(( Q_DEADLINE - $(date +%s) - 300 ))
  if [ "$left" -lt "$min_useful" ]; then
    echo "skip $name: only ${left}s left (< ${min_useful})" >> /tmp/queue12_skips
    return 0
  fi
  [ "$mt" -gt "$left" ] && mt=$left
  nohup python train.py "$@" run_name="$name" max_time="$mt" \
    > "/tmp/${name}.log" 2>&1 &
  echo $! > "/tmp/${name}.pid"
  wait_pid "/tmp/${name}.pid"
  python tools/archive_run.py "runs/${name}" || true
}

# job 2 (dense) is still running under its own max_time; wait + archive.
wait_pid /tmp/panda_dense_r5b.pid
python tools/archive_run.py runs/panda_dense_r5b || true

run dipo_v1_r5 2100 1200 algo=dipo env.name=antmaze-v1 num_envs=256 \
  max_step=2000000 eval_freq=100 seed=42

run panda_reach_stock_r5 1500 900 algo=ddiffpg \
  env.name=PandaReachJoints-v3 num_envs=256 max_step=2000000 \
  eval_freq=100 seed=42

if [ $(( Q_DEADLINE - $(date +%s) )) -gt 1300 ]; then
  JAX_DEFAULT_MATMUL_PRECISION=highest timeout 1200 \
    python tools/probe_tpu_parity.py random device=tpu \
    env=PandaReachJoints-v3 \
    > runs_archive/parity_tpu_r5_panda_f32.jsonl 2> /tmp/parity_f32.err
else
  echo "skip parity_f32 probe" >> /tmp/queue12_skips
fi

echo "queue12 drained $(date)" > /tmp/tpu_queue12_done

# final cache-hit verification bench (orchestrate_r5 step 4 equivalent)
LEFT=$(( V_DEADLINE - $(date +%s) ))
if [ "$LEFT" -gt 480 ]; then
  timeout $(( LEFT - 60 )) python bench.py > /tmp/bench_verify_r5.log 2>&1
  echo "verify bench rc=$? $(date)" >> /tmp/orchestrate_r5.status
else
  echo "verify bench skipped: ${LEFT}s left" >> /tmp/orchestrate_r5.status
fi
echo "queue12 done $(date)" >> /tmp/orchestrate_r5.status
