#!/usr/bin/env python
"""Headline benchmark: AntMaze env steps/sec at 4096 parallel envs.

Measures the fully-jitted collect loop — diffusion-policy action (K=5 DDPM
reverse steps) + from-scratch rigid-body physics step (20 substeps) + sparse
reward/termination/auto-reset — on the real TPU chip, replacing the
reference's 256 CPU subprocess MuJoCo workers + per-step host<->device
round trips (SURVEY.md §2.3).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/sec", "vs_baseline": N}
vs_baseline is measured against the 1M steps/s north star
(/root/repo/BASELINE.json; the reference publishes no numbers).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def bench_train(num_envs: int = 1024, iters: int = 10,
                env: str = "antmaze-v1"):
    """Full DDiffPG training-iteration throughput (collect + update_times
    gradient passes)."""
    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.envs import make

    env_name = env
    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    cfg = cfg.override(**{"env.name": env_name})
    cfg = C.preprocess(cfg)
    cfg = cfg.override(num_envs=num_envs)
    env_kw = {"random_init": True} if "antmaze" in env_name else {}
    env = make(env_name, num_envs=num_envs, **env_kw)
    agent = make_agent("DDiffPG", env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    spi = num_envs * cfg.algo.horizon_len
    # Warm with TWO calls: the returned state is the steady-state input
    # signature, and any leaf whose dtype/weak_type differs from init
    # (the r4 regression class) triggers one extra retrace on call 2 —
    # keep that outside the timed window.
    ts, _ = agent.train_iter(ts, steps=0)     # compile + warm
    ts, _ = agent.train_iter(ts, steps=0)
    jax.block_until_ready(ts)
    t0 = time.time()
    for i in range(iters):
        # host-tracked steps: no blocking device fetch between dispatches
        ts, logs = agent.train_iter(ts, steps=(i + 1) * spi)
    jax.block_until_ready(ts)
    dt = time.time() - t0
    sps = num_envs * cfg.algo.horizon_len * iters / dt
    result = {
        "metric": (f"ddiffpg_train_env_steps_per_sec@{num_envs}envs"
                   + ("" if env_name == "antmaze-v1" else f"_{env_name}")),
        "value": round(sps, 1),
        "unit": "env_steps/sec",
        "vs_baseline": round(sps / 1_000_000, 4),
        "detail": {"device": str(jax.devices()[0]),
                   "s_per_train_iter": round(dt / iters, 4)},
    }
    print(json.dumps(result))
    return result


def main(num_envs: int = 4096, n_steps: int = 64, policy: str = "diffusion",
         env: str = "antmaze-v1"):
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.models.diffusion import DiffusionPolicy
    from ddiffpg_tpu.ops.embedding import append_embedding

    env_name = env
    env_kw = {"random_init": True} if "antmaze" in env_name else {}
    env = make(env_name, num_envs=num_envs, **env_kw)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)

    emb_dim = 5
    actor = DiffusionPolicy(action_dim=env.action_dim, diffusion_iter=5)
    params = actor.init(key, jnp.zeros((1, env.action_dim)), jnp.zeros((1,)),
                        jnp.zeros((1, env.obs_dim + emb_dim)))

    @jax.jit
    def rollout(state, obs, key):
        def body(carry, k):
            state, obs = carry
            if policy == "diffusion":
                cond = append_embedding(obs, jnp.zeros(emb_dim))
                act = actor.apply(params, k, cond, method=DiffusionPolicy.act)
            else:
                act = jax.random.uniform(k, (num_envs, env.action_dim),
                                         minval=-1.0, maxval=1.0)
            state, obs, rew, done, info = env.step(state, act)
            return (state, obs), rew.sum()
        keys = jax.random.split(key, n_steps)
        (state, obs), rews = jax.lax.scan(body, (state, obs), keys)
        return state, obs, rews.sum()

    # compile + warm
    t0 = time.time()
    state, obs, _ = jax.block_until_ready(rollout(state, obs, key))
    compile_s = time.time() - t0

    t0 = time.time()
    reps = 3
    for i in range(reps):
        state, obs, _ = rollout(state, obs, jax.random.fold_in(key, i))
    jax.block_until_ready((state, obs))
    dt = time.time() - t0

    steps_per_sec = num_envs * n_steps * reps / dt
    # FLOP accounting for the policy (the physics engine adds ~1 MFLOP/step
    # of small batched 3x3/LDL work on top): K reverse-diffusion steps, each
    # one DiffusionNet forward = time-MLP (256->1024->256) + trunk
    # (298->1024->512->256->act), 2*in*out FLOPs per Dense.
    K, dim = 5, 256
    cond = env.obs_dim + emb_dim + env.action_dim
    dims = [(dim, dim * 4), (dim * 4, dim),
            (dim + cond, 1024), (1024, 512), (512, 256),
            (256, env.action_dim)]
    policy_flops = K * sum(2 * i * o for i, o in dims)
    tflops = steps_per_sec * policy_flops / 1e12
    result = {
        "metric": (f"{'antmaze' if env_name == 'antmaze-v1' else env_name}"
                   f"_env_steps_per_sec@{num_envs}envs_{policy}_policy"),
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/sec",
        "vs_baseline": round(steps_per_sec / 1_000_000, 4),
        "detail": {
            "device": str(jax.devices()[0]),
            "compile_s": round(compile_s, 1),
            "steady_state_s_per_ctrl_step": round(dt / (n_steps * reps), 5),
            "policy_mflop_per_env_step": round(policy_flops / 1e6, 2),
            "policy_tflops_per_s": round(tflops, 1),
            "note": ("policy matmuls only, f32 (physics pins f32 — bf16 "
                     "NaNs the contact Cholesky); physics+reward+reset add "
                     "~1 MFLOP/env step of non-MXU-shaped small-matrix work"),
        },
    }
    print(json.dumps(result))
    return result


def _require_device(timeout_s: float = 240.0):
    """Fail FAST if the TPU tunnel is down. A dead axon relay makes
    jax.devices() hang forever on the /v1/claim retry loop (observed
    2026-08-17: >3 h outage); a hung bench blocks the whole driver
    pipeline. Probe device init in a daemon thread and emit a
    machine-readable error line instead of hanging."""
    import threading
    out = []
    t = threading.Thread(target=lambda: out.append(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        print(json.dumps({
            "metric": "bench_unavailable",
            "value": 0,
            "unit": "env_steps/sec",
            "vs_baseline": 0,
            "detail": f"device init did not complete within {timeout_s}s "
                      "(TPU tunnel down?)"}))
        sys.exit(1)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        kw[k] = int(v) if v.isdigit() else v
    mode = kw.pop("mode", None)
    from ddiffpg_tpu.utils import compile_cache
    compile_cache.enable()
    _require_device()
    if mode == "train":
        bench_train(**kw)
    elif mode == "collect":
        main(**kw)
    else:
        # plain `python bench.py` puts ALL FOUR headline numbers on the
        # record (the driver captures stdout JSON): antmaze collect (first
        # line = headline) + full DDiffPG train iteration, then the same
        # pair for manipulation (PandaReachJoints-v3) so the Panda path is
        # measured, not anecdotal (VERDICT r2 item 6).
        main(**kw)
        bench_train(num_envs=1024, env=kw.get("env", "antmaze-v1"))
        if "env" not in kw:
            main(env="PandaReachJoints-v3", **kw)
            bench_train(num_envs=1024, env="PandaReachJoints-v3")
