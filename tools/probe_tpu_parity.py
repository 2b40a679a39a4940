#!/usr/bin/env python
"""Panda train-vs-eval forensic probe: backend/engine parity in one shot.

Context (runs/panda_sb_r3 + runs/panda_ddiffpg_r3): on-TPU training at
256 envs (pallas engine) reports train/return 10.0 with 17-step episodes,
while every in-run eval (20 envs -> engine_cl fallback, deterministic)
logged 0.00. The SAME checkpoint evaluated on CPU/engine_cl succeeds
0.25-0.36. Something is backend- or engine-dependent. This probe runs an
identical program on whatever backend it's launched on and prints JSON
rows that can be diffed across backends:

  1. eval success at 20 envs  (B %% 256 != 0  -> engine_cl path)
  2. eval success at 256 envs, use_pallas=True  (pallas kernel path)
  3. eval success at 256 envs, use_pallas=False (engine_cl at train B)
  4. a 50-step lockstep qpos trajectory from a FIXED reset under the
     deterministic policy, through both engines, with a running digest
     (mean |qpos|, ee position at steps 0/10/25/49) to localise any
     dynamics divergence.

Usage:
    python tools/probe_tpu_parity.py runs/panda_sb_r3/ckpt_final.pkl \
        [device=cpu|tpu] [env=PandaReachJoints-v3]

device=cpu forces the CPU platform (CLAUDE.md: the JAX_PLATFORMS env var
is ignored under the axon sitecustomize).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv):
    kw = dict(a.split("=", 1) for a in argv[1:])
    import jax

    if kw.get("device", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ddiffpg_tpu.utils import compile_cache
    compile_cache.enable()

    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.agents.evaluation import eval_rollout
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    env_name = kw.get("env", "PandaReachJoints-v3")
    backend = jax.default_backend()

    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg, if_ddiffpg=True)
    cfg = cfg.override_strings(["num_envs=256"])
    env = make(env_name, num_envs=256)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    if path != "random":
        ts, _ = ckpt.load(path, ts)
    # path == "random": probe DYNAMICS parity with the random-init policy —
    # the lockstep digest does not require a trained checkpoint (runs/ is
    # wiped between rounds; the digest is policy-agnostic)
    args = agent.eval_args(ts)

    def eval_row(n, use_pallas):
        e = make(env_name, num_envs=n, use_pallas=use_pallas)
        m, _ = eval_rollout(e, agent.eval_fn, jax.random.PRNGKey(7), args)
        row = {"probe": "eval", "backend": backend, "num_envs": n,
               "use_pallas": use_pallas,
               "success": round(float(m["eval/success_rate"]), 4),
               "return": round(float(m["eval/return"]), 3),
               "len": round(float(m["eval/episode_length"]), 1)}
        print(json.dumps(row), flush=True)

    on_tpu = backend != "cpu"

    # ---- lockstep dynamics digest: same reset, same policy, both engines.
    # Printed FIRST: these rows are the engine-parity evidence (VERDICT r3
    # item 5) and must survive even if an outer timeout cuts the probe
    # before the slower eval_rollout compiles finish.
    for use_pallas in ((True, False) if on_tpu else (False,)):
        e = make(env_name, num_envs=256, use_pallas=use_pallas)
        st, obs = e.reset(jax.random.PRNGKey(3))
        key = jax.random.PRNGKey(5)
        digest = {}
        step = jax.jit(e.step)
        for t in range(50):
            key, k = jax.random.split(key)
            act = agent.eval_fn(args, k, obs)
            st, obs, rew, done, info = step(st, act)
            if t in (0, 10, 25, 49):
                digest[f"t{t}"] = {
                    "qpos_mean_abs": round(float(jnp.abs(st.qpos).mean()), 6),
                    "obs0": [round(float(x), 5)
                             for x in np.asarray(obs[0, :6])],
                    "succ_frac": round(float((info["success"] > 0)
                                             .mean()), 4),
                }
        print(json.dumps({"probe": "lockstep", "backend": backend,
                          "use_pallas": use_pallas, **digest}), flush=True)

    eval_row(20, False)
    if on_tpu:                    # Mosaic doesn't target CPU
        eval_row(20, True)        # padded pallas path (the new eval default)
        eval_row(256, True)
    eval_row(256, False)


if __name__ == "__main__":
    main(sys.argv[1:])
