#!/usr/bin/env python
"""Offline per-goal checkpoint evaluation (any env, CPU by default).

Replays the in-run eval exactly (agents/evaluation.py eval_rollout, which
carries the per-goal success breakdown) on a saved full train-state
checkpoint. Unlike tools/eval_ckpt.py (antmaze termination forensics) this
works for every registered env — the panda tasks included — and exists to
answer "WHICH goals does the trained policy reach?" for runs launched
before the per-goal eval metric landed.

Usage:
    python tools/eval_goals.py runs/<run>/ckpt_final.pkl env=<name>
        [algo=ddiffpg] [num_envs=256] [eval_envs=40] [seeds=3]

Runs on CPU so it never competes with a live TPU training process.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")


def main(argv):
    import numpy as np

    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.agents.evaluation import eval_rollout
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    kw = dict(a.split("=", 1) for a in argv[1:])
    env_name = kw["env"]
    algo = kw.get("algo", "ddiffpg")
    num_envs = int(kw.get("num_envs", 256))
    eval_envs = int(kw.get("eval_envs", 40))
    seeds = int(kw.get("seeds", 3))

    cfg = C.Config(algo=C.algo_preset(algo))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg, if_ddiffpg=(algo == "ddiffpg"))
    cfg = cfg.override_strings([f"num_envs={num_envs}"])

    env = make(env_name, num_envs=num_envs)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts, meta = ckpt.load(path, ts)
    args = agent.eval_args(ts)

    eval_env = make(env_name, num_envs=eval_envs, use_pallas=False)
    agg: dict[str, float] = {}
    n_ep = 0.0
    for s in range(seeds):
        m, _ = eval_rollout(eval_env, agent.eval_fn,
                            jax.random.PRNGKey(100 + s), args)
        m = {k: float(v) for k, v in m.items()}
        w = m["eval/episodes"]
        n_ep += w
        for k, v in m.items():
            if k != "eval/episodes":
                agg[k] = agg.get(k, 0.0) + v * w
        print(json.dumps({"seed": 100 + s,
                          **{k: round(v, 4) for k, v in m.items()}}),
              flush=True)
    summary = {k: round(v / max(n_ep, 1.0), 4) for k, v in agg.items()}
    summary["eval/episodes"] = n_ep
    print(json.dumps({"summary": summary, "ckpt": path,
                      "step": int(meta.get("step", -1))}), flush=True)
    # sanity guard mirroring the archive summaries
    assert np.isfinite(list(summary.values())).all()


if __name__ == "__main__":
    main(sys.argv[1:])
