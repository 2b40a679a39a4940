#!/usr/bin/env python
"""Where do mode-conditioned rollouts actually GO? (CPU-only)

For each conditioning (zero embedding, explore, each mode row) rolls
eval episodes and reports, per episode: the terminal cause and position,
which goal (if any) was reached, and the deepest penetration toward each
goal. Complements tools/eval_modes.py (which reports only success/return):
on multi-goal mazes a mode can head the right way yet time out, which is
invisible in the success rate alone.

Usage:
    python tools/trace_goals.py runs/<run>/ckpt_<N>.pkl [env=antmaze-v2]
        [num_envs=256] [eval_envs=40] [seed=11]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv):
    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.models.diffusion import DiffusionPolicy
    from ddiffpg_tpu.ops.embedding import append_embedding
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    kw = dict(a.split("=", 1) for a in argv[1:])
    env_name = kw.get("env", "antmaze-v2")
    num_envs = int(kw.get("num_envs", 256))
    eval_envs = int(kw.get("eval_envs", 40))

    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg, if_ddiffpg=True)
    cfg = cfg.override_strings([f"num_envs={num_envs}"])

    env = make(env_name, num_envs=num_envs, random_init=True)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts, meta = ckpt.load(path, ts)
    G = int(meta.get("num_groups", 1))
    print(f"loaded {path}: num_groups={G} global_step={int(ts.global_step)}")

    eval_env = make(env_name, num_envs=eval_envs, random_init=True,
                    use_pallas=False)
    E = agent.embed_dim
    T = eval_env.max_episode_length
    goals = np.asarray(eval_env.env.goal_xy)            # [n_goals, 2]

    @jax.jit
    def rollout(emb, key):
        k0, key = jax.random.split(key)
        st, obs = eval_env.reset(k0)

        def body(carry, k):
            st, obs = carry
            act = agent.actor.apply(
                ts.actor_params, k, append_embedding(obs, emb),
                method=DiffusionPolicy.act)
            st, obs2, rew, done, info = eval_env.step(st, act)
            out = dict(done=done, gid=info["success"],
                       tout=info["time_outs"], xy=obs2[:, :2])
            return (st, obs2), out
        keys = jax.random.split(key, T)
        _, tr = jax.lax.scan(body, (st, obs), keys)
        return tr

    conds = [("zero", jnp.zeros(E)), ("explore", ts.embeddings[0])]
    conds += [(f"mode{i}", ts.embeddings[i]) for i in range(1, G)]
    key = jax.random.PRNGKey(int(kw.get("seed", 11)))
    for name, emb in conds:
        key, k = jax.random.split(key)
        tr = jax.device_get(rollout(emb, k))
        done, gid, xy = tr["done"], tr["gid"], tr["xy"]
        n_ep = int(done.sum())
        per = {g: int(((gid == g) & done).sum())
               for g in range(1, len(goals) + 1)}
        tout = int((done & tr["tout"]).sum())
        # deepest approach to each goal across the whole rollout batch
        d = np.linalg.norm(xy[:, :, None, :] - goals[None, None], axis=-1)
        mins = d.min(axis=(0, 1))
        print(f"[{name:8s}] episodes={n_ep} timeouts={tout} "
              f"per-goal={per} min-dist-to-goal="
              f"{np.array2string(mins, precision=2)}")
        # terminal positions of timeout episodes: where do they stall?
        t_idx, e_idx = np.where(done & tr["tout"])
        if len(t_idx):
            term = xy[t_idx, e_idx]
            print(f"           timeout terminal xy: "
                  f"mean={np.array2string(term.mean(0), precision=2)} "
                  f"spread={np.array2string(term.std(0), precision=2)}")


if __name__ == "__main__":
    main(sys.argv[1:])
