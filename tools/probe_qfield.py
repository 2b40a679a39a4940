#!/usr/bin/env python
"""Critic-field forensics: is Q state-sensitive and action-sensitive? (CPU)

For a DDiffPG checkpoint, plants the ant at points along a line and
reports, per group critic: mean Q over 256 random actions, the spread
(action-sensitivity), and the actor's Q. A healthy done-at-goal field
rises toward the goal like 5*gamma^steps and separates actions at the
~1% scale; a flat field (spread ~1e-3) means the action-gradient
improvement operator has nothing to climb (RESULTS.md, v2 far-mode
forensics — contrast with the consolidated v1 checkpoint, which shows
spreads of 0.1-0.24 near the path).

Usage:
    python tools/probe_qfield.py runs/<run>/ckpt_<N>.pkl env=antmaze-v2 \
        [num_envs=256] [line=-8.8,0:-8.8,8:5]   # x0,y0:x1,y1:n points
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
    from ddiffpg_tpu.models.mlp import DistributionalDoubleQ
    from ddiffpg_tpu.ops.embedding import append_embedding
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    kw = dict(a.split("=", 1) for a in argv[1:])
    env_name = kw.get("env", "antmaze-v2")
    num_envs = int(kw.get("num_envs", 256))

    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg, if_ddiffpg=True)
    cfg = cfg.override_strings([f"num_envs={num_envs}"])

    env = make(env_name, num_envs=num_envs, random_init=True)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts, meta = ckpt.load(path, ts)
    G = int(meta.get("num_groups", 1))
    print(f"loaded {path}: num_groups={G}")

    line = kw.get("line", "-8.8,0:-8.8,8:5")
    (x0, y0), (x1, y1), n = (
        tuple(map(float, line.split(":")[0].split(","))),
        tuple(map(float, line.split(":")[1].split(","))),
        int(line.split(":")[2]))
    pts = np.linspace((x0, y0), (x1, y1), n)

    ev = make(env_name, num_envs=8, use_pallas=False)
    st, obs0 = ev.reset(jax.random.PRNGKey(0))
    E = agent.embed_dim

    def q_of(g, obs, act):
        # group 0 (explore) decodes on v_{min,max}_explore atoms (mirrors
        # agents/ddiffpg.py _update_once z_g) — the mode support would be
        # affinely wrong on dense envs.
        a_cfg = agent.cfg.algo
        vmin = a_cfg.v_min_explore if g == 0 else a_cfg.v_min
        vmax = a_cfg.v_max_explore if g == 0 else a_cfg.v_max
        z = jnp.linspace(vmin, vmax, a_cfg.num_atoms)
        cp = jax.tree.map(lambda x: x[g], ts.critics)
        q1, q2 = agent.critic.apply(cp, obs, act)
        return jnp.minimum((q1 * z).sum(-1), (q2 * z).sum(-1))

    for px, py in pts:
        obs = np.asarray(obs0[0]).copy()
        obs[0], obs[1] = px, py
        ob = jnp.asarray(obs)[None].repeat(256, 0)
        k1, k2 = jax.random.split(jax.random.PRNGKey(hash((px, py)) % 2**31))
        a_act = agent.actor.apply(ts.actor_params, k1,
                                  append_embedding(ob, jnp.zeros(E)),
                                  method=DiffusionPolicy.act)
        a_rnd = jax.random.uniform(k2, (256, ev.action_dim),
                                   minval=-1.0, maxval=1.0)
        row = [f"({px:5.1f},{py:5.1f})"]
        for g in range(G):
            qr = np.asarray(q_of(g, ob, a_rnd))
            qa = float(np.asarray(q_of(g, ob, a_act)).mean())
            row.append(f"g{g}: Q={qr.mean():.3f} spread={qr.std():.4f} "
                       f"actor={qa:.3f}")
        print("  ".join(row))


if __name__ == "__main__":
    main(sys.argv[1:])
