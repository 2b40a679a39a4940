#!/usr/bin/env python
"""Offline checkpoint evaluation with termination-cause breakdown.

Loads a full train-state checkpoint (utils/checkpoint.py) on CPU and rolls
out the eval policy (zero mode embedding, ddiffpg_main.py:87-89 semantics),
classifying every episode end:

    goal      — reached a goal (success)
    timeout   — hit max_episode_steps
    z_high    — torso z above the wall-top ceiling (envs/antmaze.py:99-109)
    z_low     — torso fell below the floor
    escape    — |xy| > 60 m (left the world)

Usage:
    python tools/eval_ckpt.py runs/<run>/ckpt_<N>.pkl [env=antmaze-v1]
        [num_envs=<ckpt train envs, default 256>] [eval_envs=40] [algo=ddiffpg]

Runs on CPU so it never competes with a live TPU training process.
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
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    kw = dict(a.split("=", 1) for a in argv[1:])
    env_name = kw.get("env", "antmaze-v1")
    algo = kw.get("algo", "ddiffpg")
    num_envs = int(kw.get("num_envs", 256))
    eval_envs = int(kw.get("eval_envs", 40))

    cfg = C.Config(algo=C.algo_preset(algo))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg, if_ddiffpg=(algo == "ddiffpg"))
    cfg = cfg.override_strings([f"num_envs={num_envs}"])

    env = make(env_name, num_envs=num_envs, random_init=True)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts, meta = ckpt.load(path, ts)
    print(f"loaded {path} (meta={ {k: v for k, v in meta.items() if k != 'last_cluster'} })")
    actor_params = ts.actor_params if not hasattr(ts, "core") \
        else ts.core.actor_params

    eval_env = make(env_name, num_envs=eval_envs, random_init=True,
                    use_pallas=False)
    T = eval_env.max_episode_length

    @jax.jit
    def rollout(key):
        k0, key = jax.random.split(key)
        st, obs = eval_env.reset(k0)

        def body(carry, k):
            st, obs = carry
            act = agent.eval_actor(actor_params, k, obs)
            st, obs2, rew, done, info = eval_env.step(st, act)
            # obs2 is the PRE-reset observation: z/xy of the terminal state
            out = dict(done=done, succ=info["success"] > 0,
                       goal_id=info["success"],
                       tout=info["time_outs"], z=obs2[:, 2], xy=obs2[:, :2],
                       vz=obs2[:, 17], hinge=jnp.abs(obs2[:, 21:29]).max(-1))
            return (st, obs2), out
        keys = jax.random.split(key, T)
        _, tr = jax.lax.scan(body, (st, obs), keys)
        return tr

    tr = jax.device_get(rollout(jax.random.PRNGKey(int(kw.get("seed", 7)))))
    done = tr["done"]
    n_ep = int(done.sum())
    goal = int((done & tr["succ"]).sum())
    tout = int((done & tr["tout"]).sum())
    esc = int((done & ~tr["succ"] & ~tr["tout"]
               & (np.abs(tr["xy"]) > 60.0).any(-1)).sum())
    z_hi = int((done & ~tr["succ"] & ~tr["tout"] & (tr["z"] > 2.0)).sum())
    z_lo = int((done & ~tr["succ"] & ~tr["tout"] & (tr["z"] < -0.5)).sum())
    other = n_ep - goal - tout - esc - z_hi - z_lo

    print(f"episodes={n_ep}  goal={goal}  timeout={tout}  z_high={z_hi}  "
          f"z_low={z_lo}  escape={esc}  other={other}")
    print(f"success_rate={goal / max(n_ep, 1):.3f}")
    # per-goal breakdown (multi-goal mazes: success carries the 1-based
    # goal id, envs/antmaze.py info["success"]; goal_reaching_env.py:37-48)
    gids = tr["goal_id"][done & tr["succ"]]
    n_goals = len(np.asarray(eval_env.env.goal_xy))
    per = {g: int((gids == g).sum()) for g in range(1, n_goals + 1)}
    if n_goals > 1:
        print(f"per-goal successes: {per}")
    z = tr["z"]
    print(f"z: mean={z.mean():.3f} p50={np.median(z):.3f} "
          f"p95={np.percentile(z, 95):.3f} p99={np.percentile(z, 99):.3f} "
          f"max={z.max():.3f}")
    d = np.linalg.norm(tr["xy"], axis=-1)
    print(f"|xy| from origin: p50={np.median(d):.2f} "
          f"p95={np.percentile(d, 95):.2f} max={d.max():.2f}")
    # how far toward a goal do episodes get?
    goals = np.asarray(eval_env.env.goal_xy)
    gd = np.linalg.norm(tr["xy"][:, :, None, :] - goals[None, None],
                        axis=-1).min(-1)
    print(f"goal distance: p5={np.percentile(gd, 5):.2f} "
          f"min={gd.min():.2f} (hit at <=0.5)")
    vz, hs = tr["vz"], tr["hinge"]
    print(f"vz: p99={np.percentile(np.abs(vz), 99):.2f} "
          f"max={np.abs(vz).max():.2f}   hinge: p99="
          f"{np.percentile(hs, 99):.2f} max={hs.max():.2f} "
          f"@clamp={(hs > 19.5).mean():.4f}")
    # the launch event: steps leading to the highest torso z
    t_pk, e_pk = np.unravel_index(np.argmax(tr["z"]), tr["z"].shape)
    lo = max(t_pk - 12, 0)
    print(f"launch trace (env {e_pk}, steps {lo}..{t_pk}):")
    for t in range(lo, t_pk + 1):
        print(f"  t={t:4d} z={tr['z'][t, e_pk]:7.3f} "
              f"vz={vz[t, e_pk]:7.2f} hinge={hs[t, e_pk]:6.2f} "
              f"xy=({tr['xy'][t, e_pk, 0]:6.2f},{tr['xy'][t, e_pk, 1]:6.2f})")


if __name__ == "__main__":
    main(sys.argv[1:])
