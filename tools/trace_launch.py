#!/usr/bin/env python
"""Deterministic repro + substep forensics for residual launch events.

Replays the eval_ckpt.py rollout (same seed/env construction), captures
full (qpos, qvel) per control step for one env, finds the first control
step where planar COM speed jumps past a threshold, then re-simulates
that step substep-by-substep with per-body contact diagnostics
(penetration depth, normal impulse sums, budget scales, friction), on
the per-env reference engine (physics/engine.py).

Usage:
    python tools/trace_launch.py runs/<run>/ckpt.pkl [env=antmaze-v1]
        [eval_envs=40] [seed=7] [env_id=4] [vxy_jump=5.0]

CPU-only; never touches the TPU.
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
    from ddiffpg_tpu.physics import engine
    from ddiffpg_tpu.utils import checkpoint as ckpt

    path = argv[0]
    kw = dict(a.split("=", 1) for a in argv[1:])
    env_name = kw.get("env", "antmaze-v1")
    eval_envs = int(kw.get("eval_envs", 40))
    seed = int(kw.get("seed", 7))
    vxy_jump = float(kw.get("vxy_jump", 5.0))

    cfg = C.Config(algo=C.algo_preset("ddiffpg"))
    cfg = cfg.override_strings([f"env.name={env_name}"])
    cfg = C.preprocess(cfg)
    env = make(env_name, num_envs=int(kw.get("num_envs", 256)),
               random_init=True)
    agent = make_agent(cfg.algo.name, env, cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    ts, _ = ckpt.load(path, ts)
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
            st2, obs2, rew, done, info = eval_env.step(st, act)
            out = dict(qpos=st.qpos, qvel=st.qvel, act=act, done=done)
            return (st2, obs2), out
        keys = jax.random.split(key, T)
        _, tr = jax.lax.scan(body, (st, obs), keys)
        return tr

    tr = jax.device_get(rollout(jax.random.PRNGKey(seed)))
    qpos, qvel, acts = tr["qpos"], tr["qvel"], tr["act"]   # [T, E, ...]
    if "save" in kw:
        np.savez_compressed(kw["save"], qpos=qpos, qvel=qvel, act=acts,
                            done=tr["done"])
        print(f"saved trajectory -> {kw['save']}")

    # find worst planar-speed jump across envs/steps
    vxy = np.linalg.norm(qvel[:, :, :2], axis=-1)          # [T, E]
    if "env_id" in kw:
        e = int(kw["env_id"])
    else:
        e = int(np.unravel_index(np.argmax(vxy), vxy.shape)[1])
    v_e = vxy[:, e]
    jumps = np.where(np.diff(v_e) > vxy_jump)[0]
    t0 = int(jumps[0]) if len(jumps) else int(np.argmax(v_e)) - 1
    print(f"env {e}: max |vxy| {v_e.max():.2f} at t={int(np.argmax(v_e))}; "
          f"first jump >{vxy_jump} m/s at t={t0} "
          f"({v_e[t0]:.2f} -> {v_e[t0 + 1]:.2f})")
    for t in range(max(t0 - 3, 0), min(t0 + 3, T)):
        print(f"  t={t:4d} xy=({qpos[t, e, 0]:7.2f},{qpos[t, e, 1]:7.2f}) "
              f"z={qpos[t, e, 2]:6.3f} |vxy|={v_e[t]:7.2f} "
              f"vz={qvel[t, e, 2]:7.2f} |w|={np.linalg.norm(qvel[t, e, 3:6]):6.2f} "
              f"|qd|max={np.abs(qvel[t, e, 6:]).max():6.2f}")

    # ---- substep forensics on the jump step --------------------------------
    m = eval_env.env.model
    qp = jnp.asarray(qpos[t0, e])
    qv = jnp.asarray(qvel[t0, e])
    ctrl = jnp.asarray(acts[t0, e])
    n_sub = int(m.n_substeps)

    def diag(m, qpos, qvel):
        body_pos, body_quat = engine.fk(m, qpos)
        S = engine.dof_subspaces(m, body_pos, body_quat)
        u = engine.qvel_to_u(m, qvel, body_pos)
        V = engine.body_velocities(m, S, u)
        gpos, gquat = engine._geom_world(m, body_pos, body_quat)
        pts, rads, gidx = engine._sphere_points(m, gpos, gquat)
        pen_f = jnp.maximum(-(pts[:, 2] - rads), 0.0)
        out = {"pen_floor_max": pen_f.max()}
        if m.nsb > 0:
            bmin = jnp.asarray(m.static_box_min)[None]
            bmax = jnp.asarray(m.static_box_max)[None]
            d_b, _ = engine._point_box_distance(pts[:, None, :], bmin, bmax)
            out["pen_wall_max"] = jnp.maximum(-(d_b - rads[:, None]), 0.0).max()
        F = engine.contact_forces(m, body_pos, body_quat, V)
        out["Fz_sum"] = F[:, 5].sum()
        out["Fxy_max"] = jnp.abs(F[:, 3:5]).max()
        return out

    print(f"substep forensics at t={t0} (dt={float(m.dt)}, {n_sub} substeps):")
    for s in range(n_sub):
        d = {k: float(v) for k, v in diag(m, qp, qv).items()}
        vxy_s = float(jnp.linalg.norm(qv[:2]))
        print(f"  s={s:2d} z={float(qp[2]):7.3f} |vxy|={vxy_s:8.2f} "
              f"vz={float(qv[2]):8.2f} "
              + " ".join(f"{k}={v:10.2f}" for k, v in d.items()))
        qp, qv = engine.substep(m, qp, qv, ctrl)
        if not bool(jnp.isfinite(qv).all()):
            print("  NaN/inf in qvel — stopping")
            break
    vxy_s = float(jnp.linalg.norm(qv[:2]))
    print(f"  end  z={float(qp[2]):7.3f} |vxy|={vxy_s:8.2f} "
          f"vz={float(qv[2]):8.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
