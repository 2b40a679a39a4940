#!/usr/bin/env python
"""Standalone energy-injection probe for the ant physics.

Drives a batch of ants with adversarial open-loop torque patterns
(constant max, bang-bang at several frequencies, uniform random) and
reports the worst torso height / vertical speed / hinge speed reached.
A physically sane ant with gear-30 motors should top out around one body
height; metres of altitude or hinge speeds pinned at the qvel clamp point
at an energy leak (e.g. joint-limit springs integrated above their
stability limit on light links).

Usage: python tools/probe_energy.py [steps=300] [envs=8]
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
    from ddiffpg_tpu.envs import make

    kw = dict(a.split("=", 1) for a in argv)
    T = int(kw.get("steps", 300))
    E = int(kw.get("envs", 8))

    env = make("antmaze-v1", num_envs=E, random_init=False, use_pallas=False)

    def pattern(name, t, key):
        if name == "const+":
            return jnp.ones((E, 8))
        if name == "const-":
            return -jnp.ones((E, 8))
        if name == "alternate":
            # opposing hips/ankles, sign flips per env to vary phase
            base = jnp.tile(jnp.array([1.0, -1.0]), 4)
            return jnp.sign(jnp.sin(0.5 * t + jnp.arange(E)[:, None])) * base
        if name.startswith("bang"):
            hz = float(name[4:])
            phase = jnp.sign(jnp.sin(2 * jnp.pi * hz * 0.1 * t))
            return phase * jnp.ones((E, 8))
        if name == "random":
            return jax.random.uniform(key, (E, 8), minval=-1, maxval=1)
        raise ValueError(name)

    for name in ["const+", "const-", "alternate", "bang1", "bang2.5",
                 "bang5", "random"]:
        @jax.jit
        def roll(key, name=name):
            st, obs = env.reset(key)

            def body(carry, tk):
                st, obs = carry
                t, k = tk
                act = pattern(name, t, k)
                st, obs, rew, done, info = env.step(st, act)
                # obs is pre-reset: z, vz, hinge speeds of the true state
                stats = (obs[:, 2], obs[:, 17],
                         jnp.abs(obs[:, 21:29]).max(-1), done)
                return (st, obs), stats
            ts = jnp.arange(T, dtype=jnp.float32)
            ks = jax.random.split(key, T)
            _, (z, vz, hs, done) = jax.lax.scan(body, (st, obs), (ts, ks))
            return z, vz, hs, done

        z, vz, hs, done = jax.device_get(roll(jax.random.PRNGKey(0)))
        print(f"{name:10s} z_max={z.max():6.2f}  vz_max={np.abs(vz).max():6.2f}"
              f"  hinge_max={hs.max():6.2f}  hinge@clamp="
              f"{(hs > 19.5).mean():.3f}  dones={int(done.sum())}")


if __name__ == "__main__":
    main(sys.argv[1:])
