"""Env protocol + batched wrapper."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EnvState(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    t: jnp.ndarray          # step count within episode (int32)
    key: jax.Array          # per-env PRNG key (for auto-reset randomness)


class Transition(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray       # terminated | truncated (after auto-reset)
    info: Dict[str, jnp.ndarray]  # 'success' (int32), 'time_outs' (bool)


def pallas_step_padded(pallas_step, tile: int, qpos, qvel, ctrl):
    """Run the fused Pallas substep kernel at ANY batch size by padding the
    batch up to the kernel tile with copies of row 0 and slicing back.

    Train envs (256/1024/4096) hit the kernel exactly; eval envs (e.g. 20)
    previously fell back to the XLA channel-last engine, so on TPU the
    policy was TRAINED on one integrator and EVALUATED on another. The two
    agree to ~1e-5 in interpret mode (tests/test_pallas.py) but reach-level
    manipulation is sensitive to real-hardware numeric differences
    (runs/panda_sb_r3: train/return 10.0 vs in-run eval 0.00; the same
    checkpoint evals 0.30 on CPU). Padding keeps ONE dynamics everywhere
    on TPU at negligible cost (the kernel is lane-parallel; a 20-env eval
    pays one 256-lane tile)."""
    B = ctrl.shape[0]
    pad = (-B) % tile
    if pad == 0:
        return pallas_step(qpos, qvel, ctrl)
    idx = jnp.zeros(pad, jnp.int32)
    qp, qv = pallas_step(jnp.concatenate([qpos, qpos[idx]], 0),
                         jnp.concatenate([qvel, qvel[idx]], 0),
                         jnp.concatenate([ctrl, ctrl[idx]], 0))
    return qp[:B], qv[:B]


class VecEnv:
    """vmap wrapper over a single-env functional environment.

    Equivalent of gym.vector.make + the reference's torch bridge wrappers
    (`/root/reference/ddiffpg/wrappers/d4rl_wrapper.py:9-45`), except envs
    live on device and auto-reset inside `step` while still reporting the
    *true* terminal next_obs for the finished transition (the reference
    discards it, bootstrapping off the reset obs — we keep semantics clean
    since `handle_timeout` consumers only need done XOR time_outs).
    """

    def __init__(self, env, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        self._reset = jax.vmap(env.reset)
        # envs with a channel-last batched step (env batch on TPU lanes
        # through the physics) use it; others get plain vmap
        self._step = getattr(env, "step_batched", None) or jax.vmap(env.step)

    @property
    def obs_dim(self):
        return self.env.obs_dim

    @property
    def action_dim(self):
        return self.env.action_dim

    @property
    def max_episode_length(self):
        return self.env.max_episode_steps

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, state, action):
        return self._step(state, action)
