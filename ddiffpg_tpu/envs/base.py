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
