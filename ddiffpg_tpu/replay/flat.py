"""Preallocated ring replay buffer with a target-action column.

Counterpart of the reference `ReplayBuffer`
(`/root/reference/ddiffpg/replay/simple_replay.py:22-95`): wraparound
writes, uniform sampling, and `update_target_action` writing DIPO-improved
actions back at the last-sampled indices. Functional state pytree; lives in
HBM inside the jitted train step (no host round trips).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FlatReplay(NamedTuple):
    obs: jnp.ndarray            # [C, D]
    action: jnp.ndarray         # [C, A]
    target_action: jnp.ndarray  # [C, A]
    reward: jnp.ndarray         # [C, 1]
    next_obs: jnp.ndarray       # [C, D]
    done: jnp.ndarray           # [C, 1] bool
    ptr: jnp.ndarray            # scalar int32
    size: jnp.ndarray           # scalar int32

    @staticmethod
    def create(capacity: int, obs_dim: int, action_dim: int) -> "FlatReplay":
        return FlatReplay(
            obs=jnp.zeros((capacity, obs_dim)),
            action=jnp.zeros((capacity, action_dim)),
            target_action=jnp.zeros((capacity, action_dim)),
            reward=jnp.zeros((capacity, 1)),
            next_obs=jnp.zeros((capacity, obs_dim)),
            done=jnp.zeros((capacity, 1), bool),
            ptr=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(0, jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def add(buf: FlatReplay, obs, action, reward, next_obs, done) -> FlatReplay:
    """Add a batch of B transitions with wraparound."""
    B = obs.shape[0]
    C = buf.capacity
    idx = (buf.ptr + jnp.arange(B)) % C
    return buf._replace(
        obs=buf.obs.at[idx].set(obs),
        action=buf.action.at[idx].set(action),
        target_action=buf.target_action.at[idx].set(action),
        reward=buf.reward.at[idx].set(reward.reshape(B, 1)),
        next_obs=buf.next_obs.at[idx].set(next_obs),
        done=buf.done.at[idx].set(done.reshape(B, 1).astype(bool)),
        ptr=(buf.ptr + B) % C,
        size=jnp.minimum(buf.size + B, C),
    )


def sample(buf: FlatReplay, key, batch_size: int):
    """Uniform sample. Returns (batch tuple, indices)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return (
        buf.obs[idx], buf.action[idx], buf.target_action[idx],
        buf.reward[idx], buf.next_obs[idx],
        buf.done[idx].astype(jnp.float32),
    ), idx


def update_target_action(buf: FlatReplay, idx, new_action) -> FlatReplay:
    return buf._replace(target_action=buf.target_action.at[idx].set(new_action))
