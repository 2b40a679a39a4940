"""N-step return folding over vectorized rollouts.

Functional counterpart of the reference's `NStepReplay` +
`compute_nstep_return` (`/root/reference/ddiffpg/replay/nstep_replay.py`):
a FIFO window of the last n transitions per env, emitting the n-step-folded
transition with early-done masking once the window is full.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class NStepState(NamedTuple):
    obs: jnp.ndarray        # [E, n, D]
    action: jnp.ndarray     # [E, n, A]
    reward: jnp.ndarray     # [E, n, 1]
    next_obs: jnp.ndarray   # [E, n, D]
    done: jnp.ndarray       # [E, n, 1] bool
    count: jnp.ndarray      # scalar int32

    @staticmethod
    def create(num_envs: int, nstep: int, obs_dim: int, action_dim: int):
        return NStepState(
            obs=jnp.zeros((num_envs, nstep, obs_dim)),
            action=jnp.zeros((num_envs, nstep, action_dim)),
            reward=jnp.zeros((num_envs, nstep, 1)),
            next_obs=jnp.zeros((num_envs, nstep, obs_dim)),
            done=jnp.zeros((num_envs, nstep, 1), bool),
            count=jnp.asarray(0, jnp.int32),
        )


def _shift(buf, new):
    return jnp.concatenate([buf[:, 1:], new[:, None]], axis=1)


def fold_window(reward, done, next_obs, gamma: float):
    """Fold an [E, n, ...] window into n-step (reward, next_obs, done).

    Semantics of compute_nstep_return (nstep_replay.py:57-75): rewards are
    discount-summed up to and including the first done; next_obs is taken at
    the first done (or the last slot); done is true iff any slot is done.
    """
    n = reward.shape[1]
    d = done[..., 0]                                   # [E, n]
    done_any = d.any(axis=1)
    first_done = jnp.argmax(d, axis=1)                 # 0 if none
    steps = jnp.where(done_any, first_done, n - 1)     # [E]
    mask = jnp.arange(n)[None, :] <= steps[:, None]    # [E, n]
    gammas = jnp.asarray(gamma ** np.arange(n), reward.dtype)[None, :, None]
    r = (reward * gammas * mask[..., None]).sum(axis=1)          # [E, 1]
    nobs = jnp.take_along_axis(next_obs, steps[:, None, None], axis=1)[:, 0]
    return r, nobs, done_any[:, None]


def push(state: NStepState, obs, action, reward, done, next_obs, gamma: float):
    """Push one vector-env transition; emit the folded transition + validity.

    reward: [E, 1]; done: [E, 1] bool. Returns (state, (obs0, act0, r, nobs,
    dn, valid)) where valid is False until the window has filled.
    """
    st = NStepState(
        obs=_shift(state.obs, obs),
        action=_shift(state.action, action),
        reward=_shift(state.reward, reward),
        next_obs=_shift(state.next_obs, next_obs),
        done=_shift(state.done, done),
        count=state.count + 1,
    )
    n = st.obs.shape[1]
    r, nobs, dn = fold_window(st.reward, st.done, st.next_obs, gamma)
    valid = st.count >= n
    return st, (st.obs[:, 0], st.action[:, 0], r, nobs, dn, valid)
