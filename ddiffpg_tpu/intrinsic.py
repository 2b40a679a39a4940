"""Intrinsic exploration reward: NovelD (default) and RND.

Functional counterpart of `IntrinsicM`
(`/root/reference/ddiffpg/utils/intrinsic.py:8-94`):
  novelty(s)   = || predictor(s) - target(s) ||_2
  NovelD(s,s') = 0.01 * max(novelty(s') - 0.5 * novelty(s), 0)
with optional NeRF positional encoding of the xy (antmaze) / xyz
(manipulation) position channels before the RND nets, and running-std
normalization of novelty after a warmup number of updates.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ddiffpg_tpu.models.mlp import RNDModel
from ddiffpg_tpu.ops import running_stats as rs
from ddiffpg_tpu.ops.posenc import posenc


class IntrinsicState(NamedTuple):
    params: Any
    opt_state: Any
    rms: rs.RunningMeanStd
    update_step: jnp.ndarray


class IntrinsicModule:
    def __init__(self, obs_dim: int, kind: str = "noveld", pos_dim: int = 2,
                 normalize: bool = False, pos_enc: bool = True, L: int = 10,
                 warm_up: int = 1000, lr: float = 1e-4, scale: float = 0.01,
                 depth_scale: float = 0.0):
        assert kind in ("noveld", "rnd")
        self.kind = kind
        self.pos_dim = pos_dim          # 2 for antmaze xy, 3 for manipulation
        self.normalize = normalize
        self.pos_enc = pos_enc
        self.L = L
        self.warm_up = warm_up
        self.scale = scale
        # Opt-in deviation from the reference's flat 0.01 scale: multiply the
        # bonus by (1 + depth_scale * ||pos||). On long-corridor mazes the
        # flat NovelD bonus saturates near spawn before the deep corridors
        # are covered (antmaze-v3 coverage plateaued at 0.43, RESULTS.md);
        # a distance prior keeps exploration pressure on the frontier.
        self.depth_scale = depth_scale
        self.obs_dim = obs_dim
        self.in_dim = obs_dim + (pos_dim * 2 * L if pos_enc else 0)
        self.net = RNDModel()
        self.tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))

    def init(self, key) -> IntrinsicState:
        params = self.net.init(key, jnp.zeros((1, self.in_dim)))
        return IntrinsicState(
            params=params,
            opt_state=self.tx.init(params),
            rms=rs.RunningMeanStd.create(()),
            update_step=jnp.asarray(0, jnp.int32),
        )

    def encode(self, obs):
        if not self.pos_enc:
            return obs
        pos = posenc(obs[:, :self.pos_dim], self.L)
        return jnp.concatenate([pos, obs[:, self.pos_dim:]], axis=-1)

    def novelty(self, params, obs_encoded):
        pred, tgt = self.net.apply(params, obs_encoded)
        return jnp.linalg.norm(pred - tgt, axis=-1)

    def compute_reward(self, state: IntrinsicState, obs, next_obs=None):
        """Returns (reward [B,1], new_state). Matches intrinsic.py:33-63."""
        obs_e = self.encode(obs)
        nov = self.novelty(state.params, obs_e)
        rms = state.rms
        warm = state.update_step > self.warm_up

        if self.kind == "rnd":
            if self.normalize:
                rms = jax.tree.map(
                    lambda a, b: jnp.where(warm, a, b), rs.update(rms, nov), rms)
                nov = jnp.where(warm, rs.normalize(rms, nov), nov)
            return nov[:, None], state._replace(rms=rms)

        next_e = self.encode(next_obs)
        nov_next = self.novelty(state.params, next_e)
        if self.normalize:
            r1 = rs.update(rms, nov)
            r2 = rs.update(r1, nov_next)
            rms = jax.tree.map(lambda a, b: jnp.where(warm, a, b), r2, rms)
            nov = jnp.where(warm, rs.normalize(rms, nov), nov)
            nov_next = jnp.where(warm, rs.normalize(rms, nov_next), nov_next)
        intr = nov_next - 0.5 * nov
        r = self.scale * jnp.maximum(intr, 0.0)
        if self.depth_scale > 0.0:
            depth = jnp.linalg.norm(next_obs[:, :self.pos_dim], axis=-1)
            r = r * (1.0 + self.depth_scale * depth)
        return r[:, None], state._replace(rms=rms)

    def update(self, state: IntrinsicState, obs):
        """One RND predictor MSE step on (encoded) obs. Returns
        (new_state, loss, grad_norm)."""
        obs_e = self.encode(obs)

        def loss_fn(params):
            pred, tgt = self.net.apply(params, obs_e)
            return jnp.mean((pred - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        from ddiffpg_tpu.agents import base as _base

        grads = _base.maybe_pmean(grads)
        gnorm = optax.global_norm(grads)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state,
                              update_step=state.update_step + 1), loss, gnorm
