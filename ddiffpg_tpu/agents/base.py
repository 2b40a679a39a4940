"""Shared agent machinery: optimizers, trackers, exploration noise, the
C51 critic update, and the DIPO action-gradient loop.

Mirrors `ActorCriticBase` (`/root/reference/ddiffpg/algo/ac_base.py`) plus
the pieces every agent repeats (critic projection update ddiffpg.py:322-351,
action gradient ddiffpg.py:358-373)."""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddiffpg_tpu.ops import distributional, noise as noise_ops


# --- data-parallel gradient reduction hook ---------------------------------
# When a train step runs inside shard_map over a mesh axis (parallel/dp.py),
# this axis name is set during tracing and every optimizer update pmean-s its
# gradients across shards first — the DP allreduce, riding ICI.
_PMEAN_AXIS: Optional[str] = None


class data_parallel:
    def __init__(self, axis: str):
        self.axis = axis

    def __enter__(self):
        global _PMEAN_AXIS
        self._prev = _PMEAN_AXIS
        _PMEAN_AXIS = self.axis

    def __exit__(self, *a):
        global _PMEAN_AXIS
        _PMEAN_AXIS = self._prev


def pmean_axis() -> Optional[str]:
    return _PMEAN_AXIS


def maybe_pmean(tree):
    if _PMEAN_AXIS is not None:
        return jax.lax.pmean(tree, _PMEAN_AXIS)
    return tree


def maybe_psum(v):
    if _PMEAN_AXIS is not None:
        return jax.lax.psum(v, _PMEAN_AXIS)
    return v


def update_rms(rms, x):
    """Fold a batch into a RunningMeanStd; under DP the batch moments are
    reduced across shards first so the replicated rms stays bit-identical
    on every device. Single-chip this equals rs.update exactly.

    Uses central moments + the Chan between-shard correction rather than
    E[x^2]-E[x]^2: for channels with |mean| >> std the raw-second-moment
    subtraction cancels catastrophically in f32 and can zero the variance,
    making normalize() blow obs up by 1/sqrt(eps)."""
    from ddiffpg_tpu.ops import running_stats as rs

    local_mean = x.mean(axis=0)
    local_var = x.var(axis=0)                      # central, stable
    mean = maybe_pmean(local_mean)
    # within-shard variance + between-shard mean spread (equal shard sizes)
    var = maybe_pmean(local_var) + maybe_pmean(
        jnp.square(local_mean - mean))
    count = maybe_psum(x.shape[0])
    return rs.update_from_stats(rms, mean, var, count)


def make_optimizer(lr: float, max_grad_norm: Optional[float], weight_decay=True):
    opt = optax.adamw(lr) if weight_decay else optax.adam(lr, eps=1e-5)
    if max_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return optax.chain(opt)


def apply_update(tx, params, opt_state, grads):
    grads = maybe_pmean(grads)
    gnorm = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, gnorm


def soft_update(target, current, tau: float):
    return jax.tree.map(lambda t, c: c * tau + t * (1.0 - tau), target, current)


class Tracker(NamedTuple):
    """Fixed-window moving stats ring (reference Tracker, common.py:133-156:
    a zero-initialized deque, so the mean includes zeros until full)."""
    buf: jnp.ndarray
    ptr: jnp.ndarray

    @staticmethod
    def create(window: int) -> "Tracker":
        # ptr is shape-[1] so the whole tracker shards cleanly per-device
        return Tracker(buf=jnp.zeros((window,)), ptr=jnp.zeros((1,), jnp.int32))

    def mean(self):
        return self.buf.mean()


def tracker_push_masked(tr: Tracker, values, mask) -> Tracker:
    """Push values[mask] in ring order. values [E], mask [E] bool.
    Formulated as a gather over window positions (no scatter conflicts)."""
    W = tr.buf.shape[0]
    rank = jnp.cumsum(mask) - 1
    pos = (tr.ptr[0] + rank) % W
    hit = mask[None, :] & (pos[None, :] == jnp.arange(W)[:, None])  # [W, E]
    land = hit.any(axis=1)
    src = jnp.argmax(hit, axis=1)
    buf = jnp.where(land, values[src], tr.buf)
    return Tracker(buf=buf, ptr=(tr.ptr + mask.sum()) % W)


class EpisodeStats(NamedTuple):
    """Running per-env return/length + finished-episode windows
    (reference update_tracker, ac_base.py:69-81)."""
    current_returns: jnp.ndarray
    current_lengths: jnp.ndarray
    return_tracker: Tracker
    step_tracker: Tracker

    @staticmethod
    def create(num_envs: int, window: int) -> "EpisodeStats":
        return EpisodeStats(
            current_returns=jnp.zeros((num_envs,)),
            current_lengths=jnp.zeros((num_envs,)),
            return_tracker=Tracker.create(window),
            step_tracker=Tracker.create(window),
        )


def update_stats(st: EpisodeStats, reward, done) -> EpisodeStats:
    cr = st.current_returns + reward
    cl = st.current_lengths + 1.0
    done = done.astype(bool)
    rt = tracker_push_masked(st.return_tracker, cr, done)
    sp = tracker_push_masked(st.step_tracker, cl, done)
    return EpisodeStats(
        current_returns=jnp.where(done, 0.0, cr),
        current_lengths=jnp.where(done, 0.0, cl),
        return_tracker=rt, step_tracker=sp)


def noise_std(noise_cfg, it):
    """Decayed exploration std for 'fixed' noise (reference noise_scheduler,
    ac_base.py:94-102; decay is None in every shipped config)."""
    from ddiffpg_tpu.ops import schedules

    if noise_cfg.decay == "linear":
        return schedules.linear(it, noise_cfg.std_max, noise_cfg.std_min,
                                noise_cfg.lin_decay_iters)
    if noise_cfg.decay == "exp":
        return schedules.exponential(it, noise_cfg.std_max,
                                     noise_cfg.exp_decay_rate,
                                     noise_cfg.std_min)
    return noise_cfg.std_max


def explore_action(key, actor_apply, obs, noise_cfg, noise_val=None):
    """Policy action + exploration noise ('fixed' | 'mixed'),
    reference get_actions (td3.py:54-73)."""
    k1, k2 = jax.random.split(key)
    actions = actor_apply(k1, obs)
    if noise_cfg.type == "fixed":
        std = noise_val if noise_val is not None else noise_cfg.std_max
        return noise_ops.add_normal_noise(k2, actions, std, out_bounds=(-1, 1))
    if noise_cfg.type == "mixed":
        return noise_ops.add_mixed_normal_noise(
            k2, actions, std_min=noise_cfg.std_min, std_max=noise_cfg.std_max,
            out_bounds=(-1, 1))
    raise NotImplementedError(noise_cfg.type)


def tgt_policy_action(key, actor_apply, obs, noise_cfg):
    """Target-policy smoothing (td3.py:75-84)."""
    k1, k2 = jax.random.split(key)
    actions = actor_apply(k1, obs)
    b = noise_cfg.tgt_pol_noise_bound
    return noise_ops.add_normal_noise(
        k2, actions, noise_cfg.tgt_pol_std, noise_bounds=(-b, b),
        out_bounds=(-1, 1))


def distributional_critic_loss(critic_apply, critic_params, target_params,
                               z_atoms, obs, action, reward, next_obs,
                               next_actions, done, gamma, v_min, v_max,
                               num_atoms):
    """C51 double-critic BCE loss with the projected, elementwise-min target
    (reference update_critic, ddiffpg.py:322-351)."""
    q1_t, q2_t = critic_apply(target_params, next_obs, next_actions)
    proj = lambda q: distributional.projection(
        q, reward, done, gamma, v_min, v_max, num_atoms, z_atoms)
    target_q = jax.lax.stop_gradient(jnp.minimum(proj(q1_t), proj(q2_t)))

    def loss_fn(params):
        q1, q2 = critic_apply(params, obs, action)
        return (distributional.binary_cross_entropy(q1, target_q)
                + distributional.binary_cross_entropy(q2, target_q))

    return loss_fn


def action_gradient(q_min_fn, obs, action, n_steps: int, lr: float,
                    max_grad_norm: Optional[float] = 1.0):
    """DIPO action gradient: n Adam(eps=1e-5) ascent steps on
    argmax_a Qmin(s, a), clamped to +-(1 - 1e-5)
    (reference update_target_action, ddiffpg.py:358-373). One lax.scan —
    replaces 20 sequential torch fwd/bwd launches with a fused loop."""
    lim = 1.0 - 1e-5
    tx = make_optimizer(lr, max_grad_norm, weight_decay=False)
    a0 = jnp.clip(action, -lim, lim)
    opt_state = tx.init(a0)

    def body(carry, _):
        a, opt = carry
        grads = jax.grad(lambda aa: -q_min_fn(obs, aa).mean())(a)
        updates, opt = tx.update(grads, opt, a)
        a = jnp.clip(optax.apply_updates(a, updates), -lim, lim)
        return (a, opt), None

    (a, _), _ = jax.lax.scan(body, (a0, opt_state), None, length=n_steps)
    return jax.lax.stop_gradient(a)
