"""C51 categorical projection, MXU-friendly.

Same semantics as the reference's scatter-based projection
(`/root/reference/ddiffpg/utils/distl_util.py:4-20`) — including its
l/u tie-breaking adjustments — but expressed as a batched one-hot einsum so
XLA maps it onto the MXU instead of serialized scatter-adds.
"""

from __future__ import annotations

import jax.numpy as jnp


def projection(next_dist: jnp.ndarray, reward: jnp.ndarray, done: jnp.ndarray,
               gamma: float, v_min: float, v_max: float, num_atoms: int,
               support: jnp.ndarray) -> jnp.ndarray:
    """Project `reward + (1-done)*gamma*z` onto the fixed support.

    next_dist: [B, A] categorical probabilities at the next state.
    reward, done: [B, 1] (or [B]).
    Returns [B, A].
    """
    reward = reward.reshape(-1, 1)
    done = done.reshape(-1, 1).astype(next_dist.dtype)
    delta_z = (v_max - v_min) / (num_atoms - 1)

    target_z = jnp.clip(reward + (1.0 - done) * gamma * support, v_min, v_max)
    b = (target_z - v_min) / delta_z                     # [B, A]
    l = jnp.floor(b).astype(jnp.int32)
    u = jnp.ceil(b).astype(jnp.int32)

    # tie-breaking exactly as distl_util.py:13-14: the second adjustment
    # tests the already-updated l, so at most one of the two fires
    eq = l == u
    l = jnp.where((u > 0) & eq, l - 1, l)
    u = jnp.where((l < (num_atoms - 1)) & (l == u), u + 1, u)

    w_l = next_dist * (u.astype(b.dtype) - b)            # mass to lower bin
    w_u = next_dist * (b - l.astype(b.dtype))            # mass to upper bin

    onehot_l = jnp.eye(num_atoms, dtype=next_dist.dtype)[l]   # [B, A, A]
    onehot_u = jnp.eye(num_atoms, dtype=next_dist.dtype)[u]
    proj = jnp.einsum("ba,bak->bk", w_l, onehot_l) + jnp.einsum(
        "ba,bak->bk", w_u, onehot_u)
    return proj


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray,
                         eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise-mean BCE on probabilities (torch F.binary_cross_entropy).

    The reference trains C51 critics with BCE between the predicted and the
    projected categorical distributions (algo/ddiffpg.py:348)."""
    pred = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log1p(-pred))
