"""NeRF-style positional encoding for the intrinsic-novelty nets.

Same layout as the reference's Embedder
(`/root/reference/ddiffpg/utils/intrinsic.py:123-175`): identity followed by
interleaved [sin(f_k x), cos(f_k x)] with log-spaced frequencies
f_k = 2^k, k = 0..L-1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def posenc_dim(input_dims: int, L: int, include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * L)


def posenc(x: jnp.ndarray, L: int, include_input: bool = True) -> jnp.ndarray:
    """x: [..., d] -> [..., d*(include + 2L)], fn order: id, sin f0, cos f0, ..."""
    freqs = jnp.asarray(2.0 ** np.arange(L), x.dtype)          # [L]
    xf = x[..., None, :] * freqs[:, None]                      # [..., L, d]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    interleaved = jnp.stack([sin, cos], axis=-2)               # [..., L, 2, d]
    flat = interleaved.reshape(*x.shape[:-1], 2 * L * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, flat], axis=-1)
    return flat
