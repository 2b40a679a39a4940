"""Exploration noise (reference: /root/reference/ddiffpg/utils/noise.py).

`add_mixed_normal_noise` anneals the noise std linearly across the *env
batch dimension* (std linspace std_min -> std_max over envs) — the
reference's trick for heterogeneous exploration across the vector env.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class FixedNormalActionNoise:
    """Stateless N(mu, std) action-noise sampler with optional truncation
    (reference utils/noise.py:5-16)."""

    def __init__(self, mean, std, bounds=None):
        self.mean = mean
        self.std = std
        self.bounds = bounds

    def __call__(self, key, shape=(), truncated=False):
        s = jax.random.normal(key, shape) * self.std + self.mean
        if truncated and self.bounds is not None:
            s = jnp.clip(s, self.bounds[0], self.bounds[1])
        return s


def add_normal_noise(key, x, std, noise_bounds=None, out_bounds=None):
    noise = jax.random.normal(key, x.shape, x.dtype) * std
    if noise_bounds is not None:
        noise = jnp.clip(noise, noise_bounds[0], noise_bounds[1])
    out = x + noise
    if out_bounds is not None:
        out = jnp.clip(out, out_bounds[0], out_bounds[1])
    return out


def add_mixed_normal_noise(key, x, std_min, std_max, noise_bounds=None,
                           out_bounds=None):
    std_seq = jnp.linspace(std_min, std_max, x.shape[0], dtype=x.dtype)[:, None]
    noise = jax.random.normal(key, x.shape, x.dtype) * std_seq
    if noise_bounds is not None:
        noise = jnp.clip(noise, noise_bounds[0], noise_bounds[1])
    out = x + noise
    if out_bounds is not None:
        out = jnp.clip(out, out_bounds[0], out_bounds[1])
    return out
