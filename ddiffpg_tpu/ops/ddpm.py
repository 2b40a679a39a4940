"""Closed-form DDPM scheduler tables and steps.

Replaces HuggingFace `diffusers.DDPMScheduler` as used by the reference
(`/root/reference/ddiffpg/models/diffusion_mlp.py:167-173`): the
`squaredcos_cap_v2` beta schedule, epsilon prediction, `clip_sample=True`,
and the default `fixed_small` posterior variance. Everything is a
precomputed table + a pure function, so the K-step reverse process compiles
into a single `lax.scan` on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDPMTables(NamedTuple):
    betas: jnp.ndarray            # [T]
    alphas: jnp.ndarray           # [T]
    alphas_cumprod: jnp.ndarray   # [T]
    num_timesteps: int


def squaredcos_cap_v2_betas(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal), capped at 0.999."""

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def linear_betas(num_timesteps: int, beta_start=1e-4, beta_end=2e-2) -> np.ndarray:
    return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)


def vp_betas(num_timesteps: int, beta_min=0.1, beta_max=10.0) -> np.ndarray:
    """Variance-preserving SDE discrete betas (as in the reference's baseline
    `Diffusion` model, models/baseline_helpers.py vp schedule)."""
    t = np.arange(1, num_timesteps + 1, dtype=np.float64)
    T = num_timesteps
    alpha = np.exp(-beta_min / T - 0.5 * (beta_max - beta_min) * (2 * t - 1) / T**2)
    return 1.0 - alpha


def make_tables(num_timesteps: int, schedule: str = "squaredcos_cap_v2",
                dtype=jnp.float32) -> DDPMTables:
    if schedule == "squaredcos_cap_v2" or schedule == "cosine":
        betas = squaredcos_cap_v2_betas(num_timesteps)
    elif schedule == "linear":
        betas = linear_betas(num_timesteps)
    elif schedule == "vp":
        betas = vp_betas(num_timesteps)
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    return DDPMTables(
        betas=jnp.asarray(betas, dtype),
        alphas=jnp.asarray(alphas, dtype),
        alphas_cumprod=jnp.asarray(acp, dtype),
        num_timesteps=num_timesteps,
    )


def add_noise(tables: DDPMTables, x0: jnp.ndarray, noise: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """Forward process q(x_t | x_0). t: int array broadcastable to x0[:, None]."""
    acp = tables.alphas_cumprod[t]
    while acp.ndim < x0.ndim:
        acp = acp[..., None]
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def step(tables: DDPMTables, eps_pred: jnp.ndarray, t: jnp.ndarray,
         x_t: jnp.ndarray, noise: jnp.ndarray, clip_sample: bool = True,
         ) -> jnp.ndarray:
    """One reverse step x_t -> x_{t-1} (epsilon parameterization,
    fixed_small variance, clip_sample on predicted x0 — matching
    diffusers' DDPMScheduler.step with the reference's settings).

    `noise` must be standard normal of x_t's shape (ignored at t == 0).
    `t` is a scalar int (traced OK).
    """
    beta_t = tables.betas[t]
    alpha_t = tables.alphas[t]
    acp_t = tables.alphas_cumprod[t]
    acp_prev = jnp.where(t > 0, tables.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)

    # predicted x0
    x0 = (x_t - jnp.sqrt(1.0 - acp_t) * eps_pred) / jnp.sqrt(acp_t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    # posterior mean coefficients (DDPM eq. 7)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x_t

    # fixed_small: var = beta_t * (1 - acp_prev) / (1 - acp_t), floored at 1e-20
    var = jnp.clip(beta_t * (1.0 - acp_prev) / (1.0 - acp_t), min=1e-20)
    sigma = jnp.sqrt(var)
    return mean + jnp.where(t > 0, sigma, 0.0) * noise


def reverse_scan(tables: DDPMTables, eps_fn, key: jax.Array, x_init: jnp.ndarray,
                 clip_sample: bool = True) -> jnp.ndarray:
    """Run the full K-step reverse process as one lax.scan.

    eps_fn(x, t) -> predicted noise; t is a scalar int32.
    Matches the reference's inference loop over DDPMScheduler.timesteps
    (diffusion_mlp.py:227-247).
    """
    T = tables.num_timesteps
    keys = jax.random.split(key, T)

    def body(x, inp):
        t, k = inp
        eps = eps_fn(x, t)
        noise = jax.random.normal(k, x.shape, x.dtype)
        return step(tables, eps, t, x, noise, clip_sample), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x_init, (ts, keys))
    return x
