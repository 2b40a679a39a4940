"""DDPM diffusion policy (the DDiffPG/DIPO actor).

TPU-native counterpart of `/root/reference/ddiffpg/models/diffusion_mlp.py`:
the noise-prediction net is the same architecture family (sinusoidal time
embedding -> 256→1024→256 Mish time-MLP; 1024-512-256 Mish trunk), but the
K-step reverse denoise is a `lax.scan` over precomputed DDPM tables
(ops/ddpm.py) instead of a Python loop over diffusers' scheduler, so acting
for the whole env batch is one fused XLA program.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddiffpg_tpu.ops import ddpm

__all__ = ["DiffusionNet", "MLPResNet", "DiffusionPolicy", "EBMDiffusionPolicy"]


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
        x = t[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class DiffusionNet(nn.Module):
    """eps_theta(x, t, cond) (reference diffusion_mlp.py:24-73)."""
    action_dim: int
    dim: int = 256

    @nn.compact
    def __call__(self, x, t, cond):
        temb = SinusoidalPosEmb(self.dim)(t)
        temb = nn.Dense(self.dim * 4)(temb)
        temb = nn.mish(temb) if hasattr(nn, "mish") else temb * jnp.tanh(jax.nn.softplus(temb))
        temb = nn.Dense(self.dim)(temb)

        h = jnp.concatenate([temb, cond, x], axis=-1)
        for w in (1024, 512, 256):
            h = nn.Dense(w)(h)
            h = h * jnp.tanh(jax.nn.softplus(h))  # Mish
        return nn.Dense(self.action_dim)(h)


class MLPResNetBlock(nn.Module):
    features: int
    use_layer_norm: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        residual = x
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        if self.use_layer_norm:
            x = nn.LayerNorm()(x)
        x = nn.Dense(self.features * 4)(x)
        x = x * jnp.tanh(jax.nn.softplus(x))
        x = nn.Dense(self.features)(x)
        return residual + x


class MLPResNet(nn.Module):
    """Residual trunk variant (reference diffusion_mlp.py:108-128)."""
    out_dim: int
    num_blocks: int = 3
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim)(x)
        for _ in range(self.num_blocks):
            x = MLPResNetBlock(self.hidden_dim)(x)
        x = x * jnp.tanh(jax.nn.softplus(x))
        return nn.Dense(self.out_dim)(x)


class DiffusionPolicy(nn.Module):
    """K-step DDPM policy head.

    Methods (used via `.apply(..., method=...)`):
      __call__(x, t, cond)      — eps prediction (the trainable net)
      act(key, cond)            — K-step reverse denoise -> action in [-1,1]
      loss(key, cond, action)   — epsilon-prediction MSE (DDPM training loss)
    """
    action_dim: int
    diffusion_iter: int = 5
    dim: int = 256
    schedule: str = "squaredcos_cap_v2"

    def setup(self):
        self.net = DiffusionNet(self.action_dim, self.dim)
        self.tables = ddpm.make_tables(self.diffusion_iter, self.schedule)

    def __call__(self, x, t, cond):
        return self.net(x, t, cond)

    def act(self, key, cond):
        B = cond.shape[0]
        k_init, k_scan = jax.random.split(key)
        x0 = jax.random.normal(k_init, (B, self.action_dim))

        def eps_fn(x, t):
            ts = jnp.full((B,), t, jnp.float32)
            return self.net(x, ts, cond)

        return ddpm.reverse_scan(self.tables, eps_fn, k_scan, x0)

    def loss(self, key, cond, action):
        B = action.shape[0]
        k_noise, k_t = jax.random.split(key)
        noise = jax.random.normal(k_noise, action.shape)
        t = jax.random.randint(k_t, (B,), 0, self.diffusion_iter)
        noisy = ddpm.add_noise(self.tables, action, noise, t)
        eps = self.net(noisy, t.astype(jnp.float32), cond)
        return jnp.mean((eps - noise) ** 2)


class EBMDiffusionPolicy(DiffusionPolicy):
    """Energy-parameterized variant (reference EBMDiffusionModel,
    diffusion_mlp.py:131-145): the score is the gradient of
    E(x) = ||net(x) - x||^2 w.r.t. x; exposes unnormalized neg-log-prob for
    the logprob/entropy machinery (diffusion_mlp.py:260-292)."""

    def neg_logp_unnorm(self, x, t, cond):
        score = self.net(x, t, cond)
        return ((score - x) ** 2).sum(-1)

    def __call__(self, x, t, cond):
        e = lambda xx: self.neg_logp_unnorm(xx, t, cond).sum()
        return jax.grad(e)(x)

    def logprob(self, x, t, cond, action_buf):
        """log p(x | cond) against a sample buffer partition function
        (diffusion_mlp.py:260-283)."""
        B1, B2 = cond.shape[0], action_buf.shape[0]
        E = self.neg_logp_unnorm(x, t, cond)
        a = jnp.tile(action_buf, (B1, 1))
        c = jnp.repeat(cond, B2, axis=0)
        t2 = jnp.zeros((B1 * B2,), jnp.float32)
        Z = jnp.exp(-self.neg_logp_unnorm(a, t2, c)).reshape(B1, B2).sum(-1)
        return -E - jnp.log(Z)

    def entropy(self, key, cond, logZ, num_action: int = 50):
        """Monte-Carlo entropy estimate: mean energy of sampled actions +
        log partition (diffusion_mlp.py:285-292)."""
        B = cond.shape[0]
        c = jnp.repeat(cond, num_action, axis=0)
        a = self.act(key, c)
        t = jnp.zeros((B * num_action,), jnp.float32)
        E = self.neg_logp_unnorm(a, t, c).reshape(B, num_action).mean(axis=1)
        return E + logZ
