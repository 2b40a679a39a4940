"""Self-contained baseline diffusion + consistency actors ("DiffQ" path).

Capability match for `/root/reference/ddiffpg/models/baseline_models.py`
(`Diffusion` with linear/cosine/vp beta schedules and `Consistency`), which
the reference only wires up for `algo.name == "DiffQ"`
(algo/ac_base.py:34-40). Weighted losses from baseline_helpers.py become
plain weighted reductions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddiffpg_tpu.ops import ddpm

__all__ = ["BaselineMLP", "Diffusion", "Consistency"]


class BaselineMLP(nn.Module):
    """eps model used by the baseline Diffusion (t embedded as sinusoid)."""
    action_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x, t, state):
        half = 8
        freqs = jnp.exp(jnp.arange(half) * (-jnp.log(10000.0) / (half - 1)))
        temb = t[:, None].astype(jnp.float32) * freqs[None, :]
        temb = jnp.concatenate([jnp.sin(temb), jnp.cos(temb)], axis=-1)
        h = jnp.concatenate([x, temb, state], axis=-1)
        for _ in range(3):
            h = nn.Dense(self.hidden)(h)
            h = h * jnp.tanh(jax.nn.softplus(h))
        return nn.Dense(self.action_dim)(h)


class Diffusion(nn.Module):
    """DDPM actor with selectable beta schedule and clamped x0."""
    action_dim: int
    n_timesteps: int = 5
    beta_schedule: str = "vp"     # 'linear' | 'cosine' | 'vp'
    max_action: float = 1.0
    loss_type: str = "l2"

    def setup(self):
        self.model = BaselineMLP(self.action_dim)
        self.tables = ddpm.make_tables(self.n_timesteps, self.beta_schedule)

    def __call__(self, x, t, state):
        """eps prediction — use this signature for `.init`; sampling runs a
        lax.scan over submodule calls, which flax cannot trace at init."""
        return self.model(x, t, state)

    def sample(self, state, key):
        B = state.shape[0]
        k0, k1 = jax.random.split(key)
        x = jax.random.normal(k0, (B, self.action_dim))

        def eps_fn(xx, t):
            ts = jnp.full((B,), t, jnp.float32)
            return self.model(xx, ts, state)

        x = ddpm.reverse_scan(self.tables, eps_fn, k1, x, clip_sample=True)
        return jnp.clip(x, -self.max_action, self.max_action)

    def loss(self, key, state, action, weights=1.0):
        B = action.shape[0]
        kn, kt = jax.random.split(key)
        noise = jax.random.normal(kn, action.shape)
        t = jax.random.randint(kt, (B,), 0, self.n_timesteps)
        noisy = ddpm.add_noise(self.tables, action, noise, t)
        eps = self.model(noisy, t.astype(jnp.float32), state)
        err = eps - noise
        if self.loss_type == "l1":
            per = jnp.abs(err).mean(-1)
        elif self.loss_type == "huber":
            per = jnp.where(jnp.abs(err) < 1.0, 0.5 * err**2,
                            jnp.abs(err) - 0.5).mean(-1)
        else:
            per = (err**2).mean(-1)
        return (per * weights).mean()


class Consistency(nn.Module):
    """Consistency policy: single-step map from noise to action with the
    boundary-respecting skip parameterization (baseline_models.py:225-315)."""
    action_dim: int
    n_timesteps: int = 5
    max_action: float = 1.0
    eps: float = 0.002
    sigma_data: float = 0.5
    sigma_max: float = 80.0
    rho: float = 7.0

    def setup(self):
        self.model = BaselineMLP(self.action_dim)
        i = jnp.arange(self.n_timesteps + 1, dtype=jnp.float32)
        n = self.n_timesteps
        self.ts = (self.eps ** (1 / self.rho) + i / n *
                   (self.sigma_max ** (1 / self.rho) - self.eps ** (1 / self.rho))
                   ) ** self.rho

    def _f(self, x, t, state):
        c_skip = self.sigma_data**2 / ((t - self.eps) ** 2 + self.sigma_data**2)
        c_out = (self.sigma_data * (t - self.eps) /
                 jnp.sqrt(self.sigma_data**2 + t**2))
        out = self.model(x, t, state)
        return c_skip[:, None] * x + c_out[:, None] * out

    def __call__(self, state, key):
        return self.sample(state, key)

    def sample(self, state, key):
        B = state.shape[0]
        t_max = jnp.full((B,), self.ts[-1])
        x = jax.random.normal(key, (B, self.action_dim)) * self.ts[-1]
        a = self._f(x, t_max, state)
        return jnp.clip(a, -self.max_action, self.max_action)

    def loss(self, key, state, action):
        B = action.shape[0]
        kt, kn = jax.random.split(key)
        idx = jax.random.randint(kt, (B,), 1, self.n_timesteps + 1)
        t1 = self.ts[idx]
        t0 = self.ts[idx - 1]
        z = jax.random.normal(kn, action.shape)
        x1 = action + t1[:, None] * z
        x0 = action + t0[:, None] * z
        f1 = self._f(x1, t1, state)
        f0 = jax.lax.stop_gradient(self._f(x0, t0, state))
        return jnp.mean((f1 - f0) ** 2)
