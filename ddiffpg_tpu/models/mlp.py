"""MLP policies, critics, dynamics ensembles and RND nets.

Capability match for `/root/reference/ddiffpg/models/mlp.py` (DoubleQ,
DistributionalDoubleQ, DistributionalEnsembleQ, Diag/TanhDiag Gaussian
policies, TanhMLPPolicy, MLPCritic, DynamicModel, RNDModel). Per-mode /
double-Q "ensembles" are a leading parameter axis consumed by `jax.vmap`
rather than Python lists of modules, so a K-mode critic update is one XLA
kernel (cf. the reference's per-mode Python loop, algo/ddiffpg.py:231-285).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MLPNet", "TanhMLPPolicy", "DiagGaussianMLPPolicy",
    "TanhDiagGaussianMLPPolicy", "DoubleQ", "DistributionalDoubleQ",
    "DistributionalEnsembleQ", "MLPCritic", "DynamicModel", "RNDModel",
]

DEFAULT_HIDDEN = (512, 256, 128)


class MLPNet(nn.Module):
    out_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class TanhMLPPolicy(nn.Module):
    """Deterministic tanh policy (TD3/DIPO actor)."""
    action_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs):
        return jnp.tanh(MLPNet(self.action_dim, self.hidden)(obs))


class DiagGaussianMLPPolicy(nn.Module):
    action_dim: int
    init_log_std: float = 0.0
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs):
        mean = MLPNet(self.action_dim, self.hidden)(obs)
        log_std = self.param("logstd", nn.initializers.constant(self.init_log_std),
                             (self.action_dim,))
        return mean, jnp.broadcast_to(log_std, mean.shape)

    @staticmethod
    def sample(key, mean, log_std):
        return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)


class TanhDiagGaussianMLPPolicy(nn.Module):
    """Squashed Gaussian (SAC actor)."""
    action_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN
    log_std_min: float = -5.0
    log_std_max: float = 5.0

    @nn.compact
    def __call__(self, obs):
        out = MLPNet(2 * self.action_dim, self.hidden)(obs)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mu, log_std

    @staticmethod
    def sample_logprob(key, mu, log_std):
        """rsample + tanh-squashed log-prob (torch_util.py:69-96 numerics)."""
        std = jnp.exp(log_std)
        x = mu + std * jax.random.normal(key, mu.shape)
        a = jnp.tanh(x)
        base_lp = -0.5 * (((x - mu) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
        # log|d tanh/dx| with the numerically-stable softplus form
        jac = 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))
        log_prob = (base_lp - jac).sum(-1, keepdims=True)
        return a, log_prob

    @staticmethod
    def mean_action(mu, log_std):
        return jnp.tanh(mu)


class DoubleQ(nn.Module):
    """Two scalar Q MLPs; get_q_min = elementwise min."""
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        q1 = MLPNet(1, self.hidden, name="q1")(x)
        q2 = MLPNet(1, self.hidden, name="q2")(x)
        return q1, q2

    def q_min(self, obs, action):
        q1, q2 = self(obs, action)
        return jnp.minimum(q1, q2)


class DistributionalDoubleQ(nn.Module):
    """C51 double critic: two softmax heads over `num_atoms` value atoms."""
    v_min: float = 0.0
    v_max: float = 5.0
    num_atoms: int = 51
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @property
    def z_atoms(self):
        return jnp.linspace(self.v_min, self.v_max, self.num_atoms)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        q1 = jax.nn.softmax(MLPNet(self.num_atoms, self.hidden, name="q1")(x), axis=-1)
        q2 = jax.nn.softmax(MLPNet(self.num_atoms, self.hidden, name="q2")(x), axis=-1)
        return q1, q2

    def q_min(self, obs, action):
        q1, q2 = self(obs, action)
        z = self.z_atoms
        return jnp.minimum((q1 * z).sum(-1), (q2 * z).sum(-1))


class DistributionalEnsembleQ(nn.Module):
    """n-ensemble C51 critic (reference models/mlp.py:158-183)."""
    v_min: float = -10.0
    v_max: float = 10.0
    num_atoms: int = 51
    n_ensemble: int = 3
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @property
    def z_atoms(self):
        return jnp.linspace(self.v_min, self.v_max, self.num_atoms)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        return jnp.stack(
            [jax.nn.softmax(MLPNet(self.num_atoms, self.hidden, name=f"q{i}")(x), -1)
             for i in range(self.n_ensemble)], axis=0)   # [n, B, A]

    def q_mean(self, obs, action):
        qs = self(obs, action)
        return (qs * self.z_atoms).sum(-1).mean(0)


class MLPCritic(nn.Module):
    """State-value MLP."""
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs):
        return MLPNet(1, self.hidden)(obs)


class DynamicModel(nn.Module):
    """Ensemble forward-dynamics model; disagreement-variance reward
    (reference models/mlp.py:197-230)."""
    obs_dim: int
    n_ensemble: int = 3
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        return jnp.stack(
            [MLPNet(self.obs_dim, self.hidden, name=f"dyn{i}")(x)
             for i in range(self.n_ensemble)], axis=0)   # [n, B, D]

    def disagreement_reward(self, obs, action):
        preds = self(obs, action)
        return preds.var(axis=0, ddof=1).mean(axis=-1)


def _orthogonal_sqrt2():
    return nn.initializers.orthogonal(scale=float(np.sqrt(2.0)))


class RNDModel(nn.Module):
    """Random-network-distillation pair: trainable predictor + frozen target.

    Orthogonal(sqrt 2) init, zero bias, as the reference
    (models/mlp.py:233-267). The target params are kept frozen by simply
    zeroing their gradient contribution (they sit in a separate collection
    consumer-side: we return both features; the loss only backprops into
    the predictor via stop_gradient on the target)."""
    feat_dim: int = 128

    @nn.compact
    def __call__(self, x):
        kw = dict(kernel_init=_orthogonal_sqrt2(),
                  bias_init=nn.initializers.zeros)
        h = x
        for w in (512, 256, 128):
            h = nn.elu(nn.Dense(w, **kw, name=f"pred_{w}")(h))
        pred = nn.Dense(self.feat_dim, **kw, name="pred_out")(h)

        g = x
        for w in (512, 256, 128):
            g = nn.elu(nn.Dense(w, **kw, name=f"tgt_{w}")(g))
        tgt = nn.Dense(self.feat_dim, **kw, name="tgt_out")(g)
        return pred, jax.lax.stop_gradient(tgt)
