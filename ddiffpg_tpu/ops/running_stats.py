"""Running mean/std with the parallel (Chan et al.) update.

Functional counterpart of the reference's `RunningMeanStd`
(`/root/reference/ddiffpg/utils/torch_util.py:99-145`): state is a pytree so
it lives inside the jitted train state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar

    @staticmethod
    def create(shape=(), epsilon: float = 1e-4, dtype=jnp.float32) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.asarray(epsilon, dtype),
        )


def update(rms: RunningMeanStd, x: jnp.ndarray) -> RunningMeanStd:
    return update_from_stats(rms, x.mean(axis=0), x.var(axis=0), x.shape[0])


def update_from_stats(rms: RunningMeanStd, batch_mean, batch_var,
                      batch_count) -> RunningMeanStd:
    """Fold pre-computed batch statistics into the running estimate (lets DP
    callers pmean the batch stats across shards first so every shard folds
    identical values and the replicated rms stays replicated)."""
    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def normalize(rms: RunningMeanStd, x: jnp.ndarray, epsilon: float = 1e-4) -> jnp.ndarray:
    return (x - rms.mean) / jnp.sqrt(rms.var + epsilon)


def unnormalize(rms: RunningMeanStd, x: jnp.ndarray, epsilon: float = 1e-4) -> jnp.ndarray:
    return x * jnp.sqrt(rms.var + epsilon) + rms.mean
