"""Stateless schedules (pure functions of the step index).

Same curves as the reference's stateful Linear/Exponential/Tanh schedules
(`/root/reference/ddiffpg/utils/schedule_util.py`), reformulated as
`value(step)` so they can live inside jitted code.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear(step, start_val: float, end_val: float, total_iters: int):
    ratio = jnp.clip(step / max(total_iters, 1), 0.0, 1.0)
    return start_val + ratio * (end_val - start_val)


def exponential(step, start_val: float, gamma: float, end_val=None):
    val = start_val * gamma**step
    if end_val is not None:
        lo, hi = sorted((start_val, end_val))
        val = jnp.clip(val, lo, hi)
    return val


def tanh(step, start_step: int, end_step: int, gamma: float = 10e-6):
    center = (end_step - start_step) / 2
    return (jnp.tanh(gamma * (step - center)) + 1.0) / 2.0
