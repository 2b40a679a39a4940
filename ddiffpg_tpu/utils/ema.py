"""Exponential moving average of a parameter pytree.

Counterpart of the reference EMA helper (`models/baseline_helpers.py`,
used by the baseline diffusion path); also generally useful for target
networks with per-leaf control.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, new_params, beta: float = 0.995):
    """ema <- beta * ema + (1 - beta) * new."""
    return jax.tree.map(lambda e, n: e * beta + n * (1.0 - beta),
                        ema_params, new_params)
