"""Exponential moving average of parameters.

Role parity: ldm/modules/ema.py LitEma (configured off in the reference's
RDEIC configs — `use_ema: False` — but part of the DDPM surface). Pure
pytree functions; the trainer keeps the shadow tree when enabled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree_util.tree_map(jnp.asarray, params)


def ema_update(shadow, params, decay: float = 0.9999, step=None):
    """shadow <- shadow * d + params * (1-d); d warms up like LitEma:
    d = min(decay, (1 + step) / (10 + step))."""
    if step is not None:
        d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    else:
        d = decay
    return jax.tree_util.tree_map(
        lambda s, p: s * d + p.astype(s.dtype) * (1 - d), shadow, params
    )
