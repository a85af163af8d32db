"""Exponential moving average over param pytrees.

Functional equivalent of the reference's shadow-dict EMA
(`runners/base/EMA.py:4-43` + warmup gating in `runners/BaseRunner.py:173-178`):

    with_decay: shadow <- (1 - decay) * p + decay * shadow
    warmup    : shadow <- p            (before start_ema_step)

Only trainable leaves track the average (the reference registers
requires_grad params only); frozen leaves keep the live value so applying the
EMA is a plain tree swap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params, mask=None):
    # real copies — the state is donated into the jitted step, and donating
    # the same buffer through two fields is an error
    return jax.tree_util.tree_map(jnp.array, params)


def ema_update(ema_params, params, decay, with_decay, mask=None):
    """One EMA step; ``with_decay`` may be a traced bool (warmup gating)."""
    d = jnp.where(with_decay, jnp.asarray(decay, jnp.float32), 0.0)

    def upd(s, p):
        return ((1.0 - d) * p.astype(jnp.float32) + d * s.astype(jnp.float32)).astype(p.dtype)

    if mask is None:
        return jax.tree_util.tree_map(upd, ema_params, params)
    return jax.tree_util.tree_map(
        lambda m, s, p: upd(s, p) if m else p, mask, ema_params, params
    )
