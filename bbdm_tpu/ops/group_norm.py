"""GroupNorm with fp32 statistics (NHWC).

The reference computes GroupNorm in fp32 regardless of activation dtype
(`model/BrownianBridge/base/modules/diffusionmodules/util.py:199-216`
``GroupNorm32``); we keep that contract: statistics and normalization in
float32, output cast back to the input dtype. Optional fused SiLU and
FiLM scale/shift (reference ResBlock scale-shift norm `openaimodel.py:270-274`)
let XLA emit a single fused elementwise region after the reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
    film_scale: jax.Array | None = None,
    film_shift: jax.Array | None = None,
) -> jax.Array:
    """GroupNorm over the channel (last) axis of an NHWC (or N...C) tensor.

    y = GN(x) * scale + bias, then optionally
    y = y * (1 + film_scale) + film_shift  (broadcast over spatial dims), then
    y = silu(y) if act == 'silu'.

    film_* have shape [N, C] (per-example FiLM from the timestep embedding).
    """
    orig_dtype = x.dtype
    N = x.shape[0]
    C = x.shape[-1]
    if C % num_groups != 0:
        raise ValueError(f"channels {C} not divisible by num_groups {num_groups}")

    xf = x.astype(jnp.float32)
    spatial = x.shape[1:-1]
    g = xf.reshape(N, -1, num_groups, C // num_groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    y = g.reshape(N, *spatial, C)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)

    if film_scale is not None:
        bshape = (N,) + (1,) * len(spatial) + (C,)
        y = y * (1.0 + film_scale.astype(jnp.float32).reshape(bshape))
        y = y + film_shift.astype(jnp.float32).reshape(bshape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act is not None:
        raise NotImplementedError(act)
    return y.astype(orig_dtype)
