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
import numpy as np
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
    """GroupNorm dispatcher.

    Default is the lane-friendly XLA formulation below — measured FASTER than
    the hand-written Pallas kernel on v5e (3.23 vs 2.85 samples/sec on the
    200-step bench; XLA's generated stats/normalize fusions beat the
    pallas_call, whose block boundaries block fusion with neighbors). The
    Pallas kernel (`ops/group_norm_pallas.py`) stays available behind
    BBDM_PALLAS_GN=1 for future tuning / other TPU generations.
    """
    import os

    if os.environ.get("BBDM_PALLAS_GN") == "1" and jax.default_backend() == "tpu":
        from bbdm_tpu.ops.group_norm_pallas import eligible, group_norm_pallas

        if eligible(x.shape, num_groups, x.dtype):
            return group_norm_pallas(x, scale, bias, film_scale, film_shift,
                                     num_groups, eps, act)
    return _group_norm_xla(x, scale, bias, num_groups=num_groups, eps=eps,
                           act=act, film_scale=film_scale, film_shift=film_shift)


def _group_norm_xla(
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

    # Experiment knob (BENCH_NOTES round 2): the conv+GN-stat output fusions at
    # small channel counts run far below both the MXU and HBM floors (128ch@64²:
    # 0.30 ms vs 0.05 ms compute / 0.02 ms bandwidth) — suspicion is that the
    # fp32 reduce epilogue forces the producing conv onto a slow emitter path.
    # BBDM_GN_SPLIT_STATS=<thresh> puts an optimization_barrier in front of the
    # statistics reads for C <= thresh, splitting the stats reduce into its own
    # kernel so the producer compiles with a pure elementwise epilogue (one
    # extra HBM read of the activation).
    import os

    _split = int(os.environ.get("BBDM_GN_SPLIT_STATS", "0"))
    stats_x = jax.lax.optimization_barrier(x) if C <= _split else x

    # TPU layout note: statistics are computed as per-CHANNEL spatial sums
    # first (keeps the 128-lane channel axis minor — no relayout of the big
    # tensor), then combined into per-group stats with a tiny [N,C]->[N,G]
    # reduction. Reshaping the activation itself to (N, HW, G, C/G) and
    # reducing over the C/G minor axis forces an (8,128)-tile shuffle that
    # measured ~38% of sampler wall time (BENCH_NOTES.md round-1 profile).
    xf = x.astype(jnp.float32)
    spatial = x.shape[1:-1]
    red_axes = tuple(range(1, xf.ndim - 1))
    n_per_group = (C // num_groups) * int(np.prod(spatial))
    sf = stats_x.astype(jnp.float32)
    s1 = jnp.sum(sf, axis=red_axes)  # [N, C]
    s2 = jnp.sum(sf * sf, axis=red_axes)  # [N, C]
    gs1 = s1.reshape(N, num_groups, C // num_groups).sum(-1)  # [N, G]
    gs2 = s2.reshape(N, num_groups, C // num_groups).sum(-1)
    mean_g = gs1 / n_per_group
    var_g = gs2 / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # expand per-group stats to per-channel [N, C] (tiny), fold the affine in:
    # y = x * (rstd * scale) + (bias - mean * rstd * scale)
    rstd_c = jnp.repeat(rstd_g, C // num_groups, axis=1)
    mean_c = jnp.repeat(mean_g, C // num_groups, axis=1)
    w = rstd_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * w
    bshape_nc = (N,) + (1,) * len(spatial) + (C,)
    y = xf * w.reshape(bshape_nc) + b.reshape(bshape_nc)

    if film_scale is not None:
        bshape = (N,) + (1,) * len(spatial) + (C,)
        y = y * (1.0 + film_scale.astype(jnp.float32).reshape(bshape))
        y = y + film_shift.astype(jnp.float32).reshape(bshape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act is not None:
        raise NotImplementedError(act)
    return y.astype(orig_dtype)
