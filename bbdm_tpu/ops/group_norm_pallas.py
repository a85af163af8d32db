"""Fused GroupNorm (+FiLM +SiLU) Pallas kernel for TPU.

One HBM read and one HBM write per tensor: each grid program owns one batch
element's [HW, C] slab in VMEM, accumulates per-channel sum / sum-of-squares
over row chunks (fp32), folds the chunk sums into per-GROUP statistics with a
tiny [C,G] segment-matrix matmul (MXU — avoids cross-lane reshapes of the big
tensor), and streams the normalize+affine+FiLM+SiLU pass back out in the
input dtype.

Status: OPT-IN (`BBDM_PALLAS_GN=1`). On v5e the XLA formulation in
`ops/group_norm.py` measures faster end-to-end (3.25 vs 2.86 samples/sec on
the 200-step bench — see BENCH_NOTES.md): XLA fuses the stats pass with
neighboring elementwise producers, which the opaque pallas_call boundary
forfeits. Kept as the starting point for other TPU generations/shapes. The
fp32-statistics contract of the reference's GroupNorm32
(`model/BrownianBridge/base/modules/diffusionmodules/util.py:199-216`) is
preserved: all arithmetic between load and store is float32.

Gradients fall back to the XLA formulation via custom_vjp (the hot path is
the no-grad sampler; training keeps today's throughput).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# biggest slab we let one grid program own (bf16 bytes); double-buffered by
# the pipeline, so stay well under VMEM (~16MB/core)
_MAX_BLOCK_BYTES = 6 * 1024 * 1024
_CHUNK_TARGET_BYTES = 2 * 1024 * 1024  # fp32 working chunk


def eligible(shape, num_groups, dtype) -> bool:
    """Whether the Pallas kernel supports this GroupNorm instance."""
    if len(shape) < 3:
        return False
    C = shape[-1]
    hw = int(np.prod(shape[1:-1]))
    if C % 128 != 0 or C % num_groups != 0:
        return False
    if hw % 8 != 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return hw * C * itemsize <= _MAX_BLOCK_BYTES


def _pick_chunk(hw: int, c: int) -> int:
    """Largest power-of-two row chunk <= target fp32 bytes that divides hw."""
    target = max(8, _CHUNK_TARGET_BYTES // (c * 4))
    chunk = 8
    while chunk * 2 <= target and hw % (chunk * 2) == 0:
        chunk *= 2
    return min(chunk, hw)


def _kernel(x_ref, scale_ref, bias_ref, fs_ref, fb_ref, seg_ref, o_ref,
            *, groups, act, film, eps, chunk):
    HW, C = x_ref.shape[1], x_ref.shape[2]
    nchunks = HW // chunk

    # static (unrolled) chunk loops: Mosaic emits plain vector code for
    # static slices, (fori_loop+dynamic-slice and unrolled static slices measure identically here)
    s1 = jnp.zeros((1, C), jnp.float32)
    s2 = jnp.zeros((1, C), jnp.float32)
    for i in range(nchunks):
        xb = x_ref[0, i * chunk:(i + 1) * chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xb, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xb * xb, axis=0, keepdims=True)

    # per-group stats via the [C, G] one-hot segment matrix (MXU):
    # gs[g] = sum_c in group g; expand back with the transpose.
    seg = seg_ref[:]  # [C, G] f32
    n_per_group = HW * (C // groups)
    gs1 = jax.lax.dot_general(s1, seg, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [1, G]
    gs2 = jax.lax.dot_general(s2, seg, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    mean_g = gs1 / n_per_group
    var_g = gs2 / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # expand [1, G] -> [1, C]
    mean_c = jax.lax.dot_general(mean_g, seg, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, seg, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    w = rstd_c * scale_ref[:].astype(jnp.float32)
    b = bias_ref[:].astype(jnp.float32) - mean_c * w
    if film:
        fs = fs_ref[0].astype(jnp.float32)  # [1, C]
        fb = fb_ref[0].astype(jnp.float32)
        w = w * (1.0 + fs)
        b = b * (1.0 + fs) + fb

    for i in range(nchunks):
        xb = x_ref[0, i * chunk:(i + 1) * chunk, :].astype(jnp.float32)
        y = xb * w + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, i * chunk:(i + 1) * chunk, :] = y.astype(o_ref.dtype)


def _forward(x, scale, bias, film_scale, film_shift, num_groups, eps, act,
             interpret):
    orig_shape = x.shape
    N, C = x.shape[0], x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    xr = x.reshape(N, hw, C)
    film = film_scale is not None
    if not film:  # dummies keep one kernel signature
        film_scale = jnp.zeros((N, C), x.dtype)
        film_shift = jnp.zeros((N, C), x.dtype)
    seg = jnp.asarray(
        np.repeat(np.eye(num_groups, dtype=np.float32), C // num_groups, axis=0)
    )  # [C, G]
    chunk = _pick_chunk(hw, C)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=num_groups, act=act, film=film,
                          eps=eps, chunk=chunk),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, hw, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, num_groups), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, C), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, hw, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * N * hw * C,
            bytes_accessed=2 * N * hw * C * x.dtype.itemsize,
            transcendentals=N * hw * C if act == "silu" else 0,
        ),
        interpret=interpret,
    )(xr, scale.reshape(1, C), bias.reshape(1, C),
      film_scale.reshape(N, 1, C), film_shift.reshape(N, 1, C), seg)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def group_norm_pallas(x, scale, bias, film_scale, film_shift,
                      num_groups=32, eps=1e-5, act=None):
    """Fused GN(+FiLM)(+SiLU) over NHWC / N...C; fp32 stats, input-dtype out.

    film_scale/film_shift: [N, C] or None (both or neither).
    """
    interpret = jax.default_backend() != "tpu"
    return _forward(x, scale, bias, film_scale, film_shift, num_groups, eps,
                    act, interpret)


def _xla_reference(x, scale, bias, film_scale, film_shift, num_groups, eps, act):
    from bbdm_tpu.ops.group_norm import _group_norm_xla

    return _group_norm_xla(x, scale, bias, num_groups=num_groups, eps=eps,
                           act=act, film_scale=film_scale, film_shift=film_shift)


def _fwd(x, scale, bias, film_scale, film_shift, num_groups, eps, act):
    out = group_norm_pallas(x, scale, bias, film_scale, film_shift,
                            num_groups, eps, act)
    return out, (x, scale, bias, film_scale, film_shift)


def _bwd(num_groups, eps, act, res, g):
    # backward through the XLA formulation (forward recompute) — training
    # keeps the XLA path's gradients bit-for-bit
    x, scale, bias, film_scale, film_shift = res
    if film_scale is None:
        def f(x, scale, bias):
            return _xla_reference(x, scale, bias, None, None, num_groups, eps, act)

        _, vjp = jax.vjp(f, x, scale, bias)
        dx, dscale, dbias = vjp(g)
        return dx, dscale, dbias, None, None
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_groups, eps, act),
        x, scale, bias, film_scale, film_shift)
    return vjp(g)


group_norm_pallas.defvjp(_fwd, _bwd)
