"""Fused GroupNorm (+FiLM +SiLU) Pallas kernel for TPU.

Two-phase tiled pipeline over a (N, 2, n_tiles) grid: phase 0 streams [tile,C]
blocks through VMEM accumulating per-channel sum / sum-of-squares (fp32) in
scratch, folds them into per-GROUP statistics with tiny [C,G] segment-matrix
matmuls (MXU — no cross-lane reshapes of the big tensor), and phase 1 streams
the normalize+affine+FiLM+SiLU pass back out in the input dtype. Two HBM
reads + one write per tensor with small, deeply pipelined DMA blocks.

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

# tile sizing: keep per-tile fp32 working set ~2MB so in/out DMA buffers
# stay far below VMEM (~16MB/core) and the pipeline stays deep
_CHUNK_TARGET_BYTES = 2 * 1024 * 1024  # fp32 working chunk


def eligible(shape, num_groups, dtype) -> bool:
    """Whether the Pallas kernel supports this GroupNorm instance."""
    if len(shape) < 3:
        return False
    C = shape[-1]
    hw = int(np.prod(shape[1:-1]))
    if C % 128 != 0 or C % num_groups != 0:
        return False
    return hw % 8 == 0


def _pick_chunk(hw: int, c: int) -> int:
    """Largest power-of-two row chunk <= target fp32 bytes that divides hw."""
    target = max(8, _CHUNK_TARGET_BYTES // (c * 4))
    chunk = 8
    while chunk * 2 <= target and hw % (chunk * 2) == 0:
        chunk *= 2
    return min(chunk, hw)


def _kernel(x_ref, scale_ref, bias_ref, fs_ref, fb_ref, seg_ref, o_ref,
            wb_scratch, *, groups, act, film, eps, hw):
    """Two-phase tiled kernel.

    grid = (N, 2, n_tiles); small (1, tile, C) x/out blocks keep the DMA
    pipeline deep (the whole-slab variant's in+out double buffers filled VMEM
    and serialized all transfers — BENCH_NOTES.md). Phase p=0 accumulates
    per-channel s1/s2 into VMEM scratch across tiles; at the last stats tile
    the affine (w, b) is folded (group combine via the [C, G] segment-matrix
    matmuls on the MXU); phase p=1 streams normalize(+FiLM)(+SiLU) out.
    wb_scratch rows: 0=s1, 1=s2, then 2=w, 3=b.
    """
    p = pl.program_id(1)
    t = pl.program_id(2)
    n_tiles = pl.num_programs(2)

    @pl.when(jnp.logical_and(p == 0, t == 0))
    def _reset():
        wb_scratch[0:2, :] = jnp.zeros_like(wb_scratch[0:2, :])

    @pl.when(p == 0)
    def _stats():
        xb = x_ref[0].astype(jnp.float32)  # [tile, C]
        wb_scratch[0:1, :] += jnp.sum(xb, axis=0, keepdims=True)
        wb_scratch[1:2, :] += jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(p == 0, t == n_tiles - 1))
    def _finalize_stats():
        seg = seg_ref[:]  # [C, G] f32
        n_per_group = hw * (x_ref.shape[2] // groups)
        s1 = wb_scratch[0:1, :]
        s2 = wb_scratch[1:2, :]
        gs1 = jax.lax.dot_general(s1, seg, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [1, G]
        gs2 = jax.lax.dot_general(s2, seg, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mean_g = gs1 / n_per_group
        var_g = gs2 / n_per_group - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
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
        wb_scratch[2:3, :] = w
        wb_scratch[3:4, :] = b

    @pl.when(p == 1)
    def _normalize():
        xb = x_ref[0].astype(jnp.float32)
        y = xb * wb_scratch[2:3, :] + wb_scratch[3:4, :]
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


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
    tile = _pick_chunk(hw, C)
    n_tiles = hw // tile

    x_spec = pl.BlockSpec((1, tile, C), lambda n, p, t: (n, t, 0),
                          memory_space=pltpu.VMEM)
    # during the stats phase the out block is pinned to tile 0 so revisits
    # don't flush a junk write per tile (one junk flush per n, overwritten)
    o_spec = pl.BlockSpec(
        (1, tile, C), lambda n, p, t: (n, jnp.where(p == 1, t, 0), 0),
        memory_space=pltpu.VMEM)
    fixed = lambda n, p, t: (0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=num_groups, act=act, film=film,
                          eps=eps, hw=hw),
        grid=(N, 2, n_tiles),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, C), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda n, p, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda n, p, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, num_groups), lambda n, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((N, hw, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((8, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * N * hw * C,
            bytes_accessed=3 * N * hw * C * x.dtype.itemsize,
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
