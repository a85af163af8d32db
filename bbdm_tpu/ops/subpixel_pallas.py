"""Pallas TPU kernel: fused subpixel upsample-conv with interleaved write.

Replaces the XLA lowering of ``ops/upsample_conv.upsample2x_conv3x3`` (one
2x2x(4co) conv producing a padded (H+1, W+1) tensor, then a phase-extract /
depth-to-space pass) with a single kernel that

  * keeps the whole per-sample input resident in VMEM,
  * runs the 16 phase-tap matmuls (4 phases x 2x2 taps) on the MXU with
    fp32 accumulation, shifted taps expressed as row-slices of the
    flattened [h*w, ci] input (column shifts materialized once with the
    wrap rows masked to zero — the conv's zero padding),
  * and writes the final [2h, 2w, co] interleaved layout directly, so the
    phase-window extract pass (an extra ~70 MB/step of HBM traffic in the
    XLA lowering, BENCH_NOTES.md round 2) never exists.

Grid: (co_chunks, N) with the sample index INNERMOST so the (large) weight
block stays resident across the inner sweep while the small x blocks cycle;
the column-shift scratches are recomputed in every grid cell (they are
cheap VPU work relative to the 16 matmuls, but note this when tuning — the
input block is also re-fetched per cell).

Semantics are exactly ``conv3x3(pad=1)(nearest_upsample_2x(x))`` — parity
is tested against the XLA decomposition (interpret mode on CPU, plus the
on-TPU check in scripts/check_subpixel_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_COC = 512  # output-channel chunk (bounds the kernel block VMEM footprint)


def eligible(x_shape, ci: int, co: int, itemsize: int = 2) -> bool:
    """Kernel support envelope: lane-aligned channels, output channels that
    chunk evenly by _MAX_COC (subpixel_upconv_pallas asserts this — e.g.
    co=640 must fall back to XLA, not crash), sublane-aligned width, and a
    TOTAL per-step VMEM footprint that fits under the kernel's
    ``vmem_limit_bytes`` with headroom. The footprint counts everything the
    pallas_call keeps resident (ADVICE round 2 — bounding only the input
    block let e.g. fp32 (1,64,64,512)->512 pass eligibility and then fail
    Mosaic compilation at runtime): the input block, the two column-shift
    scratches, the [4,2,2,ci,coc] weight block, the interleaved
    [2h,2w,coc] output block, and the four fp32 phase accumulators."""
    N, h, w, _ = x_shape
    if ci % 128 != 0 or co % 128 != 0:
        return False
    if co % min(co, _MAX_COC) != 0:
        return False
    if w % 8 != 0 or h < 2:
        return False
    hw = h * w
    coc = min(co, _MAX_COC)
    vmem = (
        hw * ci * itemsize          # input block
        + 2 * hw * ci * itemsize    # shift scratches
        + 16 * ci * coc * itemsize  # weight block (4 phases x 2x2 taps)
        + 4 * hw * coc * itemsize   # output block [2h, 2w, coc]
        + 4 * hw * coc * 4          # fp32 phase accumulators
    )
    # 64 MB budget: safely under the 100 MB vmem_limit_bytes, leaving room
    # for Mosaic's own double-buffering of the cycling input blocks
    return vmem <= 64 * 1024 * 1024


def arrange_phase_kernel(k2: jax.Array) -> jax.Array:
    """[2,2,ci,4co] combined kernel (ops/upsample_conv.combine_kernel_2x2,
    phase-major output channels) -> [4,2,2,ci,co] per-phase taps."""
    r, s, ci, co4 = k2.shape
    co = co4 // 4
    return k2.reshape(r, s, ci, 4, co).transpose(3, 0, 1, 2, 4)


def _kernel(x_ref, kp_ref, b_ref, o_ref, xm1_ref, xp1_ref, *, h, w, ci):
    """One (sample, co-chunk) grid cell.

    Phase p = 2*py + px reads source offsets (dy, dx) = (py-1+r, px-1+s) for
    tap (r, s) of kp[p] — the tap layout produced by combine_kernel_2x2.
    Column shifts (dx = -1/+1) come from the masked-shift scratches; row
    shifts (dy = -1/+1) are row-slices of the flat [h*w, ci] layout.
    """
    hw = h * w

    x = x_ref[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w
    zrow = jnp.zeros((1, ci), x.dtype)
    xm1 = jnp.concatenate([zrow, x[: hw - 1]], axis=0)  # src (i, j-1)
    xm1_ref[...] = jnp.where(j == 0, jnp.zeros_like(xm1), xm1)
    xp1 = jnp.concatenate([x[1:], zrow], axis=0)  # src (i, j+1)
    xp1_ref[...] = jnp.where(j == w - 1, jnp.zeros_like(xp1), xp1)

    coc = o_ref.shape[-1]
    rows = hw - w

    def tap(src, dy, kk):
        if dy == -1:  # out (i, j) <- src (i-1, j'): rows w.. get src[:hw-w]
            body = jnp.dot(src[:rows], kk, preferred_element_type=jnp.float32)
            return jnp.concatenate([jnp.zeros((w, coc), jnp.float32), body], axis=0)
        if dy == 1:  # out (i, j) <- src (i+1, j')
            body = jnp.dot(src[w:], kk, preferred_element_type=jnp.float32)
            return jnp.concatenate([body, jnp.zeros((w, coc), jnp.float32)], axis=0)
        return jnp.dot(src, kk, preferred_element_type=jnp.float32)

    bias = b_ref[0].astype(jnp.float32)
    phases = []
    for p in range(4):
        py, px = p // 2, p % 2
        acc = jnp.zeros((hw, coc), jnp.float32)
        for r in range(2):
            dy = py - 1 + r
            for s in range(2):
                dx = px - 1 + s
                src = (xm1_ref[...], x_ref[0], xp1_ref[...])[dx + 1]
                acc = acc + tap(src, dy, kp_ref[p, r, s])
        phases.append(acc + bias[None, :])

    # interleave: y[(2i+py)*2w + 2j+px] = phases[2py+px][i*w + j]
    def col_interleave(a, b):  # [hw, coc] x2 -> [h, 2w, coc]
        return jnp.stack([a, b], axis=1).reshape(hw * 2, coc).reshape(h, 2 * w, coc)

    b0 = col_interleave(phases[0], phases[1])  # py = 0 rows
    b1 = col_interleave(phases[2], phases[3])  # py = 1 rows
    y = jnp.stack([b0, b1], axis=1).reshape(2 * h, 2 * w, coc)
    o_ref[0] = y.astype(o_ref.dtype)


def subpixel_upconv_pallas(x: jax.Array, kp: jax.Array, b: jax.Array,
                           *, interpret: bool | None = None) -> jax.Array:
    """x: [N, h, w, ci]; kp: [4, 2, 2, ci, co] (arrange_phase_kernel);
    b: [co]. Returns [N, 2h, 2w, co] = conv3x3(pad=1)(nearest_upsample_2x(x))."""
    N, h, w, ci = x.shape
    co = kp.shape[-1]
    hw = h * w
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    coc = min(co, _MAX_COC)
    assert co % coc == 0, (co, coc)

    xf = x.reshape(N, hw, ci)
    # grid: co-chunk OUTER so the (large) weight block is not re-streamed per
    # sample; x blocks are small and cycle per step instead.
    grid = (co // coc, N)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, ci=ci),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hw, ci), lambda k, n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2, 2, ci, coc), lambda k, n: (0, 0, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coc), lambda k, n: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * w, coc), lambda k, n: (n, 0, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 2 * h, 2 * w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hw, ci), x.dtype),
            pltpu.VMEM((hw, ci), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * hw * 16 * ci * co,
            bytes_accessed=int((N * hw * ci + 4 * N * hw * co) * x.dtype.itemsize
                               + np.prod(kp.shape) * kp.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, kp, b.reshape(1, co))
    return out
