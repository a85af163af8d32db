"""Fused nearest-2x-upsample + 3x3 conv (exact subpixel decomposition).

The reference's decoder upsampling path is ``conv3x3(nearest_upsample_2x(x))``
(ResBlock up-variant `openaimodel.py:166-278` h_upd, and the plain Upsample
module `openaimodel.py:93-121`; same pattern in the VQGAN decoder
`model/VQGAN/model.py:36-49,436-537`). On a nearest-2x-duplicated grid every
3x3 window covers at most 2x2 *distinct* source pixels, so the conv is exactly
a 2x2 convolution with four phase-specific kernels that are fixed linear
combinations of the original 3x3 taps, followed by a 2x2 depth-to-space
interleave.

FLOPs drop from 2*N*(2H)(2W)*9*ci*co to 2*N*(H+1)(W+1)*4*(4*ci*co)
(~2.2x fewer); on the TPU profile the two up-ResBlock in_convs were the two
largest single ops of the whole sampler (0.895 + 0.865 ms/step of a 12.1 ms
step at batch 8 — BENCH_NOTES.md round 2), running at ~88% of MXU peak, so
the only way to make them faster was to make them smaller.

Derivation. Output pixel (2i+py, 2j+px) of the naive path sees upsampled rows
u-1, u, u+1 (u = 2i+py), which map to source rows floor((u+k-1)/2):
    py=0 -> rows {i-1: W[0], i: W[1]+W[2]}
    py=1 -> rows {i:   W[0]+W[1], i+1: W[2]}
and identically for columns. The four phase kernels are therefore 2x2 in
space; summing taps in fp32 before the bf16 cast keeps the result within one
rounding step of the naive path (the unit test checks exactness in fp32).

All four phases are evaluated as ONE conv with a [2, 2, ci, 4*co] kernel and
padding 1 (output (H+1, W+1)), then the phase windows are sliced and
interleaved with the same broadcast-reshape pattern as nearest upsampling —
keeping the MXU contraction large instead of launching four small convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def combine_kernel_2x2(w: jax.Array) -> jax.Array:
    """[3,3,ci,co] HWIO -> [2,2,ci,4*co] phase-combined kernel (fp32 combine).

    Phase order along the output-channel axis: (py,px) = (0,0),(0,1),(1,0),(1,1),
    i.e. phase index p = 2*py + px occupies columns [p*co:(p+1)*co].
    """
    wf = w.astype(jnp.float32)
    # row combinations: index r in {0,1} of the 2x2 kernel, per phase py
    row = {
        0: (wf[0], wf[1] + wf[2]),  # py=0: {i-1: W0, i: W1+W2}
        1: (wf[0] + wf[1], wf[2]),  # py=1: {i: W0+W1, i+1: W2}
    }
    phases = []
    for py in (0, 1):
        r0, r1 = row[py]  # [3, ci, co] each (column axis still unreduced)
        for px in (0, 1):
            if px == 0:
                c = lambda t: jnp.stack([t[0], t[1] + t[2]], axis=0)
            else:
                c = lambda t: jnp.stack([t[0] + t[1], t[2]], axis=0)
            phases.append(jnp.stack([c(r0), c(r1)], axis=0))  # [2,2,ci,co]
    return jnp.concatenate(phases, axis=-1).astype(w.dtype)  # [2,2,ci,4co]


def upsample2x_conv3x3(x: jax.Array, w: jax.Array, b: jax.Array | None,
                       *, dtype=None, combined: jax.Array | None = None) -> jax.Array:
    """Exactly ``conv3x3(pad=1)(nearest_upsample_2x(x))`` at ~2.2x fewer FLOPs.

    x: [N, H, W, ci] NHWC; w: [3, 3, ci, co] HWIO; b: [co] or None.
    ``combined``: optional pre-combined [2,2,ci,4co] kernel (combine_kernel_2x2)
    — pass it when the caller can hoist the combine out of a sampling scan so
    it isn't recomputed every step (models/bridge.py p_sample_loop).
    Returns [N, 2H, 2W, co].
    """
    N, H, W, ci = x.shape
    co = w.shape[-1]
    if combined is not None and combined.ndim == 5:
        # [4,2,2,ci,co] pre-arranged phase kernel -> Pallas kernel with the
        # interleaved write (ops/subpixel_pallas.py; opted in by the sampler
        # via BBDM_PALLAS_SUBPIX=1, see models/bridge.py).
        from bbdm_tpu.ops.subpixel_pallas import eligible, subpixel_upconv_pallas

        compute_itemsize = jnp.dtype(dtype or x.dtype).itemsize
        if eligible(x.shape, ci, co, compute_itemsize):
            if dtype is not None:
                x = x.astype(dtype)
                combined = combined.astype(dtype)
            if b is None:
                b = jnp.zeros((co,), jnp.float32)
            return subpixel_upconv_pallas(x, combined, b)
        # shape outside the kernel envelope: fall back to the XLA lowering
        combined = combined.transpose(1, 2, 3, 0, 4).reshape(2, 2, ci, 4 * co)
    k = combine_kernel_2x2(w) if combined is None else combined
    if dtype is not None:
        x = x.astype(dtype)
        k = k.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [N, H+1, W+1, 4co]
    # phase windows: (py,px) -> out[:, py:py+H, px:px+W, p*co:(p+1)*co]
    p00 = out[:, 0:H, 0:W, 0 * co:1 * co]
    p01 = out[:, 0:H, 1:W + 1, 1 * co:2 * co]
    p10 = out[:, 1:H + 1, 0:W, 2 * co:3 * co]
    p11 = out[:, 1:H + 1, 1:W + 1, 3 * co:4 * co]
    # interleave: y[n, 2i+py, 2j+px, c] = phase[py][px][n, i, j, c]
    y = jnp.stack([jnp.stack([p00, p01], axis=3),
                   jnp.stack([p10, p11], axis=3)], axis=2)  # [N,H,2,W,2,co]
    y = y.reshape(N, 2 * H, 2 * W, co)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
