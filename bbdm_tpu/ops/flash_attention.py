"""Flash-style blockwise attention for TPU (Pallas).

Replaces the O(T^2)-memory attention of the reference's VQGAN AttnBlock
(`model/VQGAN/model.py:140-192`, T = 4096 tokens at 64^2 latent resolution,
single head, d = 512) and any long-sequence UNet attention: the score matrix
never materializes in HBM — each (q-block, k-block) tile lives in VMEM with an
online-softmax accumulator, so HBM traffic drops from O(T^2) to O(T*d) and the
two matmuls stay on the MXU back to back.

Numerics match the XLA path: symmetric 1/sqrt(sqrt(d)) scaling on q and k and
float32 softmax statistics (reference `openaimodel.py:369-373`).

Gradients fall back to the XLA einsum implementation via custom_vjp (the hot
Pallas path is inference — the VQGAN is frozen in LBBDM training).

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
_NEG_INF = float("-inf")


def _kernel(q_ref, k_ref, v_ref, o_ref, acc, m_state, l_state, *, scale):
    i_k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(i_k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_state[:] = jnp.full_like(m_state, _NEG_INF)
        l_state[:] = jnp.zeros_like(l_state)

    q = q_ref[0].astype(jnp.float32) * scale  # [bq, d]
    k = k_ref[0].astype(jnp.float32) * scale  # [bk, d]
    v = v_ref[0].astype(jnp.float32)  # [bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]

    m_prev = m_state[:]  # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_state[:] = l_state[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_state[:] = m_new

    @pl.when(i_k == n_k - 1)
    def _finalize():
        o_ref[0] = (acc[:] / l_state[:]).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q, block_k, interpret):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / (D**0.25)

    bq = min(block_q, Tq)
    bk = min(block_k, Tk)
    assert Tq % bq == 0 and Tk % bk == 0, (Tq, bq, Tk, bk)

    qf = q.reshape(B * H, Tq, D)
    kf = k.reshape(B * H, Tk, D)
    vf = v.reshape(B * H, Tk, D)

    grid = (B * H, Tq // bq, Tk // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq * Tk * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize * 2,
            transcendentals=B * H * Tq * Tk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, Tq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K):
    """Attention over [B, H, T, D] with reference scaling/precision semantics."""
    interpret = jax.default_backend() != "tpu"
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _xla_reference(q, k, v):
    from bbdm_tpu.ops.attention import _xla_attention

    return _xla_attention(q, k, v)


def _fwd(q, k, v, block_q, block_k):
    return flash_attention(q, k, v, block_q, block_k), (q, k, v)


def _bwd(block_q, block_k, res, g):
    # backward through the XLA formulation (forward recompute); the Pallas
    # path is inference-hot, training-time attention uses short sequences
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
