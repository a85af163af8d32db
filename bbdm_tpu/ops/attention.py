"""Multi-head attention with fp32 softmax.

Semantics match the reference's QKV attention
(`model/BrownianBridge/base/modules/diffusionmodules/openaimodel.py:350-413`):
logits are computed with the symmetric 1/sqrt(sqrt(d)) scaling on both q and k
and the softmax accumulates in float32 regardless of activation dtype.

Two backends:
  * XLA einsum path — fully fused by XLA for the short spatial sequences this
    framework sees (<= 4096 tokens); used on CPU and as the reference
    implementation in tests.
  * Pallas flash-style kernel (``bbdm_tpu.ops.flash_attention``) — blockwise
    online softmax living entirely in VMEM; enabled on TPU for long sequences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sequence-length threshold above which the Pallas kernel wins on TPU. Below
# this, the whole score matrix fits comfortably in VMEM and XLA's fusion is
# already roofline-bound.
_PALLAS_MIN_SEQ = 1024


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q: [B, H, Tq, D]
      k: [B, H, Tk, D]
      v: [B, H, Tk, D]
    Returns:
      [B, H, Tq, D] in q.dtype.
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and q.shape[-2] >= _PALLAS_MIN_SEQ
            and q.shape[-1] % 128 == 0
        )
    if use_pallas:
        from bbdm_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    d = q.shape[-1]
    scale = 1.0 / (d**0.25)  # symmetric scaling, reference openaimodel.py:369
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk",
        (q * scale),
        (k * scale),
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )
