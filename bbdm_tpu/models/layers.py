"""Building blocks for the UNet denoiser (flax.linen, NHWC).

Re-designed TPU-first from the behavior of the reference's guided-diffusion
UNet (`model/BrownianBridge/base/modules/diffusionmodules/openaimodel.py` and
`.../attention.py`): NHWC layout so convolutions map directly onto XLA's TPU
conv lowering, fp32 parameters with a bf16 compute policy, GroupNorm/softmax
statistics always in fp32 (matching the reference's GroupNorm32 and fp32
softmax), and FiLM scale-shift fused into the normalization.

Initialization note: the reference constructs zero-initialized output convs
(`zero_module`) but then re-randomizes every Conv2d/Linear weight to N(0,0.02)
via ``weights_init`` (`runners/DiffusionBasedModelRunners/BBDMRunner.py:28`,
`runners/utils.py:35-45`) — so its *effective* init has non-zero heads; only
1-D convs (attention qkv/proj) escape because the classname match is 'Conv2d'.
``init_scheme='reference'`` reproduces that effective behavior;
``init_scheme='zero_heads'`` keeps the zero-init residual branches of the
original guided-diffusion design (usually trains better).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bbdm_tpu.ops.attention import multi_head_attention
from bbdm_tpu.ops.group_norm import group_norm
from bbdm_tpu.ops.upsample_conv import combine_kernel_2x2, upsample2x_conv3x3

Dtype = Any

# N(0, 0.02) — reference weights_init for Conv2d/Linear (runners/utils.py:35-45)
normal_init = nn.initializers.normal(stddev=0.02)
# torch's default Conv/Linear kernel init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
zeros_init = nn.initializers.zeros


def head_init(scheme: str):
    """Init for output-projection ('head') convs/dense layers, see module docstring."""
    if scheme == "reference":
        return normal_init
    if scheme == "zero_heads":
        return zeros_init
    raise ValueError(f"unknown init_scheme {scheme!r}")


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embeddings, cos-first ordering.

    Matches reference `diffusionmodules/util.py:151-171`:
    freqs = exp(-log(max_period) * arange(half)/half); emb = [cos, sin].
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) with fp32 stats; optional fused SiLU / FiLM (ops.group_norm)."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, act=None, film_scale=None, film_shift=None):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm(
            x, scale, bias,
            num_groups=self.num_groups, eps=self.eps,
            act=act, film_scale=film_scale, film_shift=film_shift,
        )


def conv3x3(features: int, *, init=normal_init, dtype=None, name=None, strides=1):
    return nn.Conv(
        features, (3, 3), strides=strides, padding=1,
        kernel_init=init, bias_init=zeros_init,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


def conv1x1(features: int, *, init=normal_init, dtype=None, name=None):
    return nn.Conv(
        features, (1, 1), kernel_init=init, bias_init=zeros_init,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


def dense(features: int, *, init=normal_init, use_bias=True, dtype=None, name=None):
    return nn.Dense(
        features, kernel_init=init, bias_init=zeros_init, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsampling, NHWC (reference openaimodel.py:118)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


class UpsampleConv3x3(nn.Module):
    """``conv3x3(nearest_upsample_2x(x))`` via the exact subpixel decomposition
    (ops/upsample_conv.py) — ~2.2x fewer conv FLOPs, bit-compatible params with
    ``nn.Conv`` (kernel [3,3,ci,co] HWIO + bias) so checkpoints interchange
    with the naive formulation.

    ``train=True`` uses the naive upsample+conv instead: in training the
    per-step kernel combine cannot be hoisted (weights change every step) and
    its forward+backward cost measured slightly worse than the naive conv's
    (BENCH_NOTES.md round 2); sampling is where the decomposition wins."""

    out_channels: int
    init: Callable = normal_init
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ci = x.shape[-1]
        kernel = self.param("kernel", self.init, (3, 3, ci, self.out_channels),
                            jnp.float32)
        bias = self.param("bias", zeros_init, (self.out_channels,), jnp.float32)
        if train and not self.is_initializing():
            up = upsample_nearest_2x(x)
            k = kernel
            if self.dtype is not None:
                up = up.astype(self.dtype)
                k = k.astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                up, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + bias.astype(out.dtype)
        # The phase-combined [2,2,ci,4co] kernel lives in the optional
        # "subpixel" collection so samplers can precompute it ONCE outside
        # their scan (models/bridge.py p_sample_loop) instead of re-deriving
        # it from the 3x3 params every step. Declared at init so callers can
        # discover the paths; absent collection -> combine in-call.
        combined = None
        if self.is_initializing():
            self.variable("subpixel", "kernel2",
                          lambda: combine_kernel_2x2(kernel))
        elif self.has_variable("subpixel", "kernel2"):
            combined = self.get_variable("subpixel", "kernel2")
        return upsample2x_conv3x3(x, kernel, bias, dtype=self.dtype,
                                  combined=combined)


class Upsample(nn.Module):
    """2x nearest upsample + optional 3x3 conv (reference openaimodel.py:93-121).

    The conv path uses the fused subpixel decomposition (UpsampleConv3x3)."""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_conv:
            return UpsampleConv3x3(self.out_channels, dtype=self.dtype,
                                   name="conv")(x, train)
        return upsample_nearest_2x(x)


class Downsample(nn.Module):
    """Stride-2 3x3 conv or avg-pool (reference openaimodel.py:137-163)."""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv3x3(self.out_channels, strides=2, dtype=self.dtype, name="op")(x)
        assert x.shape[-1] == self.out_channels
        return avg_pool_2x(x)


class ResBlock(nn.Module):
    """Timestep-conditioned residual block (reference openaimodel.py:166-278).

    in:  GN -> SiLU -> [up/down] -> conv3x3
    emb: SiLU -> Dense (2*out if scale_shift else out)
    out: GN [FiLM if scale_shift] -> SiLU -> dropout -> conv3x3(head init)
    skip: identity / 1x1 conv; up/down also applied to the skip path.
    """

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    init_scheme: str = "reference"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_norm")(x, act="silu")
        if self.up:
            # fused upsample+conv (exact subpixel decomposition, ~2.2x fewer
            # FLOPs; the naive form's in_conv was the sampler's largest single
            # op — BENCH_NOTES.md round 2)
            x = upsample_nearest_2x(x)
            h = UpsampleConv3x3(self.out_channels, dtype=self.dtype,
                                name="in_conv")(h, train)
        else:
            if self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = conv3x3(self.out_channels, dtype=self.dtype, name="in_conv")(h)

        emb_out = dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h, act="silu", film_scale=scale, film_shift=shift)
        else:
            h = h + emb_out[:, None, None, :].astype(h.dtype)
            h = GroupNorm32(name="out_norm")(h, act="silu")
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(self.out_channels, init=head_init(self.init_scheme),
                    dtype=self.dtype, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, dtype=self.dtype, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H*W tokens
    (reference openaimodel.py:281-327 + QKVAttentionLegacy :350-375).

    qkv/proj are 1x1 convs over channels == dense over the token axis; the
    reference implements them as Conv1d, which its ``weights_init`` does NOT
    re-randomize — so qkv keeps the torch default init and proj_out keeps its
    zero init in *both* init schemes.
    """

    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(name="norm")(x)
        h = h.reshape(B, H * W, C)
        qkv = dense(3 * C, init=torch_default_init, dtype=self.dtype, name="qkv")(h)
        # reference (legacy order): per head, channels are [q | k | v]
        qkv = qkv.reshape(B, H * W, self.num_heads, 3, C // self.num_heads)
        q, k, v = (qkv[:, :, :, i, :].transpose(0, 2, 1, 3) for i in range(3))
        a = multi_head_attention(q, k, v)  # [B, heads, T, d]
        a = a.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        a = dense(C, init=zeros_init, dtype=self.dtype, name="proj_out")(a)
        return x + a.reshape(B, H, W, C)


class LinearAttention(nn.Module):
    """Linear (kernelized) attention (reference attention.py:81-97): softmax
    over keys, O(T*d^2) instead of O(T^2*d). Not used by the shipped
    templates; provided for architecture-config parity."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        qkv = conv1x1(inner * 3, init=torch_default_init, dtype=self.dtype,
                      name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,T,h,d]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
        context = jnp.einsum("bthd,bthe->bhde", k, v)
        out = jnp.einsum("bhde,bthd->bthe", context, q)
        out = out.reshape(B, H, W, inner)
        return conv1x1(C, init=torch_default_init, dtype=self.dtype, name="to_out")(out)


class SpatialSelfAttention(nn.Module):
    """Single-head conv-projected spatial self-attention
    (reference attention.py:100-150). Unused by the templates; parity item."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = conv1x1(C, init=torch_default_init, dtype=self.dtype, name="q")(h)
        k = conv1x1(C, init=torch_default_init, dtype=self.dtype, name="k")(h)
        v = conv1x1(C, init=torch_default_init, dtype=self.dtype, name="v")(h)
        T = H * W
        logits = jnp.einsum("bqc,bkc->bqk", q.reshape(B, T, C), k.reshape(B, T, C),
                            preferred_element_type=jnp.float32) * (C ** -0.5)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", w, v.reshape(B, T, C)).reshape(B, H, W, C)
        out = conv1x1(C, init=torch_default_init, dtype=self.dtype, name="proj_out")(out)
        return x + out


class CrossAttention(nn.Module):
    """Cross-attention (reference attention.py:153-196). Self-attn when context is None."""

    heads: int
    dim_head: int
    out_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        q = dense(inner, init=normal_init, use_bias=False, dtype=self.dtype, name="to_q")(x)
        ctx = x if context is None else context
        if ctx.ndim == 4:  # [B,H,W,C] context is flattened (reference attention.py:176)
            ctx = ctx.reshape(ctx.shape[0], -1, ctx.shape[-1])
        k = dense(inner, init=normal_init, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = dense(inner, init=normal_init, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = multi_head_attention(split_heads(q), split_heads(k), split_heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        return dense(self.out_dim, init=normal_init, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (reference attention.py:38-65, glu=True path)."""

    dim: int
    mult: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = dense(inner * 2, init=normal_init, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate)
        return dense(self.dim, init=normal_init, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF with pre-LayerNorm
    (reference attention.py:199-218)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(param_dtype=jnp.float32, name=name)
        x = CrossAttention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                           name="attn1")(ln("norm1")(x)) + x
        x = CrossAttention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                           name="attn2")(ln("norm2")(x), context=context) + x
        x = GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(ln("norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """Transformer over flattened spatial tokens (reference attention.py:221-264)."""

    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    init_scheme: str = "reference"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(num_groups=32, eps=1e-6, name="norm")(x)
        h = conv1x1(inner, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, inner)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                inner, self.heads, self.dim_head, context_dim=self.context_dim,
                dtype=self.dtype, name=f"block_{d}",
            )(h, context=context)
        h = h.reshape(B, H, W, inner)
        h = conv1x1(C, init=head_init(self.init_scheme), dtype=self.dtype, name="proj_out")(h)
        return x + h
