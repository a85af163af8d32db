"""VQGAN first stage (LDM-style VQ autoencoder), flax/NHWC.

Behavior parity with the reference's executed path
(`model/VQGAN/vqgan.py:31-93`, `model/VQGAN/model.py:342-537`,
`model/VQGAN/quantize.py:213-329`): a DDPM-style conv encoder/decoder with
single-head attention blocks at configured resolutions and a nearest-neighbour
vector quantizer with straight-through gradients. In LBBDM the VQGAN runs
frozen from a pre-trained LDM checkpoint; ``bbdm_tpu.checkpoints.torch_import``
converts the torch ``state_dict`` into this module's param tree.

GroupNorm here uses eps=1e-6 (reference `model/VQGAN/model.py:34-35`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bbdm_tpu.models.layers import GroupNorm32, avg_pool_2x, upsample_nearest_2x
from bbdm_tpu.ops.attention import multi_head_attention

Dtype = Any

# The frozen VQGAN keeps torch-default-style init; it is never trained here
# (weights always come from a converted checkpoint), so init only matters for
# tests and shape checks.
_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _conv(features, kernel, *, strides=1, padding, dtype, name):
    return nn.Conv(features, (kernel, kernel), strides=strides, padding=padding,
                   kernel_init=_init, dtype=dtype, param_dtype=jnp.float32, name=name)


class VQResnetBlock(nn.Module):
    """GN -> swish -> conv3x3, twice, with 1x1 shortcut (reference model.py:78-137)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm32(eps=1e-6, name="norm1")(x, act="silu")
        h = _conv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h, act="silu")
        h = _conv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, padding=0, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VQAttnBlock(nn.Module):
    """Single-head spatial self-attention (reference model.py:140-192)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = _conv(C, 1, padding=0, dtype=self.dtype, name="q")(h).reshape(B, 1, H * W, C)
        k = _conv(C, 1, padding=0, dtype=self.dtype, name="k")(h).reshape(B, 1, H * W, C)
        v = _conv(C, 1, padding=0, dtype=self.dtype, name="v")(h).reshape(B, 1, H * W, C)
        a = multi_head_attention(q, k, v).reshape(B, H, W, C)
        a = _conv(C, 1, padding=0, dtype=self.dtype, name="proj_out")(a)
        return x + a


class VQDownsample(nn.Module):
    """Asymmetric-padded stride-2 conv (reference model.py:56-75)."""

    with_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # torch pads (0,1,0,1): right/bottom only
            return nn.Conv(
                x.shape[-1], (3, 3), strides=2, padding=((0, 1), (0, 1)),
                kernel_init=_init, dtype=self.dtype, param_dtype=jnp.float32, name="conv",
            )(x)
        return avg_pool_2x(x)


class VQUpsample(nn.Module):
    with_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.with_conv:
            # fused subpixel upsample+conv (ops/upsample_conv.py) — exact,
            # ~2.2x fewer FLOPs, param tree identical to the naive conv;
            # train=True keeps the naive lowering (see layers.UpsampleConv3x3)
            from bbdm_tpu.models.layers import UpsampleConv3x3

            return UpsampleConv3x3(x.shape[-1], init=_init, dtype=self.dtype,
                                   name="conv")(x, train)
        return upsample_nearest_2x(x)


class VQEncoder(nn.Module):
    """reference model.py:342-433."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: int
    double_z: bool = False
    resamp_with_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = _conv(self.ch, 3, padding=1, dtype=self.dtype, name="conv_in")(x.astype(self.dtype or x.dtype))
        curr_res = self.resolution
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = VQResnetBlock(self.ch * mult, dtype=self.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = VQAttnBlock(dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = VQDownsample(self.resamp_with_conv, dtype=self.dtype,
                                 name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = VQResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = VQAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VQResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h, act="silu")
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv(out_ch, 3, padding=1, dtype=jnp.float32, name="conv_out")(
            h.astype(jnp.float32))


class VQDecoder(nn.Module):
    """reference model.py:436-537."""

    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: int
    resamp_with_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = False):
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)
        h = _conv(block_in, 3, padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype or z.dtype))
        h = VQResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = VQAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VQResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                h = VQResnetBlock(self.ch * self.ch_mult[i_level], dtype=self.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = VQAttnBlock(dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = VQUpsample(self.resamp_with_conv, dtype=self.dtype,
                               name=f"up_{i_level}_upsample")(h, train)
                curr_res *= 2
        h = GroupNorm32(eps=1e-6, name="norm_out")(h, act="silu")
        return _conv(self.out_ch, 3, padding=1, dtype=jnp.float32, name="conv_out")(
            h.astype(jnp.float32))


class VectorQuantizer(nn.Module):
    """Nearest-neighbour codebook quantizer with straight-through gradients
    (reference quantize.py:213-329, VectorQuantizer2, beta=0.25, legacy).

    The argmin is a single [N, n_e] matmul on the MXU:
    d = |z|^2 + |e|^2 - 2 z e^T.
    """

    n_e: int
    e_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        def _cb_init(key, shape, dtype):
            # U(-1/n_e, 1/n_e), reference quantize.py:230
            return jax.random.uniform(key, shape, dtype, -1.0 / self.n_e, 1.0 / self.n_e)

        codebook = self.param("embedding", _cb_init, (self.n_e, self.e_dim), jnp.float32)
        zf = z.astype(jnp.float32)
        flat = zf.reshape(-1, self.e_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * jnp.dot(flat, codebook.T, preferred_element_type=jnp.float32)
        )
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(zf.shape)
        # legacy-beta commitment loss (reference quantize.py:293-295)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2) + self.beta * jnp.mean(
            (z_q - jax.lax.stop_gradient(zf)) ** 2
        )
        z_q = zf + jax.lax.stop_gradient(z_q - zf)  # straight-through
        return z_q.astype(z.dtype), loss, idx.reshape(zf.shape[:-1])

    def get_codebook_entry(self, params, indices):
        return params["embedding"][indices]


class GumbelQuantize(nn.Module):
    """Gumbel-softmax categorical quantizer (reference quantize.py:110-211,
    used by the GumbelVQ variant `model/VQGAN/vqgan.py:280-382`).

    A 1x1 conv projects the latent to ``n_e`` logits; a (relaxed) one-hot draw
    over the codebook axis mixes codebook rows: z_q = one_hot @ codebook. Hard
    straight-through in training (gradient flows through the soft sample), pure
    argmax when no RNG is supplied (deterministic eval — the reference keeps
    sampling Gumbel noise in eval; we drop the noise there so frozen-first-stage
    decoding is reproducible). Loss = kl_weight * KL(q || uniform). ``remap``
    is not supported (no shipped reference config uses it).
    """

    n_e: int
    e_dim: int
    kl_weight: float = 5e-4
    straight_through: bool = True

    @nn.compact
    def __call__(self, z, *, temp: float = 1.0, train: bool = False):
        zf = z.astype(jnp.float32)
        logits = nn.Conv(self.n_e, (1, 1), kernel_init=_init,
                         param_dtype=jnp.float32, name="proj")(zf)
        codebook = self.param(
            "embedding", nn.initializers.normal(1.0), (self.n_e, self.e_dim),
            jnp.float32)

        if train:
            u = jax.random.uniform(
                self.make_rng("gumbel"), logits.shape, jnp.float32,
                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
            noisy = logits - jnp.log(-jnp.log(u))
        else:
            noisy = logits
        soft = jax.nn.softmax(noisy / temp, axis=-1)
        idx = jnp.argmax(soft, axis=-1)
        if (not train) or self.straight_through:
            hard = jax.nn.one_hot(idx, self.n_e, dtype=jnp.float32)
            one_hot = hard + soft - jax.lax.stop_gradient(soft)
        else:
            one_hot = soft
        z_q = jnp.einsum("...n,nd->...d", one_hot, codebook,
                         preferred_element_type=jnp.float32)

        qy = jax.nn.softmax(logits, axis=-1)
        kl = jnp.sum(qy * jnp.log(qy * self.n_e + 1e-10), axis=-1).mean()
        return z_q.astype(z.dtype), self.kl_weight * kl, idx

    def get_codebook_entry(self, params, indices):
        return params["embedding"][indices]


class VQModel(nn.Module):
    """Encoder + quantizer + decoder with pre/post 1x1 quant convs
    (reference vqgan.py:31-93). Exposes the piecemeal methods LBBDM uses.
    """

    ddconfig: dict
    n_embed: int
    embed_dim: int
    quantizer_type: str = "nearest"  # {"nearest", "gumbel"} (GumbelVQ variant)
    kl_weight: float = 5e-4
    dtype: Optional[Dtype] = None

    def setup(self):
        dd = self.ddconfig
        self.encoder = VQEncoder(
            ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd["attn_resolutions"]), resolution=dd["resolution"],
            z_channels=dd["z_channels"], double_z=dd.get("double_z", False),
            dtype=self.dtype, name="encoder",
        )
        self.decoder = VQDecoder(
            ch=dd["ch"], out_ch=dd["out_ch"], ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"], attn_resolutions=tuple(dd["attn_resolutions"]),
            resolution=dd["resolution"], z_channels=dd["z_channels"],
            dtype=self.dtype, name="decoder",
        )
        if self.quantizer_type == "gumbel":
            self.quantize = GumbelQuantize(self.n_embed, self.embed_dim,
                                           kl_weight=self.kl_weight, name="quantize")
        elif self.quantizer_type == "nearest":
            self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, name="quantize")
        else:
            raise ValueError(f"unknown quantizer_type {self.quantizer_type!r}")
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), kernel_init=_init,
                                  param_dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(dd["z_channels"], (1, 1), kernel_init=_init,
                                       param_dtype=jnp.float32, name="post_quant_conv")

    def encode_pre_quant(self, x):
        """encoder output before quant_conv (LBBDM `latent_before_quant_conv`)."""
        return self.encoder(x)

    def encode_latent(self, x):
        """encoder -> quant_conv, no quantization (LBBDM default encode path,
        reference LatentBrownianBridgeModel.py:73-85)."""
        return self.quant_conv(self.encoder(x))

    def quantize_latent(self, h, *, temp: float = 1.0, train: bool = False):
        if self.quantizer_type == "gumbel":
            return self.quantize(h, temp=temp, train=train)
        return self.quantize(h)

    def apply_quant_conv(self, h):
        return self.quant_conv(h)

    def decode_from_quant(self, quant, train: bool = False):
        """post_quant_conv -> decoder (reference vqgan.py:80-83)."""
        return self.decoder(self.post_quant_conv(quant), train)

    def __call__(self, x, *, temp: float = 1.0, train: bool = False):
        """Full autoencode roundtrip (reference vqgan.py:90-93; GumbelVQ
        threads a softmax temperature, vqgan.py:423-427)."""
        h = self.encode_latent(x)
        quant, emb_loss, _ = self.quantize_latent(h, temp=temp, train=train)
        return self.decode_from_quant(quant, train), emb_loss

    @staticmethod
    def from_config(vq_params, dtype=None) -> "VQModel":
        dd = vq_params.ddconfig
        ddconfig = {
            "ch": dd.ch, "ch_mult": tuple(dd.ch_mult), "num_res_blocks": dd.num_res_blocks,
            "attn_resolutions": tuple(dd.attn_resolutions), "resolution": dd.resolution,
            "z_channels": dd.z_channels, "in_channels": dd.in_channels, "out_ch": dd.out_ch,
            "double_z": dd.get("double_z", False), "dropout": dd.get("dropout", 0.0),
        }
        return VQModel(ddconfig=ddconfig, n_embed=vq_params.n_embed,
                       embed_dim=vq_params.embed_dim,
                       quantizer_type=vq_params.get("quantizer", "nearest"),
                       kl_weight=vq_params.get("kl_weight", 5e-4), dtype=dtype)
