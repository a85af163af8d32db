"""The guided-diffusion-style UNet denoiser, TPU-native (flax.linen, NHWC).

Architecture parity with the reference UNetModel
(`model/BrownianBridge/base/modules/diffusionmodules/openaimodel.py:416-759`):

* timestep embedding: sinusoidal(model_channels) -> Dense(4*mc) -> SiLU -> Dense(4*mc)
* encoder: conv3x3 stem, then per channel_mult level: num_res_blocks x
  [ResBlock (+ attention when the downsampling factor ds is listed in
  attention_resolutions)], with a downsampling ResBlock (resblock_updown) or
  strided conv between levels
* middle: ResBlock -> attention -> ResBlock
* decoder: mirror with skip concatenation from every encoder activation and
  upsampling ResBlocks
* head: GroupNorm -> SiLU -> conv3x3 to out_channels
* conditioning: channel-concat of context whenever condition_key != 'nocond'
  (reference `openaimodel.py:741-742`); cross-attention context additionally
  feeds SpatialTransformer blocks when use_spatial_transformer=True.

Note `attention_resolutions` holds downsampling *factors* (ds in {1,2,4,...}),
not pixel sizes — the reference compares `ds in attention_resolutions`
(`openaimodel.py:546`). With the shipped templates (attn (32,16,8), 3 levels)
no encoder/decoder attention triggers; only the middle block attends.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bbdm_tpu.models.layers import (
    AttentionBlock,
    Downsample,
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    Upsample,
    conv3x3,
    dense,
    head_init,
    timestep_embedding,
)


class UNet(nn.Module):
    """Parameters mirror the YAML ``UNetParams`` schema (configs/Template-*.yaml)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    condition_key: str = "nocond"
    use_checkpoint: bool = False
    init_scheme: str = "reference"
    dtype: Any = jnp.bfloat16

    def _heads_for(self, ch: int, decoder: bool = False) -> Tuple[int, int]:
        """(num_heads, dim_head) for an attention block at width ch.

        Replicates the legacy head arithmetic of `openaimodel.py:546-565`
        (encoder/middle) and `:648-666` (decoder): with num_head_channels
        set, heads = ch // num_head_channels everywhere. With
        num_head_channels == -1, decoder-side AttentionBlocks use
        num_heads_upsample (defaulting to num_heads when -1,
        `openaimodel.py:496-497,659`); SpatialTransformer always uses
        num_heads.
        """
        if self.num_head_channels == -1:
            heads = self.num_heads
            if decoder and not self.use_spatial_transformer and self.num_heads_upsample != -1:
                heads = self.num_heads_upsample
            dim_head = ch // heads
        else:
            heads, dim_head = ch // self.num_head_channels, self.num_head_channels
        if self.use_spatial_transformer:
            dim_head = ch // heads
        return heads, dim_head

    def _attention(self, ch: int, name: str, decoder: bool = False):
        heads, dim_head = self._heads_for(ch, decoder=decoder)
        if self.use_spatial_transformer:
            return SpatialTransformer(
                heads=heads, dim_head=dim_head, depth=self.transformer_depth,
                context_dim=self.context_dim, init_scheme=self.init_scheme,
                dtype=self.dtype, name=name,
            )
        return AttentionBlock(num_heads=heads, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, timesteps, context=None, *, train: bool = False):
        """x: [B,H,W,C] in [-1,1]-ish scale; timesteps: [B] int/float.

        Returns [B,H,W,out_channels] in float32.
        """
        if self.dims != 2:
            # permanent decision, not a TODO (docs/ARCHITECTURE.md "Parity
            # seams"): the reference's conv_nd 1-D/3-D switch (`diffusion-
            # modules/util.py:218-228`) is dead in every reference config;
            # this UNet is NHWC-2-D by design (attention flattening, subpixel
            # upsample decomposition, Pallas kernels)
            raise NotImplementedError(
                "only dims=2 (NHWC images) is supported; the reference's "
                "dims=1/3 conv_nd switch is unreachable from every reference "
                "config — see docs/ARCHITECTURE.md")
        mc = self.model_channels

        t_emb = timestep_embedding(timesteps, mc)
        emb = dense(4 * mc, name="time_dense_0")(t_emb)
        emb = dense(4 * mc, name="time_dense_1")(nn.silu(emb))

        if self.condition_key != "nocond" and context is not None:
            x = jnp.concatenate([x, context.astype(x.dtype)], axis=-1)
        h = x.astype(self.dtype)
        emb = emb.astype(self.dtype)
        xattn = None if not self.use_spatial_transformer else context

        def res(ch, name, **kw):
            # activation checkpointing (reference use_checkpoint per-ResBlock,
            # `diffusionmodules/util.py:102-148`) -> jax.remat: recompute the
            # block in the backward pass instead of storing activations
            # static_argnums=(3,): the `train` flag (self at 0, x, emb, train)
            cls = nn.remat(ResBlock, static_argnums=(3,)) if self.use_checkpoint else ResBlock
            return cls(
                out_channels=ch, use_scale_shift_norm=self.use_scale_shift_norm,
                dropout=self.dropout, init_scheme=self.init_scheme,
                dtype=self.dtype, name=name, **kw,
            )

        # --- encoder ---
        hs = []
        h = conv3x3(mc, dtype=self.dtype, name="stem")(h)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(mult * mc, f"down_{level}_{i}")(h, emb, train)
                if ds in self.attention_resolutions:
                    attn = self._attention(h.shape[-1], f"down_{level}_{i}_attn")
                    h = attn(h, xattn) if self.use_spatial_transformer else attn(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                ch = h.shape[-1]
                if self.resblock_updown:
                    h = res(ch, f"down_{level}_ds", down=True)(h, emb, train)
                else:
                    h = Downsample(ch, self.conv_resample, dtype=self.dtype,
                                   name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        # --- middle ---
        ch = h.shape[-1]
        h = res(ch, "mid_res_0")(h, emb, train)
        attn = self._attention(ch, "mid_attn")
        h = attn(h, xattn) if self.use_spatial_transformer else attn(h)
        h = res(ch, "mid_res_1")(h, emb, train)

        # --- decoder ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(mult * mc, f"up_{level}_{i}")(h, emb, train)
                if ds in self.attention_resolutions:
                    attn = self._attention(h.shape[-1], f"up_{level}_{i}_attn",
                                           decoder=True)
                    h = attn(h, xattn) if self.use_spatial_transformer else attn(h)
                if level and i == self.num_res_blocks:
                    ch = h.shape[-1]
                    if self.resblock_updown:
                        h = res(ch, f"up_{level}_us", up=True)(h, emb, train)
                    else:
                        h = Upsample(ch, self.conv_resample, dtype=self.dtype,
                                     name=f"up_{level}_us")(h, train)
                    ds //= 2

        # --- head ---
        h = GroupNorm32(name="out_norm")(h, act="silu")
        h = conv3x3(self.out_channels, init=head_init(self.init_scheme),
                    dtype=jnp.float32, name="out_conv")(h.astype(jnp.float32))
        return h

    @staticmethod
    def from_config(unet_params, condition_key: str, dtype=jnp.bfloat16,
                    init_scheme: str = "reference") -> "UNet":
        """Build from a ``UNetParams`` config node (YAML schema verbatim)."""
        p = unet_params
        return UNet(
            image_size=p.image_size,
            in_channels=p.in_channels,
            model_channels=p.model_channels,
            out_channels=p.out_channels,
            num_res_blocks=p.num_res_blocks,
            attention_resolutions=tuple(p.attention_resolutions),
            dropout=p.get("dropout", 0.0) if hasattr(p, "get") else 0.0,
            channel_mult=tuple(p.channel_mult),
            conv_resample=p.get("conv_resample", True),
            dims=p.get("dims", 2),
            num_heads=p.get("num_heads", -1),
            num_head_channels=p.get("num_head_channels", -1),
            num_heads_upsample=p.get("num_heads_upsample", -1),
            use_scale_shift_norm=p.get("use_scale_shift_norm", False),
            resblock_updown=p.get("resblock_updown", False),
            use_spatial_transformer=p.get("use_spatial_transformer", False),
            transformer_depth=p.get("transformer_depth", 1),
            context_dim=p.get("context_dim", None),
            condition_key=condition_key,
            use_checkpoint=p.get("use_checkpoint", False),
            dtype=dtype,
            init_scheme=init_scheme,
        )
