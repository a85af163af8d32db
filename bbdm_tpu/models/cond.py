"""Condition-stage encoders.

``SpatialRescaler`` (reference
`model/BrownianBridge/base/modules/encoders/modules.py:106-134`): n stages of
0.5x bilinear downscaling plus an optional 1x1 channel-mapping conv. This is
the trainable condition encoder for LBBDM's ``condition_key: SpatialRescaler``
mode (256^2 image -> latent-sized context).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bbdm_tpu.models.layers import conv1x1, normal_init


class SpatialRescaler(nn.Module):
    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_stages):
            B, H, W, C = x.shape
            new_shape = (B, int(H * self.multiplier), int(W * self.multiplier), C)
            # antialias=False matches torch F.interpolate's plain bilinear
            x = jax.image.resize(x, new_shape, method=self.method, antialias=False)
        if self.out_channels is not None:
            x = nn.Conv(
                self.out_channels, (1, 1), use_bias=self.bias,
                kernel_init=normal_init, dtype=self.dtype,
                param_dtype=jnp.float32, name="channel_mapper",
            )(x)
        return x

    @staticmethod
    def from_config(cond_params, dtype=None) -> "SpatialRescaler":
        return SpatialRescaler(
            n_stages=cond_params.get("n_stages", 1),
            method=cond_params.get("method", "bilinear"),
            multiplier=cond_params.get("multiplier", 0.5),
            out_channels=cond_params.get("out_channels", None),
            bias=cond_params.get("bias", False),
            dtype=dtype,
        )


class ClassEmbedder(nn.Module):
    """Class-label embedding conditioner (reference
    `encoders/modules.py:21-33`): an embedding table keyed by an integer label
    batch, returned as a [B, 1, embed_dim] context sequence for cross-attention.
    (The reference's BERT/transformer text embedders sit on its dead
    x_transformer path, SURVEY.md §2.2, and are intentionally not rebuilt.)
    """

    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, labels):
        emb = nn.Embed(self.n_classes, self.embed_dim,
                       embedding_init=nn.initializers.normal(1.0),
                       name="embedding")(labels.astype(jnp.int32))
        return emb[:, None, :]
