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
    """

    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, labels):
        emb = nn.Embed(self.n_classes, self.embed_dim,
                       embedding_init=nn.initializers.normal(1.0),
                       name="embedding")(labels.astype(jnp.int32))
        return emb[:, None, :]


class TransformerEmbedder(nn.Module):
    """Token-sequence cross-attention conditioner (reference
    `encoders/modules.py:36-50`, a lucidrains x_transformer
    TransformerWrapper+Encoder returning embeddings).

    TPU-native redesign rather than an x_transformer port: learned token +
    absolute position embeddings, ``n_layer`` pre-norm blocks (LN -> MHSA ->
    residual; LN -> GELU MLP x4 -> residual), final LN. No pretrained weights
    exist on this reference path, so functional parity (tokens [B,S] ->
    context [B,S,n_embed]) is the contract, not weight-level parity.
    """

    n_embed: int
    n_layer: int
    vocab_size: int
    max_seq_len: int = 77
    num_heads: int = 8
    embedding_dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, tokens, *, train: bool = False):
        tokens = tokens.astype(jnp.int32)
        B, S = tokens.shape
        if S > self.max_seq_len:
            raise ValueError(f"sequence length {S} > max_seq_len {self.max_seq_len}")
        h = nn.Embed(self.vocab_size, self.n_embed,
                     embedding_init=nn.initializers.normal(0.02),
                     name="token_emb")(tokens)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_seq_len, self.n_embed), jnp.float32)
        h = h + pos[:S]
        h = nn.Dropout(self.embedding_dropout, deterministic=not train)(h)
        h = h.astype(self.dtype) if self.dtype is not None else h
        for i in range(self.n_layer):
            a = nn.LayerNorm(dtype=jnp.float32, name=f"ln_attn_{i}")(h)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"attn_{i}")(a, a)
            h = h + a
            f = nn.LayerNorm(dtype=jnp.float32, name=f"ln_ff_{i}")(h)
            f = nn.Dense(4 * self.n_embed, param_dtype=jnp.float32,
                         dtype=self.dtype, name=f"ff_in_{i}")(f)
            f = nn.gelu(f)
            f = nn.Dense(self.n_embed, param_dtype=jnp.float32,
                         dtype=self.dtype, name=f"ff_out_{i}")(f)
            h = h + f
        return nn.LayerNorm(dtype=jnp.float32, name="ln_final")(h).astype(jnp.float32)


class BERTTokenizer:
    """HuggingFace bert-base-uncased tokenizer wrapper (reference
    `encoders/modules.py:53-77`). Produces fixed-length [B, max_length] int32
    token ids padded to max_length.

    Requires a locally cached/downloaded tokenizer (this environment has no
    network egress); pass ``name_or_path`` to point at a local copy.
    """

    def __init__(self, vq_interface: bool = True, max_length: int = 77,
                 name_or_path: str = "bert-base-uncased"):
        from transformers import BertTokenizerFast  # gated heavy import

        self.tokenizer = BertTokenizerFast.from_pretrained(name_or_path)
        self.vq_interface = vq_interface
        self.max_length = max_length

    def __call__(self, text):
        enc = self.tokenizer(
            text, truncation=True, max_length=self.max_length,
            return_length=True, return_overflowing_tokens=False,
            padding="max_length", return_tensors="np",
        )
        return jnp.asarray(enc["input_ids"], jnp.int32)

    def encode(self, text):
        tokens = self(text)
        if not self.vq_interface:
            return tokens
        return None, None, [None, None, tokens]  # reference vq-interface shape

    def decode(self, text):
        return text


class BERTEmbedder(nn.Module):
    """BERT-tokenized text -> transformer context (reference
    `encoders/modules.py:80-103`). The tokenizer is host-side (strings are not
    jittable); the module itself consumes token ids, and ``tokenize`` is the
    host-side preprocessing hook. vocab 30522, seq len 77 as in the reference.
    """

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    use_tokenizer: bool = True
    embedding_dropout: float = 0.0
    dtype: Any = None

    def setup(self):
        self.transformer = TransformerEmbedder(
            n_embed=self.n_embed, n_layer=self.n_layer,
            vocab_size=self.vocab_size, max_seq_len=self.max_seq_len,
            embedding_dropout=self.embedding_dropout, dtype=self.dtype,
            name="transformer")

    def tokenize(self, text, name_or_path: str = "bert-base-uncased"):
        if not self.use_tokenizer:
            return jnp.asarray(text, jnp.int32)
        return BERTTokenizer(vq_interface=False, max_length=self.max_seq_len,
                             name_or_path=name_or_path)(text)

    def __call__(self, tokens, *, train: bool = False):
        return self.transformer(tokens, train=train)
