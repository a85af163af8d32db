"""PatchGAN discriminator + ActNorm (reference `model/VQGAN/discriminator.py`).

NLayerDiscriminator: conv4x4-stride2 ladder with BatchNorm (torch parity,
flax ``batch_stats`` collection) or ActNorm (per-channel affine with
data-dependent init), LeakyReLU(0.2), 1-channel patch logits.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d default init
_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class ActNorm(nn.Module):
    """Per-channel scale/shift with data-dependent initialization
    (reference discriminator.py:6-60): loc/scale are initialized from the
    first batch (the one passed to ``init``) so the initial output is
    zero-mean unit-variance, then trained as ordinary params."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        C = x.shape[-1]
        xf = x.astype(jnp.float32)
        loc = self.param("loc", lambda k, s: -jnp.mean(xf, axis=(0, 1, 2)), (C,))
        scale = self.param(
            "scale", lambda k, s: 1.0 / (jnp.std(xf, axis=(0, 1, 2)) + 1e-6), (C,))
        return (scale * (xf + loc)).astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    """reference discriminator.py:63-123 (pix2pix PatchGAN)."""

    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=1, kernel_init=_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers + 1):
            nf = min(2**n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.ndf * nf, (4, 4), strides=stride, padding=1,
                        use_bias=self.use_actnorm, kernel_init=_init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv_{n}")(h)
            if self.use_actnorm:
                h = ActNorm(name=f"norm_{n}")(h, train=train)
            else:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"norm_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=1, kernel_init=_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(h)
