"""Model factory: config.model -> model object (reference `BBDMRunner.py:21-29`)."""

from __future__ import annotations

import jax.numpy as jnp


def build_model(model_config, *, dtype=None):
    """Instantiate BBDM or LBBDM from the ``model:`` config subtree.

    ``model.mixed_precision`` (default True) selects bf16 compute; params are
    always fp32.
    """
    from bbdm_tpu.models.bridge import BrownianBridgeModel
    from bbdm_tpu.models.latent import LatentBrownianBridgeModel

    if dtype is None:
        mixed = model_config.get("mixed_precision", True)
        dtype = jnp.bfloat16 if mixed else jnp.float32

    model_type = model_config.model_type
    if model_type == "BBDM":
        return BrownianBridgeModel(model_config, dtype=dtype)
    if model_type == "LBBDM":
        return LatentBrownianBridgeModel(model_config, dtype=dtype)
    raise NotImplementedError(f"model_type {model_type!r}")
