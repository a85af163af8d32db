"""Latent Brownian Bridge Diffusion Model (LBBDM): bridge in the latent space
of a frozen pre-trained VQGAN.

Behavior parity with reference `model/BrownianBridge/LatentBrownianBridgeModel.py`:
  * encode: VQGAN encoder [+ quant_conv unless latent_before_quant_conv],
    optional per-channel mean/std normalization (`:73-85`). No quantization on
    the way in.
  * decode: denormalize, [quant_conv if latent_before_quant_conv], quantize,
    post_quant_conv + decoder (`:87-100`).
  * condition stage: None ('nocond'), the VQGAN encoder ('first_stage', with
    stopped gradients), or a trainable SpatialRescaler (`:29-37,64-71`).
    Note: the reference's 'first_stage' branch calls the VQGAN *forward*
    (reconstruction), which returns a tuple and cannot feed the UNet — a
    latent bug; we implement the evident intent (encode to latent).
  * the VQGAN is frozen: excluded from the trainable mask, and encodes are
    wrapped in stop_gradient (`:23-27,57-62`).

Latent mean/std statistics are data-dependent state computed by the runner
(reference `runners/DiffusionBasedModelRunners/BBDMRunner.py:85-162`) and are
passed in explicitly as ``latent_stats`` so every method stays pure.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from bbdm_tpu.models.bridge import BrownianBridgeModel
from bbdm_tpu.models.cond import SpatialRescaler
from bbdm_tpu.models.vqgan import VQModel


def init_latent_stats(channels: int) -> dict:
    """Identity normalization stats (mean 0 / std 1), shape [1,1,1,C]."""
    z = jnp.zeros((1, 1, 1, channels), jnp.float32)
    o = jnp.ones((1, 1, 1, channels), jnp.float32)
    return {"ori_latent_mean": z, "ori_latent_std": o,
            "cond_latent_mean": z, "cond_latent_std": o}


class LatentBrownianBridgeModel(BrownianBridgeModel):
    def __init__(self, model_config, *, dtype=jnp.bfloat16):
        super().__init__(model_config, dtype=dtype)
        self.latent_before_quant_conv = model_config.get("latent_before_quant_conv", False)
        self.normalize_latent = model_config.get("normalize_latent", False)
        self.vqgan = VQModel.from_config(model_config.VQGAN.params, dtype=dtype)
        self.vqgan_resolution = model_config.VQGAN.params.ddconfig.resolution
        self.vqgan_in_channels = model_config.VQGAN.params.ddconfig.in_channels

        if self.condition_key == "SpatialRescaler":
            self.cond_stage_model = SpatialRescaler.from_config(
                model_config.CondStageParams, dtype=dtype
            )
        else:
            self.cond_stage_model = None  # 'nocond' or 'first_stage'

    # ---------------------------------------------------------------- params

    def init_params(self, rng) -> dict:
        u_rng, v_rng, c_rng = jax.random.split(rng, 3)
        params = super().init_params(u_rng)
        img = jnp.zeros(
            (1, self.vqgan_resolution, self.vqgan_resolution, self.vqgan_in_channels),
            jnp.float32,
        )
        params["vqgan"] = self.vqgan.init(v_rng, img)["params"]
        if self.cond_stage_model is not None:
            params["cond_stage"] = self.cond_stage_model.init(c_rng, img)["params"]
        return params

    def trainable_mask(self, params) -> dict:
        """UNet (+ cond stage) train; the VQGAN is frozen (reference `:23-27,42-49`)."""
        return {
            k: jax.tree_util.tree_map(lambda _: k != "vqgan", v)
            for k, v in params.items()
        }

    # ------------------------------------------------------------ VQGAN I/O

    def encode(self, params, x, *, cond=True, normalize=None, latent_stats=None):
        """Image -> bridge latent (reference `:73-85`). Gradients are stopped."""
        normalize = self.normalize_latent if normalize is None else normalize
        method = (
            VQModel.encode_pre_quant if self.latent_before_quant_conv
            else VQModel.encode_latent
        )
        z = self.vqgan.apply({"params": params["vqgan"]}, x, method=method)
        z = jax.lax.stop_gradient(z)
        if normalize:
            s = latent_stats if latent_stats is not None else init_latent_stats(z.shape[-1])
            if cond:
                z = (z - s["cond_latent_mean"]) / s["cond_latent_std"]
            else:
                z = (z - s["ori_latent_mean"]) / s["ori_latent_std"]
        return z

    def decode(self, params, z, *, cond=True, normalize=None, latent_stats=None):
        """Bridge latent -> image (reference `:87-100`): denorm, [quant_conv],
        quantize, post_quant_conv + decoder."""
        normalize = self.normalize_latent if normalize is None else normalize
        if normalize:
            s = latent_stats if latent_stats is not None else init_latent_stats(z.shape[-1])
            if cond:
                z = z * s["cond_latent_std"] + s["cond_latent_mean"]
            else:
                z = z * s["ori_latent_std"] + s["ori_latent_mean"]
        vq = {"params": params["vqgan"]}
        if self.latent_before_quant_conv:
            z = self.vqgan.apply(vq, z, method=VQModel.apply_quant_conv)
        quant, _, _ = self.vqgan.apply(vq, z, method=VQModel.quantize_latent)
        return self.vqgan.apply(vq, quant, method=VQModel.decode_from_quant)

    def get_cond_stage_context(self, params, x_cond):
        """reference `:64-71`."""
        if self.condition_key == "SpatialRescaler":
            return self.cond_stage_model.apply({"params": params["cond_stage"]}, x_cond)
        if self.condition_key == "first_stage":
            return jax.lax.stop_gradient(self.encode(params, x_cond, cond=True))
        return None

    # ----------------------------------------------------------------- loss

    def loss(self, params, rng, x, y, context=None, latent_stats=None):
        """Training loss in latent space (reference `:57-62`)."""
        x_latent = self.encode(params, x, cond=False, latent_stats=latent_stats)
        y_latent = self.encode(params, y, cond=True, latent_stats=latent_stats)
        if context is None:
            context = self.get_cond_stage_context(params, y)
        return super().loss(params, rng, x_latent, y_latent, context=context)

    # -------------------------------------------------------------- sampling

    def sample(self, params, rng, x_cond, context=None, *, clip_denoised=False,
               sample_mid_step=False, latent_stats=None, num_samples=1):
        """Conditional generation (reference `:102-132`): encode condition,
        run the reverse bridge from it, decode.

        ``num_samples > 1`` draws several samples for the SAME conditions in
        one compiled call (`lax.scan` over split rngs, stacked
        [num_samples, B, H, W, C] output): the condition encode, cond-stage
        context, parameter pre-cast and subpixel kernel hoist run once
        instead of per repeat — the reference's ``testing.sample_num`` loop
        (BBDMRunner.py:234-239) re-encodes every time."""
        y_latent = self.encode(params, x_cond, cond=True, latent_stats=latent_stats)
        if context is None:
            context = self.get_cond_stage_context(params, x_cond)
        if num_samples > 1:
            if sample_mid_step:
                raise NotImplementedError("num_samples>1 with sample_mid_step")

            def body(carry, r):
                z = self.p_sample_loop(params, r, y_latent, context,
                                       clip_denoised=clip_denoised)
                return carry, self.decode(params, z, cond=False,
                                          latent_stats=latent_stats)

            _, outs = jax.lax.scan(body, None, jax.random.split(rng, num_samples))
            return outs
        out = self.p_sample_loop(
            params, rng, y_latent, context,
            clip_denoised=clip_denoised, sample_mid_step=sample_mid_step,
        )
        if sample_mid_step:
            imgs, one_step_imgs = out
            dec = lambda zs: jax.vmap(
                lambda z: self.decode(params, z, cond=False, latent_stats=latent_stats)
            )(zs)
            return dec(imgs), dec(one_step_imgs)
        return self.decode(params, out, cond=False, latent_stats=latent_stats)

    def sample_vqgan(self, params, x):
        """VQGAN roundtrip (reference `:134-137`)."""
        rec, _ = self.vqgan.apply({"params": params["vqgan"]}, x)
        return rec
