"""VQGAN training losses (reference `model/VQGAN/vqperceptual.py:15-137`).

``vqgan_generator_loss`` / ``vqgan_discriminator_loss`` are pure functions the
GAN train step composes:

  generator:  nll + d_weight * disc_factor * g_loss + codebook_weight * q_loss
              with the adaptive d_weight = |grad nll wrt last layer| /
              (|grad g wrt last layer| + 1e-4), clipped to 1e4 and scaled by
              ``disc_weight`` (reference `:64-75`)
  disc:       hinge or vanilla on real/fake patch logits (`:21-33`)
  adopt_weight gates the adversarial terms until ``disc_start`` (`:15-18`).

The optional perceptual term uses the LPIPS port
(bbdm_tpu.evaluation.lpips) when backbone weights are supplied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def reconstruction_loss(x, xrec, *, lpips_params=None, perceptual_weight=1.0):
    """|x - xrec| (+ optional LPIPS perceptual term), per-element."""
    rec = jnp.abs(x - xrec)
    if lpips_params is not None and perceptual_weight > 0:
        from bbdm_tpu.evaluation.lpips import lpips_distance

        p = lpips_distance(lpips_params, "vgg", x, xrec)  # [N]
        rec = rec + perceptual_weight * p.reshape(-1, 1, 1, 1)
    return rec


def adaptive_d_weight(nll_grad_last, g_grad_last, disc_weight=1.0):
    """reference `:64-75`: balance the adversarial push against the recon pull
    at the decoder's last layer."""
    nll_norm = jnp.linalg.norm(nll_grad_last)
    g_norm = jnp.linalg.norm(g_grad_last)
    w = nll_norm / (g_norm + 1e-4)
    return jnp.clip(w, 0.0, 1e4) * disc_weight
