"""VQGAN adversarial training step (in-framework VQGAN training — a
capability the reference only stubs: `model/VQGAN/vqgan.py:102-150` declares
``training_step`` but nothing ever drives it; its loss math lives in
`model/VQGAN/vqperceptual.py:35-137`).

One jitted step updates BOTH players per batch (the reference BaseRunner loops
its optimizer list within a batch, `runners/BaseRunner.py:403-417`):

  generator:     nll(+LPIPS) + d_weight * disc_factor * (-E[D(xrec)])
                 + codebook_weight * q_loss
  discriminator: hinge/vanilla on D(x), D(stop_grad(xrec))

The adaptive d_weight re-derives the reference's two truncated backward passes
by differentiating only with respect to the decoder's final conv kernel.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from bbdm_tpu.models.gan_losses import (
    adaptive_d_weight,
    adopt_weight,
    hinge_d_loss,
    reconstruction_loss,
    vanilla_d_loss,
)


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    disc_stats: Any  # BatchNorm running stats (None with ActNorm)
    ema_params: Optional[Any] = None


def _replace_last(gen_params, w):
    out = copy.copy(gen_params)
    dec = dict(out["decoder"])
    conv = dict(dec["conv_out"])
    conv["kernel"] = w
    dec["conv_out"] = conv
    out = dict(out)
    out["decoder"] = dec
    return out


def make_vqgan_losses(vq_model, disc_model, loss_config, *, lpips_params=None):
    """Pure generator/discriminator loss fns (reference
    `model/VQGAN/vqperceptual.py:78-137` optimizer_idx 0/1) shared by the
    train step and the gradient-parity goldens (tests/test_golden_gan.py).

    Returns ``(gen_loss, disc_loss)``:
      gen_loss(gen_params, disc_params, disc_stats, x, step, *, temp, rng)
        -> (total, aux dict with xrec/nll/g_loss/q_loss/d_weight)
      disc_loss(disc_params, disc_stats, x, xrec, step)
        -> (loss, updated disc_stats)
    """
    is_gumbel = getattr(vq_model, "quantizer_type", "nearest") == "gumbel"
    disc_start = loss_config.get("disc_start", 0)
    disc_factor_cfg = loss_config.get("disc_factor", 1.0)
    disc_weight = loss_config.get("disc_weight", 1.0)
    codebook_weight = loss_config.get("codebook_weight", 1.0)
    perceptual_weight = loss_config.get("perceptual_weight", 1.0)
    adaptive = loss_config.get("adaptive_disc_weight", True)
    d_loss_fn = hinge_d_loss if loss_config.get("disc_loss", "hinge") == "hinge" else vanilla_d_loss
    use_actnorm = loss_config.get("use_actnorm", False)

    def apply_disc(disc_params, disc_stats, x, *, train):
        variables = {"params": disc_params}
        if disc_stats is not None:
            variables["batch_stats"] = disc_stats
        if train and disc_stats is not None:
            logits, updated = disc_model.apply(
                variables, x, train=True, mutable=["batch_stats"])
            return logits, updated["batch_stats"]
        return disc_model.apply(variables, x, train=train and use_actnorm), disc_stats

    def apply_vq(gp, inputs, *, temp, rng):
        if is_gumbel:
            return vq_model.apply({"params": gp}, inputs, temp=temp,
                                  train=True, rngs={"gumbel": rng})
        return vq_model.apply({"params": gp}, inputs)

    def gen_loss(gp, disc_params, disc_stats, x, step, *, temp=1.0, rng=None):
        disc_factor = adopt_weight(disc_factor_cfg, step, disc_start)
        xrec, qloss = apply_vq(gp, x, temp=temp, rng=rng)
        rec = reconstruction_loss(x, xrec, lpips_params=lpips_params,
                                  perceptual_weight=perceptual_weight)
        nll = rec.mean()
        logits_fake, _ = apply_disc(disc_params, disc_stats, xrec, train=False)
        g = -jnp.mean(logits_fake)

        if adaptive:
            w_last = gp["decoder"]["conv_out"]["kernel"]

            def nll_of(w):
                xr, _ = apply_vq(_replace_last(gp, w), x, temp=temp, rng=rng)
                return reconstruction_loss(
                    x, xr, lpips_params=lpips_params,
                    perceptual_weight=perceptual_weight).mean()

            def g_of(w):
                xr, _ = apply_vq(_replace_last(gp, w), x, temp=temp, rng=rng)
                lf, _ = apply_disc(disc_params, disc_stats, xr, train=False)
                return -jnp.mean(lf)

            d_weight = adaptive_d_weight(
                jax.grad(nll_of)(w_last), jax.grad(g_of)(w_last), disc_weight)
            d_weight = jax.lax.stop_gradient(d_weight)
        else:
            d_weight = disc_weight

        total = nll + d_weight * disc_factor * g + codebook_weight * qloss
        return total, {"xrec": xrec, "nll": nll, "g_loss": g,
                       "q_loss": qloss, "d_weight": d_weight}

    def disc_loss(dp, disc_stats, x, xrec, step):
        disc_factor = adopt_weight(disc_factor_cfg, step, disc_start)
        logits_real, stats1 = apply_disc(dp, disc_stats, x, train=True)
        logits_fake, stats2 = apply_disc(dp, stats1, xrec, train=True)
        return disc_factor * d_loss_fn(logits_real, logits_fake), stats2

    return gen_loss, disc_loss


def make_vqgan_train_step(
    vq_model,
    disc_model,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    loss_config,
    *,
    lpips_params=None,
    ema_decay: float = 0.0,
) -> Callable:
    is_gumbel = getattr(vq_model, "quantizer_type", "nearest") == "gumbel"
    # Gumbel softmax temperature anneal (the reference's GumbelVQ drives a
    # temperature_scheduler per step, `model/VQGAN/vqgan.py:337-342`; we use the
    # standard exponential anneal: temp = max(min, init * exp(-rate * step))).
    temp_cfg = loss_config.get("temperature_scheduler", None)
    t_init = temp_cfg.get("temp_init", 1.0) if temp_cfg is not None else 1.0
    t_min = temp_cfg.get("temp_min", 0.5) if temp_cfg is not None else 1.0
    t_rate = temp_cfg.get("anneal_rate", 1e-5) if temp_cfg is not None else 0.0

    gen_loss_fn, disc_loss_fn = make_vqgan_losses(
        vq_model, disc_model, loss_config, lpips_params=lpips_params)

    def train_step(state: GANTrainState, x, rng):
        step = state.step + 1
        temp = jnp.maximum(t_min, t_init * jnp.exp(-t_rate * step.astype(jnp.float32)))

        # ---------------- generator ----------------
        def gen_loss(gp):
            return gen_loss_fn(gp, state.disc_params, state.disc_stats, x, step,
                               temp=temp, rng=rng)

        (g_total, aux), g_grads = jax.value_and_grad(gen_loss, has_aux=True)(
            state.gen_params)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        # -------------- discriminator ---------------
        xrec = jax.lax.stop_gradient(aux["xrec"])

        def disc_loss(dp):
            return disc_loss_fn(dp, state.disc_stats, x, xrec, step)

        (d_total, disc_stats), d_grads = jax.value_and_grad(disc_loss, has_aux=True)(
            state.disc_params)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        ema_params = state.ema_params
        if ema_params is not None:
            from bbdm_tpu.training.ema import ema_update

            ema_params = ema_update(ema_params, gen_params, ema_decay,
                                    jnp.asarray(True))

        new_state = state.replace(
            step=step, gen_params=gen_params, disc_params=disc_params,
            gen_opt=gen_opt, disc_opt=disc_opt, disc_stats=disc_stats,
            ema_params=ema_params,
        )
        metrics = {
            "loss": g_total, "d_loss": d_total, "nll": aux["nll"],
            "g_loss": aux["g_loss"], "q_loss": aux["q_loss"],
            "d_weight": aux["d_weight"],
        }
        if is_gumbel:
            metrics["temperature"] = temp
        return new_state, metrics

    return train_step
