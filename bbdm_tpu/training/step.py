"""Jitted train/eval step builders.

One compiled function per training microbatch fuses: loss + grad, gradient
accumulation, the conditional optimizer update, the plateau LR transition and
the conditional EMA update (reference hot loop `runners/BaseRunner.py:398-423`)
— all gated with `lax.cond` so cadence logic never leaves the device
(SURVEY.md §7 decision 1).

Data parallelism: the runner calls these under a `jax.sharding.Mesh` with the
batch sharded over the 'data' axis and params/state replicated; the global
batch-mean loss makes XLA insert the gradient all-reduce over ICI automatically
(SURVEY.md §2.3) — no explicit collectives needed here.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from bbdm_tpu.training.ema import ema_update
from bbdm_tpu.training.plateau import plateau_step
from bbdm_tpu.training.state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    training_config,
    ema_config=None,
    lr_scheduler_config=None,
    bucketer=None,
) -> Callable:
    """Build ``train_step(state, x, y, rng) -> (state, metrics)``.

    model: BrownianBridgeModel or LatentBrownianBridgeModel — its ``loss``
    accepts (params, rng, x, y[, latent_stats]).

    bucketer: optional ``SmallLeafBucketer`` — gradients are bucketed right
    after the backward pass so the accumulator, the optimizer moments and
    the update scaling run over ONE fused vector for the hundreds of small
    leaves instead of a kernel launch each (training.fuse_small_leaves;
    tx/opt_state must then be built over the bucketed structure).
    """
    accumulate = int(training_config.get("accumulate_grad_batches", 1))
    use_ema = ema_config is not None and ema_config.get("use_ema", False)
    ema_decay = ema_config.get("ema_decay", 0.995) if use_ema else 0.0
    ema_interval = ema_config.get("update_ema_interval", 1) if use_ema else 1
    start_ema_step = ema_config.get("start_ema_step", 0) if use_ema else 0
    sched = lr_scheduler_config

    is_latent = hasattr(model, "encode")

    def loss_fn(params, rng, x, y, latent_stats):
        if is_latent:
            return model.loss(params, rng, x, y, latent_stats=latent_stats)
        return model.loss(params, rng, x, y)

    def train_step(state: TrainState, x, y, rng):
        step = state.step + 1  # reference increments before the loss (:399)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng, x, y, state.latent_stats
        )
        if bucketer is not None:
            grads = bucketer.bucket(grads)

        if accumulate > 1:
            # Masked accumulator reset instead of writing a zeros tree on every
            # update step: the first microbatch of a cycle multiplies the stale
            # accumulator by 0 inside the same add fusion (free), so the new
            # accumulator is always `grads_sum` and the cond below never has to
            # carry/zero the gradient tree (profile: the cond joins and the
            # zeros write were ~15% of train-step device time on v5e).
            first_micro = ((step - 1) % accumulate) == 0
            keep = jnp.where(first_micro, 0.0, 1.0)
            grads_sum = jax.tree_util.tree_map(
                lambda a, g: g + keep.astype(g.dtype) * a, state.grad_accum, grads
            )
        else:
            grads_sum = grads

        def do_update(operand):
            params, opt_state, plateau = operand
            opt_params = bucketer.bucket(params) if bucketer is not None else params
            updates, new_opt = tx.update(grads_sum, opt_state, opt_params)
            # the CURRENT update uses the pre-transition LR: the reference
            # calls scheduler.step(loss) after optimizer.step()
            # (`runners/BaseRunner.py:413-417`), so a plateau-triggered drop
            # only takes effect from the next update
            lr = plateau.lr
            if sched is not None:
                plateau = plateau_step(
                    plateau, loss,
                    factor=sched.factor, patience=sched.patience,
                    threshold=sched.threshold, cooldown=sched.cooldown,
                    min_lr=sched.min_lr,
                )
            updates = jax.tree_util.tree_map(
                lambda u: (-lr * u.astype(jnp.float32)).astype(u.dtype), updates
            )
            if bucketer is not None:  # back to per-leaf for the apply
                updates = bucketer.unbucket(updates)
            params = optax.apply_updates(params, updates)
            return params, new_opt, plateau

        def no_update(operand):
            return operand

        if accumulate == 1:
            # statically always an update step — no cond, no branch copies
            params, opt_state, plateau = do_update(
                (state.params, state.opt_state, state.plateau)
            )
        else:
            apply_now = (step % accumulate) == 0
            params, opt_state, plateau = jax.lax.cond(
                apply_now, do_update, no_update,
                (state.params, state.opt_state, state.plateau),
            )
        grad_accum = grads_sum if accumulate > 1 else None

        ema_params = state.ema_params
        if use_ema:
            ema_now = (step % (ema_interval * accumulate)) == 0
            with_decay = step >= start_ema_step

            def do_ema(e):
                return ema_update(e, params, ema_decay, with_decay)

            ema_params = jax.lax.cond(ema_now, do_ema, lambda e: e, ema_params)

        new_state = state.replace(
            step=step,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            plateau=plateau,
            grad_accum=grad_accum if accumulate > 1 else None,
        )
        metrics = {"loss": loss, "lr": plateau.lr}
        return new_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Build ``eval_step(state, x, y, rng) -> loss`` using the EMA weights
    (reference validation applies the EMA shadow, `BaseRunner.py:195-212`)."""
    is_latent = hasattr(model, "encode")

    def eval_step(state: TrainState, x, y, rng):
        params = state.ema_params if state.ema_params is not None else state.params
        if is_latent:
            loss, _ = model.loss(params, rng, x, y, latent_stats=state.latent_stats)
        else:
            loss, _ = model.loss(params, rng, x, y)
        return loss

    return eval_step
