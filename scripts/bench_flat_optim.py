"""EXPERIMENT (measured NEGATIVE — kept as the record): flat-parameter
train step. 81.1 images/sec vs the per-leaf tree step's 97.8 on v5e — the
flat-cotangent dynamic-update-slice chain costs more than the per-leaf
accumulate adds it replaces. See BENCH_NOTES.md round 2.

Hypothesis (BENCH_NOTES round 2): the non-conv train-step cost is per-leaf
kernel launches — ~287 grad-accumulate adds every microbatch (~11.6 ms) and
~26 ms of Adam/EMA chains per update step. Packing every parameter into ONE
flat f32 vector turns accumulate/Adam/EMA into a handful of large
bandwidth-bound kernels; the model consumes lazy slices of the flat buffer
(fused into their consumers by XLA), and the gradient materializes into the
flat cotangent via per-leaf dynamic-update-slices (same count as today's
adds, so the delta isolates the optimizer side).

Semantics match training/step.py with accumulate=2 + EMA; the frozen VQGAN
needs no mask (its grads are exact zeros via stop_gradient, so flat Adam
leaves it untouched).

    python scripts/bench_flat_optim.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    accumulate = int(os.environ.get("BENCH_ACCUM", "2"))
    config_path = os.environ.get("BENCH_CONFIG", "configs/Template-LBBDM-f4.yaml")

    from bbdm_tpu.config import load_config
    from bbdm_tpu.models import build_model

    config = load_config(config_path)
    model = build_model(config.model)
    params = model.init_params(jax.random.PRNGKey(0))

    flat0, unravel = ravel_pytree(params)
    print(f"flat params: {flat0.size/1e6:.1f}M ({flat0.size*4/1e9:.2f} GB f32)",
          file=sys.stderr)

    opt = config.model.BB.optimizer
    lr, beta1, beta2, eps = opt.lr, opt.beta1, 0.999, 1e-8
    ema_decay = config.model.EMA.ema_decay
    ema_interval = config.model.EMA.update_ema_interval

    def loss_fn(flat, rng, x, y):
        loss, _ = model.loss(unravel(flat), rng, x, y)
        return loss

    # No trainable mask needed: the frozen VQGAN's gradients are exact zeros
    # (stop_gradient in the loss), so its Adam moments and updates stay zero.
    def train_step(state, x, y, rng):
        step, flat, m, v, accum, ema = state
        step = step + 1
        loss, g = jax.value_and_grad(loss_fn)(flat, rng, x, y)
        first_micro = ((step - 1) % accumulate) == 0
        keep = jnp.where(first_micro, 0.0, 1.0)
        accum = g + keep * accum

        apply_now = (step % accumulate) == 0

        def do_update(operand):
            flat, m, v = operand
            t = step // accumulate
            m2 = beta1 * m + (1 - beta1) * accum
            v2 = beta2 * v + (1 - beta2) * accum * accum
            mhat = m2 / (1 - beta1 ** t.astype(jnp.float32))
            vhat = v2 / (1 - beta2 ** t.astype(jnp.float32))
            flat2 = flat - lr * mhat / (jnp.sqrt(vhat) + eps)
            return flat2, m2, v2

        flat, m, v = jax.lax.cond(apply_now, do_update, lambda o: o, (flat, m, v))

        ema_now = (step % (ema_interval * accumulate)) == 0
        ema = jax.lax.cond(
            ema_now, lambda e: ema_decay * e + (1 - ema_decay) * flat,
            lambda e: e, ema)
        return (step, flat, m, v, accum, ema), loss

    # donation requires distinct buffers per state leaf (donating an aliased
    # buffer twice is an InvalidArgument)
    m0, v0, a0 = (jnp.zeros_like(flat0) for _ in range(3))
    state = (jnp.asarray(0, jnp.int32), flat0, m0, v0, a0, jnp.copy(flat0))
    step_jit = jax.jit(train_step, donate_argnums=(0,))

    size = config.data.dataset_config.image_size
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    y = jnp.zeros((batch, size, size, 3), jnp.float32)

    t0 = time.time()
    state, loss = step_jit(state, x, y, jax.random.PRNGKey(1))
    float(loss)
    print(f"compile: {time.time()-t0:.1f}s", file=sys.stderr)

    runs = 10
    t0 = time.perf_counter()
    for i in range(runs):
        state, loss = step_jit(state, x, y,
                               jax.random.fold_in(jax.random.PRNGKey(2), i))
    float(loss)
    dt = (time.perf_counter() - t0) / runs
    print(json.dumps({
        "metric": "flat-optim train step (experiment)",
        "value": round(batch / dt, 3), "unit": "images/sec/chip",
        "detail": {"step_ms": round(dt * 1e3, 2), "batch": batch,
                   "accumulate": accumulate},
    }))


if __name__ == "__main__":
    main()
