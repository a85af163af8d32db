"""Training-step throughput on one chip (secondary benchmark; the driver's
north-star sampling bench is `bench.py`).

Measures the full jitted LBBDM train step — frozen-VQGAN encode of image and
condition at 256^2, bridge loss on the 64^2 latent, grad, Adam + plateau LR +
EMA — in images/sec/chip.

    BENCH_BATCH=8 python scripts/bench_train.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    config_path = os.environ.get("BENCH_CONFIG", "configs/Template-LBBDM-f4.yaml")

    from bbdm_tpu.config import load_config
    from bbdm_tpu.models import build_model
    from bbdm_tpu.training import TrainState, make_train_step
    from bbdm_tpu.training.ema import ema_init
    from bbdm_tpu.training.optim import build_optimizer
    from bbdm_tpu.training.plateau import plateau_init
    from bbdm_tpu.training.state import zeros_like_tree

    config = load_config(config_path)
    # BENCH_ACCUM overrides accumulate_grad_batches (accumulation-cost A/B)
    if "BENCH_ACCUM" in os.environ:
        config.training.accumulate_grad_batches = int(os.environ["BENCH_ACCUM"])
    model = build_model(config.model)
    params = model.init_params(jax.random.PRNGKey(0))

    mask = model.trainable_mask(params)
    # BENCH_FUSE=1: small-leaf optimizer bucketing A/B (training/bucket.py)
    bucketer = None
    if os.environ.get("BENCH_FUSE") == "1":
        from bbdm_tpu.training.bucket import SmallLeafBucketer

        bucketer = SmallLeafBucketer(params, mask)
        tx = build_optimizer(config.model.BB.optimizer, bucketer.bucket_mask(mask))
    else:
        tx = build_optimizer(config.model.BB.optimizer, mask)
    accumulate = config.training.get("accumulate_grad_batches", 1)
    init_lr = config.model.BB.optimizer.lr
    opt_params = bucketer.bucket(params) if bucketer else params
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        ema_params=ema_init(params), opt_state=tx.init(opt_params),
        plateau=plateau_init(init_lr),
        grad_accum=zeros_like_tree(opt_params) if accumulate > 1 else None,
        latent_stats=None,  # identity stats (runner default)
    )
    ema_cfg = config.model.EMA if "EMA" in config.model else None
    train_step = jax.jit(
        make_train_step(model, tx, config.training, ema_config=ema_cfg,
                        lr_scheduler_config=config.model.BB.lr_scheduler,
                        bucketer=bucketer),
        donate_argnums=(0,),
    )

    size = config.data.dataset_config.image_size
    ch = config.data.dataset_config.get("channels", 3)
    x = jnp.zeros((batch, size, size, ch), jnp.float32)
    y = jnp.zeros((batch, size, size, ch), jnp.float32)

    # warmup/compile; float() of the loss scalar is the reliable sync on axon
    state, metrics = train_step(state, x, y, jax.random.PRNGKey(1))
    float(metrics["loss"])

    runs = 10
    t0 = time.perf_counter()
    for i in range(runs):
        state, metrics = train_step(state, x, y,
                                    jax.random.fold_in(jax.random.PRNGKey(2), i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / runs

    # A100-reference estimate, same method as bench.py's sampling denominator
    # (BASELINE.md: the repo publishes no train throughput): fwd+bwd UNet +
    # frozen-VQGAN encodes at 35% of A100 TF32 peak. The CPU-measured anchor
    # (scripts/bench_reference_torch.py flagship_train_step) shows the torch
    # train step is per-FLOP efficient like its forward, so the 35%
    # assumption carries over.
    from bbdm_tpu.utils.flops import training_flops_per_image

    flops_per_image = training_flops_per_image(config.model)
    imgs_per_sec = batch / dt
    ref_est = 0.35 * 156e12 / flops_per_image

    print(json.dumps({
        "metric": f"{config.model.model_name} {size}x{size} train step",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / ref_est, 3),
        "detail": {"device_kind": jax.devices()[0].device_kind,
                   "step_ms": round(dt * 1e3, 2), "batch": batch,
                   "flops_per_image": flops_per_image,
                   "achieved_tflops": round(imgs_per_sec * flops_per_image / 1e12, 1),
                   "ref_est_images_per_sec_a100_tf32": round(ref_est, 3)},
    }))


if __name__ == "__main__":
    main()
