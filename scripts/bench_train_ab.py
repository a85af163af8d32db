"""Single-client training-throughput A/B sweep (round 3, VERDICT #5).

Measures the full jitted LBBDM train step for several configurations in ONE
process/TPU client (a fresh client can stall ~40-75 min on stale claims —
CLAUDE.md), covering:

  * fuse_small_leaves off vs on (training/bucket.py) at the round-2 best
    operating point (batch 16, accumulate 1) and the template point (8x4)
  * batch 32 x accumulate 1 (VERDICT r2 #5 asked for this datapoint)

    python scripts/bench_train_ab.py            # all points
    BENCH_POINTS=16:1:0,16:1:1 python scripts/bench_train_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(config, model, batch, accumulate, fuse, runs=10):
    from bbdm_tpu.training import TrainState, make_train_step
    from bbdm_tpu.training.ema import ema_init
    from bbdm_tpu.training.optim import build_optimizer
    from bbdm_tpu.training.plateau import plateau_init
    from bbdm_tpu.training.state import zeros_like_tree

    params = model.init_params(jax.random.PRNGKey(0))
    mask = model.trainable_mask(params)
    bucketer = None
    if fuse:
        from bbdm_tpu.training.bucket import SmallLeafBucketer

        bucketer = SmallLeafBucketer(params, mask)
        tx = build_optimizer(config.model.BB.optimizer, bucketer.bucket_mask(mask))
    else:
        tx = build_optimizer(config.model.BB.optimizer, mask)
    config.training.accumulate_grad_batches = accumulate
    opt_params = bucketer.bucket(params) if bucketer else params
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        ema_params=ema_init(params), opt_state=tx.init(opt_params),
        plateau=plateau_init(config.model.BB.optimizer.lr),
        grad_accum=zeros_like_tree(opt_params) if accumulate > 1 else None,
        latent_stats=None,
    )
    ema_cfg = config.model.EMA if "EMA" in config.model else None
    train_step = jax.jit(
        make_train_step(model, tx, config.training, ema_config=ema_cfg,
                        lr_scheduler_config=config.model.BB.lr_scheduler,
                        bucketer=bucketer),
        donate_argnums=(0,),
    )
    size = config.data.dataset_config.image_size
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    y = jnp.zeros((batch, size, size, 3), jnp.float32)

    # warm up one full accumulation cycle + 2: the first dispatches of a
    # fresh client through the axon tunnel can run ~30% slow (measured: a
    # first-point 76.6 img/s vs 100.3 steady-state for the same config)
    for i in range(max(3, accumulate + 2)):
        state, metrics = train_step(state, x, y,
                                    jax.random.fold_in(jax.random.PRNGKey(1), i))
    float(metrics["loss"])  # compile + sync
    # time whole accumulation cycles: any window of k*accumulate steps holds
    # exactly k optimizer updates, so the per-step average is steady-state
    # (10 steps at accumulate=4 would capture 2 updates instead of 2.5)
    runs = -(-runs // accumulate) * accumulate
    t0 = time.perf_counter()
    for i in range(runs):
        state, metrics = train_step(state, x, y,
                                    jax.random.fold_in(jax.random.PRNGKey(2), i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / runs
    del state, train_step
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bbdm_tpu.config import load_config
    from bbdm_tpu.models import build_model

    config = load_config(os.environ.get("BENCH_CONFIG",
                                        "configs/Template-LBBDM-f4.yaml"))
    model = build_model(config.model)

    points = os.environ.get(
        "BENCH_POINTS", "16:1:0,16:1:1,8:4:0,8:4:1,32:1:0,32:1:1")
    for spec in points.split(","):
        batch, accumulate, fuse = (int(v) for v in spec.split(":"))
        try:
            dt = measure(config, model, batch, accumulate, bool(fuse))
        except Exception as e:  # e.g. HBM OOM at large batch — keep sweeping
            print(json.dumps({
                "metric": "LBBDM-f4 256x256 train step",
                "batch": batch, "accumulate": accumulate, "fuse": bool(fuse),
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
            continue
        print(json.dumps({
            "metric": "LBBDM-f4 256x256 train step",
            "batch": batch, "accumulate": accumulate, "fuse": bool(fuse),
            "images_per_sec": round(batch / dt, 3),
            "step_ms": round(dt * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
