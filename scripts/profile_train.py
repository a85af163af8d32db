"""Profile one full jitted train step on the TPU chip and print the op-category
self-time breakdown (the train-side sibling of profile_sampler.py).

The step matches scripts/bench_train.py: frozen-VQGAN encodes of image and
condition at 256^2, bridge loss on the latent, backward, Adam + plateau LR +
EMA — reference hot loop `runners/BaseRunner.py:398-423`.

    python scripts/profile_train.py
    BENCH_BATCH=16 python scripts/profile_train.py
    BBDM_PROF_TOP=40 python scripts/profile_train.py   # per-op drill-down
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp

from profile_sampler import categorize, self_times  # noqa: E402


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
    model = build_model(config.model)
    params = model.init_params(jax.random.PRNGKey(0))

    tx = build_optimizer(config.model.BB.optimizer, model.trainable_mask(params))
    accumulate = config.training.get("accumulate_grad_batches", 1)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        ema_params=ema_init(params), opt_state=tx.init(params),
        plateau=plateau_init(config.model.BB.optimizer.lr),
        grad_accum=zeros_like_tree(params) if accumulate > 1 else None,
        latent_stats=None,
    )
    ema_cfg = config.model.EMA if "EMA" in config.model else None
    train_step = jax.jit(
        make_train_step(model, tx, config.training, ema_config=ema_cfg,
                        lr_scheduler_config=config.model.BB.lr_scheduler),
        donate_argnums=(0,),
    )

    size = config.data.dataset_config.image_size
    ch = config.data.dataset_config.get("channels", 3)
    x = jnp.zeros((batch, size, size, ch), jnp.float32)
    y = jnp.zeros((batch, size, size, ch), jnp.float32)

    t0 = time.time()
    state, metrics = train_step(state, x, y, jax.random.PRNGKey(1))
    float(metrics["loss"])
    print(f"warmup/compile: {time.time() - t0:.1f}s", file=sys.stderr)

    trace_dir = os.environ.get("BBDM_PROF_DIR", "/tmp/bbdm_prof_train")
    with jax.profiler.trace(trace_dir):
        # several steps so per-step noise averages out (the step is ~80 ms)
        for i in range(4):
            state, metrics = train_step(state, x, y,
                                        jax.random.fold_in(jax.random.PRNGKey(2), i))
        float(metrics["loss"])

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

    latest = max(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")),
                 key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(latest, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    self_ps, counts, ev_names = self_times(plane)

    bycat = collections.Counter()
    ccat = collections.Counter()
    for mid, ps in self_ps.items():
        cat = categorize(ev_names.get(mid, "?"))
        bycat[cat] += ps
        ccat[cat] += counts[mid]
    total = sum(bycat.values())
    print(f"device self-time total (4 steps): {total / 1e9:.1f} ms   ({latest})")
    for cat, ps in bycat.most_common(16):
        print(f"  {ps / 1e9:9.1f} ms ({100 * ps / total:4.1f}%) x{ccat[cat]:7d}  {cat}")

    top_n = int(os.environ.get("BBDM_PROF_TOP", "0"))
    if top_n:
        print(f"\ntop {top_n} individual ops by self-time:")
        for mid, ps in sorted(self_ps.items(), key=lambda kv: -kv[1])[:top_n]:
            name = ev_names.get(mid, "?")
            print(f"  {ps / 1e9:9.1f} ms x{counts[mid]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
