"""Measure host-RSS growth per device dispatch through the axon tunnel.

Round-5 incident: a 256^2 VQGAN training run (750 steps/epoch) was OOM-killed
at ~130 GB host RSS after ~8k steps (~15 MB/step) — far beyond every bounded
cache in the framework (RAM cache is capped, ckpt futures are drained). This
probe isolates where per-step host memory goes:

  --mode exec      upload ONE batch, run the jitted fn in a loop (no per-step
                   transfer): isolates executable/result handling
  --mode transfer  fresh jnp.asarray(host_batch) every step + exec: adds the
                   host->device transfer path (the training loop's shape)

Prints RSS every 25 steps; slope ~= leaked bytes/step.

    python scripts/probe_host_leak.py --mode transfer --steps 300 --mb 6
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("exec", "transfer"), default="transfer")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--mb", type=float, default=6.0,
                    help="host batch size in MB (256^2x3 fp32 batch 8 = 6.3)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bbdm_tpu.utils.backend import wait_for_backend

        wait_for_backend(3600, interval_sec=60.0)

    n = int(args.mb * 2**20 / 4)
    host = np.random.RandomState(0).rand(n).astype(np.float32)
    f = jax.jit(lambda a: a.mean())

    x_dev = jnp.asarray(host)
    float(f(x_dev))  # compile + claim
    gc.collect()
    r0 = rss_mb()
    print(f"[probe] mode={args.mode} mb/step={args.mb} start_rss={r0:.0f}MB",
          flush=True)
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        if args.mode == "transfer":
            x = jnp.asarray(host)
        else:
            x = x_dev
        float(f(x))
        if i % 25 == 0:
            gc.collect()
            r = rss_mb()
            dt = (time.perf_counter() - t0) / i
            print(f"[probe] step {i:5d} rss={r:.0f}MB "
                  f"(+{(r - r0) / i:.2f}MB/step, {dt * 1e3:.1f}ms/step)",
                  flush=True)
    r = rss_mb()
    print(f"[probe] END {args.mode}: {(r - r0) / args.steps:.3f} MB/step "
          f"leaked over {args.steps} steps (rss {r0:.0f} -> {r:.0f}MB)",
          flush=True)


if __name__ == "__main__":
    main()
