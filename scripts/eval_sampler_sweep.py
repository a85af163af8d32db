"""Sampler-quality sweep: euler vs heun at several step budgets, on a trained
LBBDM checkpoint, through the full ``sample_to_eval`` path (reference contract
`runners/DiffusionBasedModelRunners/BBDMRunner.py:224-253`), scoring PSNR/SSIM
vs ground truth per variant.

One process = one TPU client (CLAUDE.md: stale-claim economics). Default
checkpoints are the round-3 chain-demo artifacts (scripts/train_chain_demo.py).

    python scripts/eval_sampler_sweep.py \
        [--variants euler:200,euler:20,heun:20,heun:50] \
        [--result results/run_r3_sweep]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_args(result_path):
    return argparse.Namespace(
        train=False, sample_to_eval=True, sample_at_start=False, save_top=False,
        resume_model=None, resume_optim=None, max_epoch=None, max_steps=None,
        gpu_ids="0", port="12355", config="", seed=1234,
        result_path=str(result_path),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lbbdm-config", default="configs/runs/LBBDM-f4-syn256.yaml")
    ap.add_argument("--vq-ckpt",
                    default="results/run_r3_chain/syn256/VQGAN-f4/checkpoint/last_model.ckpt")
    ap.add_argument("--bridge-ckpt",
                    default="results/run_r3_chain/syn256/LBBDM-f4-chain/checkpoint/last_model.ckpt")
    ap.add_argument("--result", default="results/run_r3_sweep")
    ap.add_argument("--variants", default="euler:200,euler:20,heun:20,heun:50")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if not args.cpu:
        from bbdm_tpu.utils.backend import wait_for_backend

        wait = float(os.environ.get("BBDM_BACKEND_WAIT", "1800"))
        if wait > 0:
            wait_for_backend(wait, interval_sec=120.0)

    from bbdm_tpu.config import load_config
    from bbdm_tpu.evaluation import calc_psnr_ssim
    from bbdm_tpu.registry import get_runner

    rows = []
    for variant in args.variants.split(","):
        sampler, steps = variant.strip().split(":")
        steps = int(steps)
        # resumable: one JSON report per variant (same convention as the
        # chain/stochastic demo scripts) — an interrupted sweep re-run with
        # the same --result picks up where it left off
        rp = os.path.join(args.result, f"report_{sampler}{steps}.json")
        if os.path.exists(rp):
            with open(rp) as f:
                rows.append(json.load(f))
            print(f"[sweep] {sampler}:{steps} report exists, skipping",
                  flush=True)
            continue
        cfg = load_config(args.lbbdm_config)
        cfg.model.VQGAN.params.ckpt_path = args.vq_ckpt
        cfg.model.model_load_path = args.bridge_ckpt
        cfg.model.model_name = f"sweep-{sampler}{steps}"
        cfg.model.BB.params.sampler = sampler
        cfg.model.BB.params.sample_step = steps
        cfg.testing.sample_num = 1
        cfg.args = make_args(args.result)
        runner = get_runner(cfg.runner, cfg)
        t0 = time.perf_counter()
        runner.test()
        wall = time.perf_counter() - t0
        root = runner.config.result.sample_to_eval_path
        res = calc_psnr_ssim(os.path.join(root, str(steps)),
                             os.path.join(root, "ground_truth"))
        nfe = 2 * (steps - 1) + 1 if sampler == "heun" else steps
        row = {"sampler": sampler, "steps": steps, "nfe": nfe,
               "wall_sec_incl_compile": round(wall, 1), **res}
        os.makedirs(args.result, exist_ok=True)
        with open(rp, "w") as f:
            json.dump(row, f, indent=1, default=float)
        rows.append(row)
        print("[sweep] " + json.dumps(row, default=float), flush=True)

    print("[sweep] table:")
    for r in rows:
        print(f"  {r['sampler']:5s} steps={r['steps']:4d} NFE={r['nfe']:4d} "
              f"PSNR={r['psnr']:.2f} SSIM={r['ssim']:.3f} "
              f"wall={r['wall_sec_incl_compile']}s", flush=True)


if __name__ == "__main__":
    main()
