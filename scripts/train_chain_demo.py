"""Full-stack on-TPU demonstration chain, ONE process / ONE TPU client:

  phase A: train the VQGAN-f4 first stage in-framework (VQGANRunner — a
           capability the reference only stubs) on the syn256 set;
  phase B: train flagship LBBDM-f4 with that checkpoint as the FROZEN first
           stage (the real production topology, reference
           `model/VQGAN/vqgan.py:63-72`), latent-stat pass included;
  phase C: sample_to_eval sweep over the test split with the EMA weights,
           then weights-free PSNR/SSIM + diversity over the produced
           directory contract.

One process because every fresh TPU client can stall ~40-75 min at its
first device op while stale server-side claims expire (CLAUDE.md).

    python scripts/train_chain_demo.py [--result results/run_r3_chain]
        [--vqgan-config configs/runs/VQGAN-f4-syn256.yaml]
        [--lbbdm-config configs/runs/LBBDM-f4-syn256.yaml]
        [--skip-vqgan CKPT]   # reuse an existing first-stage ckpt
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_args(result_path, seed=1234, **kw):
    d = dict(train=True, sample_to_eval=False, sample_at_start=False,
             save_top=False, seed=seed, result_path=str(result_path),
             resume_model=None, resume_optim=None, max_epoch=None,
             max_steps=None, gpu_ids="0", port="12355", config="")
    d.update(kw)
    return argparse.Namespace(**d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result", default="results/run_r3_chain")
    ap.add_argument("--vqgan-config", default="configs/runs/VQGAN-f4-syn256.yaml")
    ap.add_argument("--lbbdm-config", default="configs/runs/LBBDM-f4-syn256.yaml")
    ap.add_argument("--skip-vqgan", default=None,
                    help="existing first-stage ckpt; skips phase A")
    ap.add_argument("--epochs-a", type=int, default=None,
                    help="cap phase-A n_epochs (time-box long configs)")
    ap.add_argument("--epochs-b", type=int, default=None,
                    help="cap phase-B n_epochs (time-box long configs)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if not args.cpu:
        from bbdm_tpu.utils.backend import wait_for_backend

        wait = float(os.environ.get("BBDM_BACKEND_WAIT", "1800"))
        if wait > 0:
            wait_for_backend(wait, interval_sec=120.0)

    from bbdm_tpu.config import apply_cli_overrides, load_config
    from bbdm_tpu.registry import get_runner

    # ---------------- phase A: first-stage VQGAN training ----------------
    if args.skip_vqgan:
        vq_ckpt = args.skip_vqgan
        print(f"[chain] phase A skipped, using {vq_ckpt}", flush=True)
    else:
        print("[chain] phase A: VQGAN-f4 first-stage training", flush=True)
        cfg_a = load_config(args.vqgan_config)
        apply_cli_overrides(cfg_a, make_args(args.result, max_epoch=args.epochs_a))
        runner_a = get_runner(cfg_a.runner, cfg_a)
        runner_a.train()
        vq_ckpt = os.path.join(runner_a.config.result.ckpt_path, "last_model.ckpt")
        del runner_a
        gc.collect()
        print(f"[chain] phase A done -> {vq_ckpt}", flush=True)

    # ---------------- phase B: LBBDM with the trained first stage --------
    print("[chain] phase B: LBBDM-f4 bridge training on the trained "
          "first stage", flush=True)
    cfg_b = load_config(args.lbbdm_config)
    cfg_b.model.VQGAN.params.ckpt_path = vq_ckpt
    cfg_b.model.model_name = "LBBDM-f4-chain"
    apply_cli_overrides(cfg_b, make_args(args.result, max_epoch=args.epochs_b))
    runner_b = get_runner(cfg_b.runner, cfg_b)
    runner_b.train()
    bridge_ckpt = os.path.join(runner_b.config.result.ckpt_path, "last_model.ckpt")
    del runner_b
    gc.collect()
    print(f"[chain] phase B done -> {bridge_ckpt}", flush=True)

    # ---------------- phase C: sample_to_eval + weights-free metrics -----
    print("[chain] phase C: sample_to_eval sweep + PSNR/SSIM", flush=True)
    cfg_c = load_config(args.lbbdm_config)
    cfg_c.model.VQGAN.params.ckpt_path = vq_ckpt
    cfg_c.model.model_name = "LBBDM-f4-chain"
    cfg_c.model.model_load_path = bridge_ckpt
    cfg_c.testing.sample_num = 1
    apply_cli_overrides(cfg_c, make_args(args.result, train=False, sample_to_eval=True))
    runner_c = get_runner(cfg_c.runner, cfg_c)
    runner_c.test()
    eval_root = runner_c.config.result.sample_to_eval_path
    sample_dir = os.path.join(eval_root, str(cfg_c.model.BB.params.sample_step))
    gt_dir = os.path.join(eval_root, "ground_truth")
    cond_dir = os.path.join(eval_root, "condition")

    from bbdm_tpu.evaluation import calc_psnr_ssim

    res = calc_psnr_ssim(sample_dir, gt_dir)
    base = calc_psnr_ssim(cond_dir, gt_dir)  # condition-as-prediction floor
    report = {
        "sample_vs_gt": res,
        "condition_vs_gt_floor": base,
        "eval_root": eval_root,
        "vq_ckpt": vq_ckpt,
        "bridge_ckpt": bridge_ckpt,
    }
    print("[chain] report: " + json.dumps(report, default=float), flush=True)


if __name__ == "__main__":
    main()
