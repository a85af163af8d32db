"""Round-4 pixel-space BBDM quality demonstration, ONE process / ONE TPU
client (CLAUDE.md stale-claim economics):

  phase T: train pixel BBDM (configs/runs/BBDM-synpix64.yaml) to plateau —
           the configuration that needs NO pretrained first stage
           (reference `configs/Template-BBDM.yaml`,
           `model/BrownianBridge/BrownianBridgeModel.py:203-221`);
  phase E: canonical 200-step euler `sample_to_eval` over the test split
           with the EMA weights, then PSNR/SSIM vs ground truth and vs the
           copy-the-input floor;
  phase S: euler-vs-heun NFE sweep on the SAME trained checkpoint
           (VERDICT r3 item 3) — quality + per-variant wall time.

Phases are resumable: each writes a JSON report next to --result and is
skipped when that report already exists (so a crashed/interrupted run
continues instead of restarting).

    python scripts/train_pixel_demo.py [--result results/run_r4_pixel]
        [--config configs/runs/BBDM-synpix64.yaml] [--epochs N] [--cpu]
        [--variants euler:100,euler:50,euler:20,heun:25,heun:10]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_args(result_path, seed=1234, **kw):
    d = dict(train=True, sample_to_eval=False, sample_at_start=False,
             save_top=False, seed=seed, result_path=str(result_path),
             resume_model=None, resume_optim=None, max_epoch=None,
             max_steps=None, gpu_ids="0", port="12355", config="")
    d.update(kw)
    return argparse.Namespace(**d)


def report_path(result_dir, phase):
    return os.path.join(result_dir, f"report_{phase}.json")


def write_report(result_dir, phase, payload):
    os.makedirs(result_dir, exist_ok=True)
    with open(report_path(result_dir, phase), "w") as f:
        json.dump(payload, f, indent=1, default=float)
    print(f"[pixel:{phase}] " + json.dumps(payload, default=float), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result", default="results/run_r4_pixel")
    ap.add_argument("--config", default="configs/runs/BBDM-synpix64.yaml")
    ap.add_argument("--epochs", type=int, default=None,
                    help="cap training n_epochs (time-box)")
    ap.add_argument("--variants",
                    default="euler:100,euler:50,euler:20,heun:25,heun:10",
                    help="phase-S sampler:steps list (euler:200 is phase E)")
    ap.add_argument("--deadline-ts", type=float, default=None,
                    help="unix timestamp: phases not yet STARTED by this "
                         "time are skipped and the client exits cleanly "
                         "(reports make the next invocation resume there)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    def past_deadline(phase):
        if args.deadline_ts is not None and time.time() > args.deadline_ts:
            print(f"[pixel] deadline passed, skipping phase {phase} "
                  "(resumable: re-run the same command later)", flush=True)
            return True
        return False

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if not args.cpu:
        from bbdm_tpu.utils.backend import wait_for_backend

        wait = float(os.environ.get("BBDM_BACKEND_WAIT", "5400"))
        if wait > 0:
            wait_for_backend(wait, interval_sec=120.0)

    from bbdm_tpu.config import apply_cli_overrides, load_config
    from bbdm_tpu.evaluation import calc_psnr_ssim
    from bbdm_tpu.registry import get_runner

    cfg0 = load_config(args.config)
    model_name = cfg0.model.model_name
    dataset_name = cfg0.data.dataset_name
    ckpt_dir = os.path.join(args.result, dataset_name, model_name, "checkpoint")
    bridge_ckpt = os.path.join(ckpt_dir, "last_model.ckpt")
    optim_ckpt = os.path.join(ckpt_dir, "last_optim_sche.ckpt")

    # ---------------- phase T: train to plateau --------------------------
    if os.path.exists(report_path(args.result, "train")):
        print("[pixel:train] report exists, skipping", flush=True)
    elif past_deadline("train"):
        return
    else:
        cfg = load_config(args.config)
        resume = os.path.exists(bridge_ckpt) and os.path.exists(optim_ckpt)
        apply_cli_overrides(cfg, make_args(
            args.result, max_epoch=args.epochs,
            resume_model=bridge_ckpt if resume else None,
            resume_optim=optim_ckpt if resume else None))
        if resume:
            print(f"[pixel:train] resuming from {bridge_ckpt}", flush=True)
        t0 = time.perf_counter()
        runner = get_runner(cfg.runner, cfg)
        runner.train()
        wall = time.perf_counter() - t0
        del runner
        gc.collect()
        write_report(args.result, "train", {
            "config": args.config, "ckpt": bridge_ckpt,
            "wall_sec": round(wall, 1), "epochs_cap": args.epochs,
        })

    # ------------- phases E + S: sample_to_eval variants ------------------
    def run_variant(sampler, steps, phase):
        if os.path.exists(report_path(args.result, phase)):
            print(f"[pixel:{phase}] report exists, skipping", flush=True)
            with open(report_path(args.result, phase)) as f:
                return json.load(f)
        if past_deadline(phase):
            return None
        cfg = load_config(args.config)
        cfg.model.model_load_path = bridge_ckpt
        cfg.model.model_name = f"{model_name}-{sampler}{steps}"
        cfg.model.BB.params.sampler = sampler
        cfg.model.BB.params.sample_step = steps
        cfg.testing.sample_num = 1
        apply_cli_overrides(cfg, make_args(args.result, train=False,
                                           sample_to_eval=True))
        runner = get_runner(cfg.runner, cfg)
        t0 = time.perf_counter()
        runner.test()
        wall = time.perf_counter() - t0
        root = runner.config.result.sample_to_eval_path
        del runner
        gc.collect()
        res = calc_psnr_ssim(os.path.join(root, str(steps)),
                             os.path.join(root, "ground_truth"))
        floor = calc_psnr_ssim(os.path.join(root, "condition"),
                               os.path.join(root, "ground_truth"))
        nfe = 2 * (steps - 1) + 1 if sampler == "heun" else steps
        payload = {
            "sampler": sampler, "steps": steps, "nfe": nfe,
            "wall_sec_incl_compile": round(wall, 1),
            "sample_vs_gt": res, "condition_vs_gt_floor": floor,
            "eval_root": root,
        }
        write_report(args.result, phase, payload)
        return payload

    rows = [run_variant("euler", 200, "eval_euler200")]
    for variant in args.variants.split(","):
        sampler, steps = variant.strip().split(":")
        rows.append(run_variant(sampler, int(steps), f"sweep_{sampler}{steps}"))

    print("[pixel] final table (PSNR/SSIM vs gt; floor = condition vs gt):")
    for r in filter(None, rows):
        print(f"  {r['sampler']:5s} steps={r['steps']:4d} NFE={r['nfe']:4d} "
              f"PSNR={r['sample_vs_gt']['psnr']:.2f} "
              f"SSIM={r['sample_vs_gt']['ssim']:.3f} "
              f"floorPSNR={r['condition_vs_gt_floor']['psnr']:.2f} "
              f"floorSSIM={r['condition_vs_gt_floor']['ssim']:.3f} "
              f"wall={r['wall_sec_incl_compile']}s", flush=True)


if __name__ == "__main__":
    main()
