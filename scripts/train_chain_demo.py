"""Full-stack on-TPU demonstration chain, ONE process / ONE TPU client:

  phase A: train the VQGAN-f4 first stage in-framework (VQGANRunner — a
           capability the reference only stubs) on the paired synthetic set;
  phase B: train flagship LBBDM-f4 with that checkpoint as the FROZEN first
           stage (the real production topology, reference
           `model/VQGAN/vqgan.py:63-72`), latent-stat pass included;
  phase C: sample_to_eval sweep over the test split with the EMA weights,
           then weights-free PSNR/SSIM over the produced directory contract
           (vs ground truth AND vs the copy-the-input floor), plus the
           first stage's own roundtrip ceiling (eval_vqgan_recon logic);
  phase D: DELIVERED-throughput benchmark of the production sweep at the
           canonical `sample_num: 5` protocol (reference
           `configs/Template-LBBDM-f4.yaml:13`,
           `runners/DiffusionBasedModelRunners/BBDMRunner.py:224-253`):
           wall-clock images/sec INCLUDING decode + PNG I/O, to compare
           against the bare-sampler bench.py number.

One process because every fresh TPU client can stall ~40-75 min at its
first device op while stale server-side claims expire (CLAUDE.md).

Phases are resumable: each writes report_<phase>.json under --result and is
skipped when that report already exists (a crashed/interrupted run continues
instead of restarting), like scripts/train_pixel_demo.py.

    python scripts/train_chain_demo.py [--result results/run_r4_chain]
        [--vqgan-config configs/runs/VQGAN-f4-syn256-v2.yaml]
        [--lbbdm-config configs/runs/LBBDM-f4-syn256-v2.yaml]
        [--skip-vqgan CKPT]   # reuse an existing first-stage ckpt
        [--epochs-a N] [--epochs-b N]   # time-box long configs
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


def resume_paths(result_dir, dataset_name, model_name):
    """Mid-phase crash resilience: when a training phase died (its report is
    absent) but its runner already wrote last_model/last_optim_sche — the
    periodic save cadence or the emergency exception/SIGTERM save
    (runners/base.py) — resume from those instead of restarting the phase."""
    ck = os.path.join(result_dir, dataset_name, model_name, "checkpoint")
    model = os.path.join(ck, "last_model.ckpt")
    optim = os.path.join(ck, "last_optim_sche.ckpt")
    if os.path.exists(model) and os.path.exists(optim):
        print(f"[chain] resuming phase from {model}", flush=True)
        return {"resume_model": model, "resume_optim": optim}
    return {}


def write_report(result_dir, phase, payload):
    os.makedirs(result_dir, exist_ok=True)
    with open(report_path(result_dir, phase), "w") as f:
        json.dump(payload, f, indent=1, default=float)
    print(f"[chain:{phase}] " + json.dumps(payload, default=float), flush=True)


def read_report(result_dir, phase):
    with open(report_path(result_dir, phase)) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result", default="results/run_r4_chain")
    ap.add_argument("--vqgan-config", default="configs/runs/VQGAN-f4-syn256-v2.yaml")
    ap.add_argument("--lbbdm-config", default="configs/runs/LBBDM-f4-syn256-v2.yaml")
    ap.add_argument("--skip-vqgan", default=None,
                    help="existing first-stage ckpt; skips phase A")
    ap.add_argument("--epochs-a", type=int, default=None,
                    help="cap phase-A n_epochs (time-box long configs)")
    ap.add_argument("--epochs-b", type=int, default=None,
                    help="cap phase-B n_epochs (time-box long configs)")
    ap.add_argument("--wall-a", type=float, default=None,
                    help="wall-clock budget (sec) for phase-A training: the "
                         "runner stops gracefully at a step boundary, saves, "
                         "and the chain proceeds to phase B in-process "
                         "(training.max_wall_sec)")
    ap.add_argument("--wall-b", type=float, default=None,
                    help="wall-clock budget (sec) for phase-B training")
    ap.add_argument("--bench-sample-num", type=int, default=5,
                    help="phase-D sample_num (canonical protocol: 5)")
    ap.add_argument("--bench-images", type=int, default=32,
                    help="phase-D test images to sweep (timed)")
    ap.add_argument("--bench-sampler", default=None,
                    help="phase-D sampler override (euler/heun; default: "
                         "the config's) — e.g. the measured euler@50 "
                         "production recipe, BENCH_NOTES round 5")
    ap.add_argument("--bench-sample-step", type=int, default=None,
                    help="phase-D sample_step override (default: the "
                         "config's 200-step reference protocol)")
    ap.add_argument("--throughput-only", action="store_true",
                    help="skip phases A-C and run ONLY the phase-D delivered-"
                         "throughput benchmark (random-init weights unless "
                         "--skip-vqgan provides a first stage; wall time is "
                         "weight-independent)")
    ap.add_argument("--deadline-ts", type=float, default=None,
                    help="unix timestamp: phases not yet STARTED by this "
                         "time are skipped and the client exits cleanly "
                         "(reports make the next invocation resume there)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    def past_deadline(phase):
        if args.deadline_ts is not None and time.time() > args.deadline_ts:
            print(f"[chain] deadline passed, skipping phase {phase} "
                  "(resumable: re-run the same command later)", flush=True)
            return True
        return False

    def interrupted(runner, phase):
        """True when the phase's training was cut short by an EXTERNAL
        graceful stop (SIGTERM / STOP file): the phase is NOT done, so no
        report may be written — the next invocation must resume it from
        last_model.ckpt. A wall-budget stop (--wall-a/--wall-b) is an
        intentional time-box and counts as phase completion."""
        stop = getattr(runner, "stop_reason", None)
        if stop is None or stop.startswith("wall budget"):
            return False
        print(f"[chain] phase {phase} interrupted ({stop}); exiting without "
              "a report — re-run the same command to resume", flush=True)
        return True

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

    from bbdm_tpu.config import apply_cli_overrides, load_config
    from bbdm_tpu.registry import get_runner

    # ---------------- phase A: first-stage VQGAN training ----------------
    if args.throughput_only:
        # Delivered-throughput benchmark only (VERDICT r3 item 4): wall time
        # is weight-independent, so random-init VQGAN+bridge measure the
        # identical compute/IO path without a trained checkpoint.
        vq_ckpt = args.skip_vqgan
        print("[chain] --throughput-only: phases A-C skipped "
              f"(first stage: {vq_ckpt or 'random init'})", flush=True)
    elif args.skip_vqgan:
        vq_ckpt = args.skip_vqgan
        print(f"[chain] phase A skipped, using {vq_ckpt}", flush=True)
    elif os.path.exists(report_path(args.result, "vqgan")):
        vq_ckpt = read_report(args.result, "vqgan")["ckpt"]
        print(f"[chain] phase A report exists, using {vq_ckpt}", flush=True)
    else:
        print("[chain] phase A: VQGAN-f4 first-stage training", flush=True)
        cfg_a = load_config(args.vqgan_config)
        apply_cli_overrides(cfg_a, make_args(
            args.result, max_epoch=args.epochs_a,
            **resume_paths(args.result, cfg_a.data.dataset_name,
                           cfg_a.model.model_name)))
        if args.wall_a is not None:
            cfg_a.training.max_wall_sec = args.wall_a
        t0 = time.perf_counter()
        runner_a = get_runner(cfg_a.runner, cfg_a)
        runner_a.train()
        if interrupted(runner_a, "A"):
            return
        vq_ckpt = os.path.join(runner_a.config.result.ckpt_path, "last_model.ckpt")
        del runner_a
        gc.collect()
        write_report(args.result, "vqgan", {
            "config": args.vqgan_config, "ckpt": vq_ckpt,
            "wall_sec": round(time.perf_counter() - t0, 1),
            "epochs_cap": args.epochs_a,
        })

    def lbbdm_cfg():
        cfg = load_config(args.lbbdm_config)
        cfg.model.VQGAN.params.ckpt_path = vq_ckpt
        cfg.model.model_name = "LBBDM-f4-chain"
        return cfg

    bridge_ckpt = None

    # ---------------- phase B: LBBDM with the trained first stage --------
    if os.path.exists(report_path(args.result, "bridge")):
        bridge_ckpt = read_report(args.result, "bridge")["ckpt"]
        print(f"[chain] phase B report exists, using {bridge_ckpt}", flush=True)
    elif args.throughput_only:
        pass
    elif past_deadline("B"):
        return
    else:
        print("[chain] phase B: LBBDM-f4 bridge training on the trained "
              "first stage", flush=True)
        cfg_b = lbbdm_cfg()
        apply_cli_overrides(cfg_b, make_args(
            args.result, max_epoch=args.epochs_b,
            **resume_paths(args.result, cfg_b.data.dataset_name,
                           cfg_b.model.model_name)))
        if args.wall_b is not None:
            cfg_b.training.max_wall_sec = args.wall_b
        t0 = time.perf_counter()
        runner_b = get_runner(cfg_b.runner, cfg_b)
        runner_b.train()
        if interrupted(runner_b, "B"):
            return
        bridge_ckpt = os.path.join(runner_b.config.result.ckpt_path, "last_model.ckpt")
        del runner_b
        gc.collect()
        write_report(args.result, "bridge", {
            "config": args.lbbdm_config, "ckpt": bridge_ckpt,
            "vq_ckpt": vq_ckpt,
            "wall_sec": round(time.perf_counter() - t0, 1),
            "epochs_cap": args.epochs_b,
        })

    # ---------------- phase C: sample_to_eval + weights-free metrics -----
    if os.path.exists(report_path(args.result, "eval")):
        print("[chain] phase C report exists, skipping", flush=True)
    elif args.throughput_only:
        pass
    elif past_deadline("C"):
        return
    else:
        print("[chain] phase C: sample_to_eval sweep + PSNR/SSIM", flush=True)
        cfg_c = lbbdm_cfg()
        cfg_c.model.model_load_path = bridge_ckpt
        cfg_c.testing.sample_num = 1
        apply_cli_overrides(cfg_c, make_args(args.result, train=False,
                                             sample_to_eval=True))
        runner_c = get_runner(cfg_c.runner, cfg_c)
        runner_c.test()
        eval_root = runner_c.config.result.sample_to_eval_path
        sample_dir = os.path.join(eval_root, str(cfg_c.model.BB.params.sample_step))
        gt_dir = os.path.join(eval_root, "ground_truth")
        cond_dir = os.path.join(eval_root, "condition")

        # first-stage roundtrip ceiling over the SAME ground-truth images
        # (scripts/eval_vqgan_recon.py logic, one client)
        import numpy as np

        from bbdm_tpu.evaluation import calc_psnr_ssim
        from bbdm_tpu.utils.images import save_single_image

        recon_dir = os.path.join(eval_root, "vqgan_roundtrip")
        os.makedirs(recon_dir, exist_ok=True)
        model = runner_c.model
        gen = runner_c._ema_sample_params()
        import jax.numpy as jnp

        recon = jax.jit(lambda p, x: model.sample_vqgan(p, x))
        from bbdm_tpu.data import DataLoader, get_dataset

        _, _, test_ds = get_dataset(cfg_c.data)
        loader = DataLoader(test_ds, cfg_c.data.test.batch_size,
                            shuffle=False, drop_last=True,
                            shard_count=1, shard_index=0, seed=1234)
        for batch in loader:
            xrec = np.asarray(recon(gen, jnp.asarray(batch["x"])))
            for i, name in enumerate(batch["x_name"]):
                save_single_image(xrec[i], recon_dir, f"{name}.png",
                                  to_normal=cfg_c.data.dataset_config.to_normal)
        del runner_c
        gc.collect()

        res = calc_psnr_ssim(sample_dir, gt_dir)
        base = calc_psnr_ssim(cond_dir, gt_dir)  # condition-as-prediction floor
        ceil = calc_psnr_ssim(recon_dir, gt_dir)  # first-stage roundtrip ceiling
        write_report(args.result, "eval", {
            "sample_vs_gt": res,
            "condition_vs_gt_floor": base,
            "vqgan_roundtrip_ceiling": ceil,
            "eval_root": eval_root,
            "vq_ckpt": vq_ckpt,
            "bridge_ckpt": bridge_ckpt,
        })

    # ------- phase D: delivered sample_to_eval throughput (sample_num 5) --
    if os.path.exists(report_path(args.result, "throughput")):
        print("[chain] phase D report exists, skipping", flush=True)
    elif past_deadline("D"):
        return
    else:
        print(f"[chain] phase D: delivered sweep throughput at sample_num="
              f"{args.bench_sample_num}", flush=True)
        cfg_d = lbbdm_cfg()
        cfg_d.model.model_load_path = bridge_ckpt
        cfg_d.model.model_name = "LBBDM-f4-chain-tput"
        if bridge_ckpt is None:
            # random-init bench path: no latent stats exist anywhere; the
            # normalize is two scalar affines per stream (wall-time neutral)
            cfg_d.model.normalize_latent = False
        cfg_d.testing.sample_num = args.bench_sample_num
        if args.bench_sampler is not None:
            cfg_d.model.BB.params.sampler = args.bench_sampler
        if args.bench_sample_step is not None:
            cfg_d.model.BB.params.sample_step = args.bench_sample_step
        apply_cli_overrides(cfg_d, make_args(args.result, train=False,
                                             sample_to_eval=True))
        runner_d = get_runner(cfg_d.runner, cfg_d)
        _, val_loader, test_loader = runner_d._build_loaders(for_training=False)
        if len(test_loader) == 0:
            test_loader = val_loader
        batch_size = cfg_d.data.test.batch_size
        n_batches = max(args.bench_images // batch_size, 1)
        batches = []
        for b in test_loader:
            batches.append(b)
            if len(batches) >= n_batches:
                break

        out_root = runner_d.config.result.sample_to_eval_path

        def sweep():
            runner_d.sample_to_eval(iter(batches), out_root)

        # untimed warmup batch first: compile + cache priming, so the timed
        # window measures steady-state delivered throughput
        t0 = time.perf_counter()
        runner_d.sample_to_eval(iter(batches[:1]), out_root)
        compile_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        sweep()
        wall = time.perf_counter() - t0
        images = n_batches * batch_size
        samples = images * args.bench_sample_num
        write_report(args.result, "throughput", {
            "sample_num": args.bench_sample_num,
            "sampler": cfg_d.model.BB.params.sampler,
            "sample_step": int(cfg_d.model.BB.params.sample_step),
            "images": images,
            "samples": samples,
            "wall_sec": round(wall, 2),
            "first_batch_wall_sec_incl_compile": round(compile_wall, 2),
            "delivered_samples_per_sec": round(samples / wall, 3),
            "delivered_images_per_sec": round(images / wall, 3),
            "note": "includes VQGAN encode/decode + host PNG encode/IO; "
                    "compare vs bench.py bare-sampler samples/sec",
        })

    # ---------------- final table ----------------------------------------
    for phase in ("vqgan", "bridge", "eval", "throughput"):
        if os.path.exists(report_path(args.result, phase)):
            print(f"[chain] {phase}: "
                  + json.dumps(read_report(args.result, phase), default=float),
                  flush=True)


if __name__ == "__main__":
    main()
