"""One-command real-weights parity protocol (VERDICT round 2 #6).

The offline environment has no network egress, so no real pretrained weights
(LDM VQGAN first stage, released BBDM checkpoints, pytorch_fid/lpips
backbones) exist here; every converter is golden-tested against live
random-weight torch mirrors instead. The moment real weights ARE available,
this script is the single command that pushes them through the whole stack:

    python scripts/run_parity.py \
        --vqgan  /path/to/ldm_vqgan.ckpt         # torch .pth/.ckpt, vqgan.py:63-72 format \
        --bbdm   /path/to/released_bbdm.pth      # reference training ckpt (BaseRunner.py:140-170) \
        --config configs/Template-LBBDM-f4.yaml \
        --data   /path/to/paired_dataset         # custom_aligned layout ({test}/A,B) \
        --out    /tmp/parity \
        [--fid-weights inception.pth] [--lpips-weights lpips_alex.pth] \
        [--n 8] [--sample-num 1] [--cpu]

It runs: convert BBDM ckpt -> our format; load (VQGAN auto-converts through
the runner path) -> `sample_to_eval` over N test images (the exact directory
contract of reference BBDMRunner.py:224-253) -> FID/LPIPS over the produced
dirs through the JAX metric ports AND, when the ``pytorch_fid``/``lpips``
pip packages are importable, through the reference packages — printing the
deltas. Every stage is gated: missing weights skip that stage with a notice
instead of failing, so partial weight sets still exercise what they can.

tests/test_run_parity.py invokes this end-to-end, skipped unless
BBDM_PARITY_VQGAN / BBDM_PARITY_BBDM point at real files.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vqgan", required=True, help="LDM VQGAN torch checkpoint")
    ap.add_argument("--bbdm", default=None,
                    help="released BBDM/LBBDM torch training checkpoint "
                         "(optional: without it, sampling runs from random "
                         "UNet weights — conversion/VQGAN still exercised)")
    ap.add_argument("--config", default="configs/Template-LBBDM-f4.yaml")
    ap.add_argument("--data", default=None,
                    help="custom_aligned dataset root; default synthesizes "
                         "N pairs with scripts/make_synthetic_dataset.py")
    ap.add_argument("--out", default="/tmp/bbdm_parity")
    ap.add_argument("--n", type=int, default=8, help="test images to sample")
    ap.add_argument("--sample-num", type=int, default=1)
    ap.add_argument("--fid-weights", default=os.environ.get("BBDM_FID_WEIGHTS"))
    ap.add_argument("--lpips-weights", default=os.environ.get("BBDM_LPIPS_WEIGHTS"))
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--seed", type=int, default=1234)
    return ap.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bbdm_tpu.config import load_config
    from bbdm_tpu.registry import get_runner

    os.makedirs(args.out, exist_ok=True)
    config = load_config(args.config)
    image_size = config.data.dataset_config.image_size

    # ---- dataset --------------------------------------------------------
    data_root = args.data
    if data_root is None:
        data_root = os.path.join(args.out, "synthetic_data")
        if not os.path.exists(data_root):
            print(f"[data] synthesizing {args.n} paired test images -> {data_root}")
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from make_synthetic_dataset import write_stage

            write_stage(data_root, "test", args.n, image_size, args.seed)
            # train/val dirs must exist for get_dataset; tiny stubs
            write_stage(data_root, "train", 2, image_size, args.seed + 10_000)
            write_stage(data_root, "val", 2, image_size, args.seed + 20_000)

    # ---- checkpoint conversion -----------------------------------------
    if not os.path.exists(args.vqgan):
        sys.exit(f"[convert] VQGAN checkpoint not found: {args.vqgan}")
    config.model.VQGAN.params.ckpt_path = args.vqgan

    if args.bbdm:
        from bbdm_tpu.checkpoints.io import save_checkpoint
        from bbdm_tpu.checkpoints.torch_import import convert_reference_checkpoint

        print(f"[convert] reference checkpoint {args.bbdm}")
        ckpt = convert_reference_checkpoint(args.bbdm, config.model)
        converted = os.path.join(args.out, "converted_model.ckpt")
        save_checkpoint(ckpt, converted)
        config.model.model_load_path = converted
        print(f"[convert] -> {converted} (step={ckpt['step']}, epoch={ckpt['epoch']})")

    # ---- sample_to_eval sweep ------------------------------------------
    config.data.dataset_name = "parity"
    config.data.dataset_config.dataset_path = data_root
    config.data.test.batch_size = min(config.data.test.batch_size, args.n)
    config.testing.sample_num = args.sample_num

    run_args = argparse.Namespace(
        config=args.config, seed=args.seed, result_path=args.out,
        train=False, sample_to_eval=True, sample_at_start=False,
        save_top=False, gpu_ids="-1" if args.cpu else "0", port="12355",
        resume_model=None, resume_optim=None, max_epoch=None, max_steps=None,
    )
    config.args = run_args
    config.training.mesh_device_ids = None

    runner = get_runner(config.runner, config)
    runner.test()
    eval_root = runner.config.result.sample_to_eval_path
    sample_dir = os.path.join(eval_root, str(config.model.BB.params.sample_step))
    gt_dir = os.path.join(eval_root, "ground_truth")
    print(f"[sample] wrote {eval_root}")

    if args.sample_num > 1:
        # sample_num>1 writes <step>/<name>/output_j.png (runners/bbdm.py);
        # the flat-directory metric protocols can't consume that layout, so
        # normalize to one flat dir of first draws (documented: metrics below
        # are over output_0; the full multi-draw tree stays in sample_dir for
        # diversity/max_min_LPIPS by hand).
        flat = os.path.join(args.out, "samples_flat")
        os.makedirs(flat, exist_ok=True)
        for name in sorted(os.listdir(sample_dir)):
            src = os.path.join(sample_dir, name, "output_0.png")
            dst = os.path.join(flat, f"{name}.png")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(os.path.abspath(src), dst)
        print(f"[metrics] sample_num={args.sample_num}: metrics use first "
              f"draws flattened into {flat}")
        sample_dir = flat

    # ---- metrics: JAX ports vs reference pip packages ------------------
    results = {}
    if args.fid_weights and os.path.exists(args.fid_weights):
        from bbdm_tpu.evaluation import calc_FID

        results["FID/jax"] = calc_FID(sample_dir, gt_dir,
                                      weights_path=args.fid_weights)
    else:
        print("[metrics] FID(jax) skipped: no --fid-weights")
    if args.lpips_weights and os.path.exists(args.lpips_weights):
        from bbdm_tpu.evaluation.lpips import paired_LPIPS

        results["LPIPS/jax"] = paired_LPIPS(sample_dir, gt_dir,
                                            weights_path=args.lpips_weights)
    else:
        print("[metrics] LPIPS(jax) skipped: no --lpips-weights")

    try:
        from pytorch_fid.fid_score import calculate_fid_given_paths

        results["FID/torch"] = calculate_fid_given_paths(
            [sample_dir, gt_dir], batch_size=8, device="cpu", dims=2048)
    except ImportError:
        print("[metrics] FID(torch) skipped: pytorch_fid not installed")
    try:
        import lpips as lpips_pkg  # noqa: F401

        # mirror reference evaluation/LPIPS.py:11-32 on CPU
        import torch

        loss_fn = lpips_pkg.LPIPS(net="alex")
        total, n = 0.0, 0
        from PIL import Image
        import numpy as np

        for f in sorted(os.listdir(gt_dir)):
            a = os.path.join(sample_dir, f)
            b = os.path.join(gt_dir, f)
            if not (os.path.exists(a) and os.path.exists(b)):
                continue
            def load(p):
                x = np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1
                return torch.from_numpy(x.transpose(2, 0, 1))[None]
            with torch.no_grad():
                total += float(loss_fn(load(a), load(b)))
            n += 1
        if n:
            results["LPIPS/torch"] = total / n
    except ImportError:
        print("[metrics] LPIPS(torch) skipped: lpips not installed")

    # ---- report ---------------------------------------------------------
    print("\n=== parity report ===")
    for k, v in results.items():
        print(f"{k}: {v:.6f}")
    for m in ("FID", "LPIPS"):
        j, t = results.get(f"{m}/jax"), results.get(f"{m}/torch")
        if j is not None and t is not None:
            print(f"{m} delta (jax - torch): {j - t:+.6f} "
                  f"({abs(j - t) / max(abs(t), 1e-9):.3%} relative)")
    if not results:
        print("no metric weights/packages available — sampling-path parity "
              "only (directory contract written)")


if __name__ == "__main__":
    main()
