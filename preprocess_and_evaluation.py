"""Evaluation prep + metric CLI — command-compatible with the reference's
`preprocess_and_evaluation.py:54-76`, plus FID and pixel-metric subcommands.

    python preprocess_and_evaluation.py -f rename_samples -r ROOT -s SRC -t DST
    python preprocess_and_evaluation.py -f copy_samples   -r ROOT -s SRC -t DST
    python preprocess_and_evaluation.py -f LPIPS          -s DATA -t GT -n 5
    python preprocess_and_evaluation.py -f max_min_LPIPS  -s DATA -t GT -n 5
    python preprocess_and_evaluation.py -f diversity      -s DATA -n 5
    python preprocess_and_evaluation.py -f FID            -s DIR1 -t DIR2
    python preprocess_and_evaluation.py -f psnr_ssim      -s DATA -t GT
"""

from __future__ import annotations

import argparse
import os
import shutil


def make_dir(d):
    os.makedirs(d, exist_ok=True)
    return d


def rename_sample_files(source_dir: str, target_dir: str):
    """Reindex a sample tree to 0..N-1 names (reference `:10-27`)."""
    flist = sorted(os.listdir(source_dir))
    make_dir(target_dir)
    for i, name in enumerate(flist):
        if i % 1000 == 0:
            print(f"{i} samples")
        fpath = os.path.join(source_dir, name)
        if os.path.isdir(fpath):
            shutil.copytree(fpath, os.path.join(target_dir, str(i)))
        else:
            shutil.copy(fpath, os.path.join(target_dir, f"{i}.png"))


def copy_sample_files(source_dir: str, target_dir: str):
    """Flatten per-image subdirs to <name>.png via output_0 (reference `:30-40`)."""
    flist = sorted(os.listdir(source_dir))
    make_dir(target_dir)
    for i, name in enumerate(flist):
        if i % 1000 == 0:
            print(f"{i} samples")
        shutil.copy(os.path.join(source_dir, name, "output_0.png"),
                    os.path.join(target_dir, f"{name}.png"))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-f", "--func_name", type=str, required=True)
    parser.add_argument("-r", "--root_dir", type=str, default=None)
    parser.add_argument("-s", "--source_dir", type=str, default=None)
    parser.add_argument("-t", "--target_dir", type=str, default=None)
    parser.add_argument("-n", "--num_samples", type=int, default=1)
    parser.add_argument("--weights", type=str, default=None,
                        help="metric backbone weights (FID/LPIPS)")
    parser.add_argument("--cpu", action="store_true",
                        help="run the metric networks on CPU (the jax-backed "
                        "metrics otherwise claim the accelerator; use this to "
                        "score while a training client owns the chip)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.func_name == "rename_samples":
        src = os.path.join(args.root_dir, args.source_dir)
        dst = os.path.join(args.root_dir, args.target_dir)
        print(f"rename sample files from {src} to {dst}")
        rename_sample_files(src, dst)
    elif args.func_name == "copy_samples":
        src = os.path.join(args.root_dir, args.source_dir)
        dst = os.path.join(args.root_dir, args.target_dir)
        print(f"copy sample files from {src} to {dst}")
        copy_sample_files(src, dst)
    elif args.func_name == "LPIPS":
        from bbdm_tpu.evaluation.lpips import calc_LPIPS

        print(f"calculate LPIPS {args.source_dir}")
        calc_LPIPS(args.source_dir, args.target_dir, args.num_samples,
                   weights_path=args.weights)
    elif args.func_name == "max_min_LPIPS":
        from bbdm_tpu.evaluation.lpips import find_max_min_LPIPS

        print(f"calculate max_min_LPIPS {args.source_dir}")
        find_max_min_LPIPS(args.source_dir, args.target_dir, args.num_samples,
                           weights_path=args.weights)
    elif args.func_name == "diversity":
        from bbdm_tpu.evaluation.diversity import calc_diversity

        print(f"calculate diversity {args.source_dir}")
        calc_diversity(args.source_dir, args.num_samples)
    elif args.func_name == "FID":
        from bbdm_tpu.evaluation.fid import calc_FID

        calc_FID(args.source_dir, args.target_dir, weights_path=args.weights)
    elif args.func_name == "psnr_ssim":
        from bbdm_tpu.evaluation.pixel_metrics import calc_psnr_ssim

        calc_psnr_ssim(args.source_dir, args.target_dir)
    else:
        raise NotImplementedError(args.func_name)


if __name__ == "__main__":
    main()
