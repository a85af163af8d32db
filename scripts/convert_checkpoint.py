"""Convert reference PyTorch checkpoints to bbdm_tpu format.

    # full BBDM/LBBDM training checkpoint (model+EMA+counters+latent stats)
    python scripts/convert_checkpoint.py bbdm -c configs/Template-LBBDM-f4.yaml \
        -i path/to/top_model_epoch_X.pth -o converted/model.ckpt

    # bare LDM VQGAN first-stage checkpoint
    python scripts/convert_checkpoint.py vqgan -i CelebAMaskHQ-f4.ckpt -o vqgan.ckpt

    # full taming/LDM VQGAN TRAINING checkpoint (autoencoder + discriminator
    # + LPIPS) -> VQGANRunner model_load_path + loss.lpips_weights, for
    # in-framework fine-tuning from a released first stage
    python scripts/convert_checkpoint.py vqgan-train -i CelebAMaskHQ-f4.ckpt \
        -o vqgan_train.ckpt --lpips-out lpips_vgg.ckpt

The outputs load through the normal --resume_model / VQGAN ckpt_path paths,
so released reference weights can be evaluated for FID/LPIPS parity without
retraining (SURVEY.md §7 decision 6).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("kind", choices=["bbdm", "vqgan", "vqgan-train"])
    parser.add_argument("-c", "--config", type=str, default=None,
                        help="YAML config describing the model (bbdm kind)")
    parser.add_argument("-i", "--input", type=str, required=True, help="torch .pth/.ckpt")
    parser.add_argument("-o", "--output", type=str, required=True, help="output .ckpt")
    parser.add_argument("--lpips-out", type=str, default=None,
                        help="vqgan-train: also write the checkpoint's LPIPS "
                             "weights here (point loss.lpips_weights at it)")
    args = parser.parse_args()

    from bbdm_tpu.checkpoints.io import save_checkpoint
    from bbdm_tpu.checkpoints.torch_import import (
        convert_ldm_vqgan_checkpoint,
        convert_reference_checkpoint,
        convert_vqgan_train_checkpoint,
    )

    lpips = None
    if args.kind == "bbdm":
        if not args.config:
            parser.error("bbdm conversion needs -c/--config")
        from bbdm_tpu.config import load_config

        config = load_config(args.config)
        out = convert_reference_checkpoint(args.input, config.model)
    elif args.kind == "vqgan-train":
        out, lpips = convert_vqgan_train_checkpoint(args.input)
    else:
        out = {"vqgan": convert_ldm_vqgan_checkpoint(args.input)}

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    save_checkpoint(out, args.output)
    print(f"wrote {args.output}")
    if args.kind == "vqgan-train":
        dc = out["disc_config"]
        print("discriminator geometry (set these in model.loss): "
              f"disc_num_layers={dc['disc_num_layers']} "
              f"use_actnorm={dc['use_actnorm']} disc_ndf={dc['disc_ndf']}")
        if lpips is None:
            print("no loss.perceptual_loss.* weights in the checkpoint")
        elif args.lpips_out:
            os.makedirs(os.path.dirname(os.path.abspath(args.lpips_out)),
                        exist_ok=True)
            save_checkpoint(lpips, args.lpips_out)
            print(f"wrote {args.lpips_out}")
        else:
            print("checkpoint has LPIPS weights; pass --lpips-out to export")


if __name__ == "__main__":
    main()
