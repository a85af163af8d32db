"""Convert reference PyTorch checkpoints to bbdm_tpu format.

    # full BBDM/LBBDM training checkpoint (model+EMA+counters+latent stats)
    python scripts/convert_checkpoint.py bbdm -c configs/Template-LBBDM-f4.yaml \
        -i path/to/top_model_epoch_X.pth -o converted/model.ckpt

    # bare LDM VQGAN first-stage checkpoint
    python scripts/convert_checkpoint.py vqgan -i CelebAMaskHQ-f4.ckpt -o vqgan.ckpt

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
    parser.add_argument("kind", choices=["bbdm", "vqgan"])
    parser.add_argument("-c", "--config", type=str, default=None,
                        help="YAML config describing the model (bbdm kind)")
    parser.add_argument("-i", "--input", type=str, required=True, help="torch .pth/.ckpt")
    parser.add_argument("-o", "--output", type=str, required=True, help="output .ckpt")
    args = parser.parse_args()

    from bbdm_tpu.checkpoints.io import save_checkpoint
    from bbdm_tpu.checkpoints.torch_import import (
        convert_ldm_vqgan_checkpoint,
        convert_reference_checkpoint,
    )

    if args.kind == "bbdm":
        if not args.config:
            parser.error("bbdm conversion needs -c/--config")
        from bbdm_tpu.config import load_config

        config = load_config(args.config)
        out = convert_reference_checkpoint(args.input, config.model)
    else:
        out = {"vqgan": convert_ldm_vqgan_checkpoint(args.input)}

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    save_checkpoint(out, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
