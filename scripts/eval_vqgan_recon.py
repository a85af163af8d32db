"""VQGAN reconstruction ceiling: roundtrip a directory of images through a
trained first stage and report PSNR/SSIM vs the originals.

A latent bridge can at best reproduce what its FROZEN first stage can
reconstruct (the decode path is fixed — reference `model/VQGAN/vqgan.py:87-100`),
so the roundtrip metric of the first stage is the ceiling for any
sample-vs-ground-truth pixel metric of the full model. Run it against the
`ground_truth` directory a sample_to_eval sweep produced to put the sweep's
PSNR/SSIM in context.

    python scripts/eval_vqgan_recon.py \
        --config configs/runs/LBBDM-f4-syn256.yaml \
        --vq-ckpt results/run_r3_chain/syn256/VQGAN-f4/checkpoint/last_model.ckpt \
        --data results/run_r3_chain/syn256/LBBDM-f4-chain/sample_to_eval/ground_truth \
        --out /tmp/vq_recon [--fp32] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/runs/LBBDM-f4-syn256.yaml")
    ap.add_argument("--vq-ckpt", required=True)
    ap.add_argument("--data", required=True, help="directory of images to roundtrip")
    ap.add_argument("--out", default="/tmp/vq_recon")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0, help="0 = all")
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 weights (default: bf16, the sampling-path dtype)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bbdm_tpu.checkpoints.io import load_checkpoint
    from bbdm_tpu.config import load_config
    from bbdm_tpu.evaluation import calc_psnr_ssim
    from bbdm_tpu.models.vqgan import VQModel
    from bbdm_tpu.utils.images import save_single_image
    from flax import serialization

    config = load_config(args.config)
    vq_cfg = config.model.VQGAN.params
    model = VQModel.from_config(
        vq_cfg, dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    res = vq_cfg.ddconfig.resolution
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, res, res, vq_cfg.ddconfig.in_channels), jnp.float32),
    )["params"]

    from bbdm_tpu.checkpoints.io import extract_vqgan_tree

    vq = extract_vqgan_tree(load_checkpoint(args.vq_ckpt))
    params = serialization.from_state_dict(params, vq)

    @jax.jit
    def roundtrip(params, x):
        rec, _ = model.apply({"params": params}, x)
        return rec

    names = sorted(
        n for n in os.listdir(args.data)
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if args.limit:
        names = names[: args.limit]
    os.makedirs(args.out, exist_ok=True)

    for i in range(0, len(names), args.batch):
        chunk = names[i : i + args.batch]
        imgs = []
        for n in chunk:
            a = np.asarray(
                Image.open(os.path.join(args.data, n)).convert("RGB"),
                np.float32,
            )
            imgs.append(a / 127.5 - 1.0)  # to_normal pipeline range
        rec = np.asarray(roundtrip(params, jnp.asarray(np.stack(imgs))), np.float32)
        for n, r in zip(chunk, rec):
            save_single_image(r, args.out, n, to_normal=True)

    metrics = calc_psnr_ssim(args.out, args.data)
    print(json.dumps({
        "metric": "VQGAN roundtrip reconstruction (pixel-metric ceiling)",
        "vq_ckpt": args.vq_ckpt,
        "data": args.data,
        "count": len(names),
        **{k: round(float(v), 4) for k, v in metrics.items()},
    }))


if __name__ == "__main__":
    main()
