"""Fabricate a deterministic random-backbone AlexNet-LPIPS weight file.

No network egress exists on this rig, so the canonical `lpips.LPIPS(net=
'alex')` backbone (reference `evaluation/LPIPS.py:7`) cannot be downloaded.
For protocol-closure runs (diversity / max_min_LPIPS over a framework-produced
`sample_num>1` sweep, reference `preprocess_and_evaluation.py:54-76`) this
script builds a SEEDED random backbone in the exact on-disk format
`bbdm_tpu.evaluation.lpips.load_lpips_params` consumes:

  * conv kernels scaled by 0.05 and biases zeroed so five stacked fp32 convs
    stay finite (raw N(0,sigma) init overflows by the last tap);
  * linear-head weights made non-negative (torch LPIPS heads are trained
    non-negative; keeps the distance a proper >=0 semi-metric).

Random-feature LPIPS is a rank-reasonable perceptual proxy, NOT the canonical
metric — swap in real weights via BBDM_LPIPS_WEIGHTS when they exist
(scripts/run_parity.py protocol).

    python scripts/make_random_lpips.py [--out /tmp/lpips_alex_rand.ckpt] [--seed 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lpips_alex_rand.ckpt")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from bbdm_tpu.checkpoints.io import save_checkpoint
    from bbdm_tpu.evaluation.lpips import convert_lpips_state_dict
    from tests.torch_mirrors import LPIPSMirror

    torch.manual_seed(args.seed)
    lp = convert_lpips_state_dict(
        LPIPSMirror(net="alex").eval().state_dict(), "alex")
    for name, node in lp.items():
        if name.startswith("conv_"):
            node["kernel"] = (node["kernel"] * 0.05).astype(np.float32)
            node["bias"] = (node["bias"] * 0.0).astype(np.float32)
        else:
            node["kernel"] = np.abs(node["kernel"]).astype(np.float32)
    save_checkpoint(lp, args.out)
    print(f"wrote {args.out} (seed {args.seed})")


if __name__ == "__main__":
    main()
