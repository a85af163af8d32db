"""Fabricate a deterministic random-backbone FID-InceptionV3 weight file.

No network egress exists on this rig, so pytorch_fid's canonical
`pt_inception-2015-12-05` checkpoint (reference `evaluation/FID.py:5`,
auto-downloaded there) cannot be fetched. For protocol-closure runs — the
reference's FID mode over a framework-produced `sample_to_eval` tree
(`preprocess_and_evaluation.py -f FID`) — this script builds a SEEDED random
backbone in the torch `.pth` on-disk format `bbdm_tpu.evaluation.fid.
load_fid_params` consumes (the same converter real weights go through,
golden-tested in tests/test_golden_metrics.py):

  * conv kernels He-re-initialized (kaiming-normal, relu gain): the stack is
    ~20 convs deep and BatchNorm running stats are identity at init, so the
    per-layer gain must be ~1 — torch's default under-gained init collapses
    the pool3 features to ~0 by the last block (measured: FID ≈ 1e-42
    between any two image sets), and an over-gained one overflows fp32;
  * BatchNorm/bias parameters left at their torch defaults.

Random-feature FID is a rank-reasonable distributional proxy, NOT the
canonical metric — swap in real weights via BBDM_FID_WEIGHTS when they
exist (scripts/run_parity.py protocol).

    python scripts/make_random_inception.py [--out /tmp/fid_inception_rand.pth] [--seed 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fid_inception_rand.pth")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import torch

    from tests.torch_mirrors import FIDInceptionMirror

    torch.manual_seed(args.seed)
    mirror = FIDInceptionMirror().eval()
    sd = mirror.state_dict()
    with torch.no_grad():
        for k, v in sd.items():
            if k.endswith(".conv.weight"):
                torch.nn.init.kaiming_normal_(v, nonlinearity="relu")
    torch.save(sd, args.out)
    print(f"wrote {args.out} (seed {args.seed})")


if __name__ == "__main__":
    main()
