"""FID over two image directories (reference `evaluation/FID.py:10-16`, which
wraps ``pytorch_fid``).

Feature extraction runs the JAX FID-InceptionV3 port jitted on the
accelerator; the Fréchet distance uses scipy's matrix sqrt in float64.
Weights: converted torch state_dict at ``weights_path`` /
``$BBDM_FID_WEIGHTS`` (either a torch .pth or a pre-converted .msgpack).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from scipy import linalg

from bbdm_tpu.evaluation.inception import FIDInceptionV3, convert_inception_state_dict


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2)) (pytorch_fid semantics)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    def _sqrtm(m):
        res = linalg.sqrtm(m)  # scipy >= 1.18 returns the array alone
        return res[0] if isinstance(res, tuple) else res

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(features: np.ndarray):
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _image_files(path: str):
    exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if os.path.splitext(f)[1].lower() in exts
    )


def load_fid_params(weights_path: str | None = None) -> dict:
    path = weights_path or os.environ.get("BBDM_FID_WEIGHTS")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "FID InceptionV3 weights not found. Set BBDM_FID_WEIGHTS to a "
            "torchvision/pytorch_fid InceptionV3 checkpoint (.pth) or a "
            "pre-converted .msgpack (this environment has no network egress, "
            "so weights cannot be auto-downloaded like pytorch_fid does)."
        )
    if path.endswith((".pth", ".pt")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return convert_inception_state_dict(sd)
    from bbdm_tpu.checkpoints.io import load_checkpoint

    return load_checkpoint(path)


def compute_features_for_path(path: str, params: dict, batch_size: int = 32) -> np.ndarray:
    model = FIDInceptionV3()
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    files = _image_files(path)
    if not files:
        raise ValueError(f"no images found in {path}")
    feats = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB"), dtype=np.float32) / 255.0
            for f in chunk
        ])
        feats.append(np.asarray(apply(params, jnp.asarray(imgs))))
    return np.concatenate(feats, axis=0)


def calc_FID(input_path1: str, input_path2: str, *, weights_path: str | None = None,
             batch_size: int = 32) -> float:
    """FID between two directories of images (reference calc_FID signature)."""
    params = load_fid_params(weights_path)
    f1 = compute_features_for_path(input_path1, params, batch_size)
    f2 = compute_features_for_path(input_path2, params, batch_size)
    fid_value = frechet_distance(*activation_statistics(f1), *activation_statistics(f2))
    print("FID value:", fid_value)
    return fid_value
