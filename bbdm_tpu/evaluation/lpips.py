"""LPIPS perceptual distance (reference `evaluation/LPIPS.py`, which wraps the
``lpips`` pip package with an AlexNet backbone) — JAX port.

Pipeline (lpips v0.1 semantics): images in [-1,1] -> per-channel shift/scale
-> backbone (AlexNet or VGG16) feature taps -> unit-normalize channels ->
1x1 linear heads -> spatial mean -> sum over taps.

Weights: a saved ``lpips.LPIPS(net=...)`` state_dict at ``weights_path`` /
``$BBDM_LPIPS_WEIGHTS`` (includes both the backbone and the linear heads).
Directory protocols (calc_LPIPS / random_LPIPS / find_max_min_LPIPS) follow
the reference exactly.
"""

from __future__ import annotations

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (overall torchvision feature index of each conv, channels) per tap
_ALEX_TAPS = [[(0, 64)], [(3, 192)], [(6, 384)], [(8, 256)], [(10, 256)]]
_ALEX_POOL_BEFORE = {3, 6}  # maxpool precedes these convs
_VGG_TAPS = [
    [(0, 64), (2, 64)],
    [(5, 128), (7, 128)],
    [(10, 256), (12, 256), (14, 256)],
    [(17, 512), (19, 512), (21, 512)],
    [(24, 512), (26, 512), (28, 512)],
]


def _conv(x, w, b, stride=1, pad=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool_3_2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _maxpool_2_2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _alex_features(params, x):
    feats = []
    h = x
    # conv1: k11 s4 p2
    h = jax.nn.relu(_conv(h, params["conv_0"]["kernel"], params["conv_0"]["bias"],
                          stride=4, pad=2))
    feats.append(h)
    h = _maxpool_3_2(h)
    h = jax.nn.relu(_conv(h, params["conv_3"]["kernel"], params["conv_3"]["bias"], pad=2))
    feats.append(h)
    h = _maxpool_3_2(h)
    for idx in (6, 8, 10):
        h = jax.nn.relu(_conv(h, params[f"conv_{idx}"]["kernel"], params[f"conv_{idx}"]["bias"]))
        feats.append(h)
    return feats


def _vgg_features(params, x):
    feats = []
    h = x
    for tap in _VGG_TAPS:
        for idx, _ in tap:
            h = jax.nn.relu(_conv(h, params[f"conv_{idx}"]["kernel"],
                                  params[f"conv_{idx}"]["bias"]))
        feats.append(h)
        if tap is not _VGG_TAPS[-1]:
            h = _maxpool_2_2(h)
    return feats


def lpips_distance(params, net: str, img0, img1):
    """img0/img1: [N,H,W,3] in [-1,1]. Returns [N] distances."""
    def prep(x):
        return (x - _SHIFT) / _SCALE

    extractor = _alex_features if net == "alex" else _vgg_features
    f0 = extractor(params, prep(img0))
    f1 = extractor(params, prep(img1))
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        # lpips.normalize_tensor: feat / (||feat|| + eps) — eps OUTSIDE sqrt
        a = a / (jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True)) + 1e-10)
        diff = (a - b) ** 2
        w = params[f"lin_{k}"]["kernel"]  # [C, 1]
        total = total + jnp.einsum("nhwc,co->n", diff, w) / (a.shape[1] * a.shape[2])
    return total


def convert_lpips_state_dict(sd: dict, net: str = "alex") -> dict:
    """lpips.LPIPS(net=...) state_dict -> flax-ish param dict."""
    out: dict = {}

    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, value in sd.items():
        v = np_(value)
        parts = key.split(".")
        if parts[0] == "scaling_layer":
            continue  # constants baked in
        if parts[0].startswith("lin"):
            k = int(parts[0][3:])
            out[f"lin_{k}"] = {"kernel": v[:, :, 0, 0].T.astype(np.float32)}  # [1,C,1,1]->[C,1]
        elif parts[0] == "net" and parts[-1] in ("weight", "bias"):
            idx = int(parts[2])
            name = f"conv_{idx}"
            node = out.setdefault(name, {})
            if parts[-1] == "weight":
                node["kernel"] = v.transpose(2, 3, 1, 0).astype(np.float32)
            else:
                node["bias"] = v.astype(np.float32)
    return out


def load_lpips_params(weights_path: str | None = None, net: str = "alex") -> dict:
    path = weights_path or os.environ.get("BBDM_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not found. Save `lpips.LPIPS(net='alex').state_dict()` "
            "to a .pth and point BBDM_LPIPS_WEIGHTS at it (no network egress "
            "here, so the backbone cannot be auto-downloaded)."
        )
    if path.endswith((".pth", ".pt")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        return convert_lpips_state_dict(sd, net)
    from bbdm_tpu.checkpoints.io import load_checkpoint

    return load_checkpoint(path)


def _decode(path: str) -> np.ndarray:
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img * 2.0 - 1.0


def _decode_many(paths, threads: int = 8) -> np.ndarray:
    from concurrent.futures import ThreadPoolExecutor

    if len(paths) == 1:
        return np.stack([_decode(paths[0])])
    with ThreadPoolExecutor(max_workers=min(threads, len(paths))) as ex:
        return np.stack(list(ex.map(_decode, paths)))


def _make_dist_fn(params, net):
    return jax.jit(lambda a, b: lpips_distance(params, net, a, b))


def batched_distances(params, net: str, pairs, batch_size: int = 32) -> np.ndarray:
    """LPIPS over a list of (path_a, path_b) pairs -> float32 [len(pairs)].

    One fixed-shape jitted call per batch (last batch zero-padded to
    ``batch_size`` so the whole protocol compiles exactly once); decode is
    threaded and, because jax dispatch is async, overlaps the device work of
    the previous batch. The reference protocols dispatch one pair at a time
    (`evaluation/LPIPS.py:11-32`) — fine on local CUDA, dispatch-bound
    through the TPU tunnel at thousands-of-pairs scale. Assumes one image
    size per protocol run (what ``sample_to_eval`` writes).
    """
    dist = _make_dist_fn(params, net)
    pending = []  # (device_result, n_valid)
    for i in range(0, len(pairs), batch_size):
        chunk = pairs[i:i + batch_size]
        a = _decode_many([p[0] for p in chunk])
        b = _decode_many([p[1] for p in chunk])
        n = len(chunk)
        if n < batch_size and len(pairs) > batch_size:
            pad = ((0, batch_size - n), (0, 0), (0, 0), (0, 0))
            a, b = np.pad(a, pad), np.pad(b, pad)
        pending.append((dist(jnp.asarray(a), jnp.asarray(b)), n))
    return np.concatenate([np.asarray(d)[:n] for d, n in pending])


def _sample_tree_pairs(data_dir: str, gt_dir: str, num_samples: int):
    """The reference's numeric tree: gt/<i>.png vs data/<i>/output_<j>.png
    (or flat data/<i>.png when num_samples == 1)."""
    total = len(os.listdir(data_dir))
    pairs = []
    for i in range(total):
        gt = os.path.join(gt_dir, f"{i}.png")
        for j in range(num_samples):
            if num_samples == 1:
                p = os.path.join(data_dir, f"{i}.png")
            else:
                p = os.path.join(data_dir, str(i), f"output_{j}.png")
            pairs.append((gt, p))
    return total, pairs


def calc_LPIPS(data_dir: str, gt_dir: str, num_samples: int = 1, *,
               weights_path: str | None = None, net: str = "alex",
               batch_size: int = 32) -> float:
    """reference `evaluation/LPIPS.py:11-32` directory protocol."""
    params = load_lpips_params(weights_path, net)
    total, pairs = _sample_tree_pairs(data_dir, gt_dir, num_samples)
    avg = float(batched_distances(params, net, pairs, batch_size).mean())
    print(data_dir)
    print(f"lpips_distance: {avg}")
    return avg


def paired_LPIPS(data_dir: str, gt_dir: str, *,
                 weights_path: str | None = None, net: str = "alex",
                 batch_size: int = 32) -> float:
    """Mean LPIPS over files present (by name) in BOTH flat directories.

    `calc_LPIPS` keeps the reference's numeric `{i}.png` protocol
    (`evaluation/LPIPS.py:11-32`); this variant pairs by filename instead,
    matching what `sample_to_eval` actually writes (dataset-stem names,
    data/base.py) — used by scripts/run_parity.py.
    """
    params = load_lpips_params(weights_path, net)
    names = sorted(set(os.listdir(data_dir)) & set(os.listdir(gt_dir)))
    names = [n for n in names
             if os.path.splitext(n)[1].lower() in
             {".png", ".jpg", ".jpeg", ".bmp", ".webp"}]
    if not names:
        raise ValueError(f"no common image names in {data_dir} / {gt_dir}")
    pairs = [(os.path.join(gt_dir, n), os.path.join(data_dir, n)) for n in names]
    return float(batched_distances(params, net, pairs, batch_size).mean())


def _distance_matrix(data_dir: str, gt_dir: str, num_samples: int,
                     params, net: str, batch_size: int = 32) -> np.ndarray:
    total, pairs = _sample_tree_pairs(data_dir, gt_dir, num_samples)
    return batched_distances(params, net, pairs, batch_size).reshape(
        total, num_samples)


def random_LPIPS(data_dir: str, gt_dir: str, num_samples: int = 1, *,
                 params=None, net: str = "alex", dists=None) -> float:
    """reference `:40-55`: one random output per input.

    ``dists`` (a precomputed [total, num_samples] matrix from
    ``_distance_matrix``) lets `find_max_min_LPIPS` run its 100 draws
    without re-running the network; the draw semantics are unchanged."""
    if dists is None:
        dists = _distance_matrix(data_dir, gt_dir, num_samples, params, net)
    total = dists.shape[0]
    acc = 0.0
    for i in range(total):
        acc += float(dists[i, random.randint(0, num_samples - 1)])
    return acc / total


def find_max_min_LPIPS(data_dir: str, gt_dir: str, num_samples: int = 1, *,
                       weights_path: str | None = None, net: str = "alex"):
    """reference `:59-72`: spread over 100 random draws."""
    params = load_lpips_params(weights_path, net)
    dists = _distance_matrix(data_dir, gt_dir, num_samples, params, net)
    max_l, min_l = 0.0, 10.0
    for i in range(100):
        avg = random_LPIPS(data_dir, gt_dir, num_samples, params=params,
                           net=net, dists=dists)
        max_l, min_l = max(max_l, avg), min(min_l, avg)
        if i % 20 == 0:
            print(f"{i} current_LPIPS = {avg}, max_LPIPS = {max_l}, min_LPIPS = {min_l}")
    print(data_dir)
    print(f"max_LPIPS = {max_l}, min_LPIPS = {min_l}")
    return max_l, min_l
