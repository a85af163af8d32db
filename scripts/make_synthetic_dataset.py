"""Generate a synthetic paired translation dataset (custom_aligned layout).

Layout (reference `datasets/custom.py:33-50` — {stage}/{A,B} paired dirs):

    <out>/train/A/*.png   condition  (grayscale rendering of B)
    <out>/train/B/*.png   target     (procedural color image)
    <out>/{val,test}/{A,B}/*.png

The mapping A -> B is colorization-style: B is a smooth procedural color
image (random background gradient + gaussian color blobs + a few hard-edged
rectangles), A is its ITU-R 601 luma replicated to 3 channels. Deterministic
per-index seeds make the dataset reproducible.

Usage:
    python scripts/make_synthetic_dataset.py --out datasets/syn256 \
        --size 256 --train 800 --val 64 --test 64
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _gradient(rng, size):
    """Random linear color gradient background."""
    h = w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / (h - 1), xx / (w - 1)
    c0 = rng.uniform(0.05, 0.95, size=3).astype(np.float32)
    c1 = rng.uniform(0.05, 0.95, size=3).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    t = (xx * np.cos(ang) + yy * np.sin(ang) + 1.0) / 2.0
    return c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]


def _add_blobs(rng, img, n_blobs):
    h, w, _ = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(n_blobs):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        sy = rng.uniform(0.05, 0.25) * h
        sx = rng.uniform(0.05, 0.25) * w
        color = rng.uniform(0, 1, size=3).astype(np.float32)
        alpha = rng.uniform(0.4, 0.9)
        g = np.exp(-(((yy - cy) / sy) ** 2 + ((xx - cx) / sx) ** 2))
        img = img * (1 - alpha * g[..., None]) + alpha * g[..., None] * color[None, None]
    return img


def _add_rects(rng, img, n_rects):
    h, w, _ = img.shape
    for _ in range(n_rects):
        rh = int(rng.uniform(0.08, 0.3) * h)
        rw = int(rng.uniform(0.08, 0.3) * w)
        y0 = rng.randint(0, h - rh)
        x0 = rng.randint(0, w - rw)
        color = rng.uniform(0, 1, size=3).astype(np.float32)
        alpha = rng.uniform(0.5, 1.0)
        img[y0:y0 + rh, x0:x0 + rw] = (
            img[y0:y0 + rh, x0:x0 + rw] * (1 - alpha) + alpha * color[None, None]
        )
    return img


def make_pair(seed, size):
    rng = np.random.RandomState(seed)
    img = _gradient(rng, size)
    img = _add_blobs(rng, img, rng.randint(3, 7))
    img = _add_rects(rng, img, rng.randint(1, 4))
    img = np.clip(img, 0.0, 1.0)
    luma = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    cond = np.repeat(luma[..., None], 3, axis=-1)
    b = (img * 255.0 + 0.5).astype(np.uint8)
    a = (np.clip(cond, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    return a, b


def write_stage(out, stage, count, size, seed_base):
    a_dir = os.path.join(out, stage, "A")
    b_dir = os.path.join(out, stage, "B")
    os.makedirs(a_dir, exist_ok=True)
    os.makedirs(b_dir, exist_ok=True)
    for i in range(count):
        a, b = make_pair(seed_base + i, size)
        name = f"{stage}_{i:05d}.png"
        Image.fromarray(a).save(os.path.join(a_dir, name))
        Image.fromarray(b).save(os.path.join(b_dir, name))
    print(f"{stage}: {count} pairs -> {os.path.join(out, stage)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="datasets/syn256")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--train", type=int, default=800)
    ap.add_argument("--val", type=int, default=64)
    ap.add_argument("--test", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    write_stage(args.out, "train", args.train, args.size, args.seed)
    write_stage(args.out, "val", args.val, args.size, args.seed + 1_000_000)
    write_stage(args.out, "test", args.test, args.size, args.seed + 2_000_000)


if __name__ == "__main__":
    main()
