"""Image save helpers (reference `runners/utils.py:67-84`), torch-free NHWC.

[-1,1] (or [0,1]) float arrays -> uint8 PNGs; grid assembly matches
torchvision ``make_grid`` (row-major, nrow columns, 2px padding).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def to_uint8(image: np.ndarray, to_normal: bool = True) -> np.ndarray:
    """float HWC -> uint8 HWC (reference save_single_image arithmetic:
    mul(0.5).add(0.5).clamp(0,1).mul(255).add(0.5).clamp(0,255))."""
    img = np.asarray(image, dtype=np.float32)
    if to_normal:
        img = np.clip(img * 0.5 + 0.5, 0.0, 1.0)
    img = np.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    return img


def save_single_image(image, save_path: str, file_name: str, to_normal: bool = True):
    os.makedirs(save_path, exist_ok=True)
    Image.fromarray(to_uint8(image, to_normal)).save(os.path.join(save_path, file_name))


def get_image_grid(batch: np.ndarray, grid_size: int = 4, to_normal: bool = True,
                   padding: int = 2) -> np.ndarray:
    """[B,H,W,C] floats -> one uint8 [gH,gW,C] grid (torchvision make_grid layout)."""
    batch = np.asarray(batch)
    B, H, W, C = batch.shape
    ncol = min(grid_size, B)
    nrow = (B + ncol - 1) // ncol
    gh = nrow * (H + padding) + padding
    gw = ncol * (W + padding) + padding
    grid = np.zeros((gh, gw, C), dtype=np.float32)
    for i in range(B):
        r, c = divmod(i, ncol)
        y = padding + r * (H + padding)
        x = padding + c * (W + padding)
        grid[y:y + H, x:x + W] = batch[i]
    return to_uint8(grid, to_normal)
