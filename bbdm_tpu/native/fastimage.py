"""Python wrapper over the fastimage C++ extension."""

from __future__ import annotations

import numpy as np

from bbdm_tpu.native.build import get_fastimage


def preprocess_image(
    src_u8: np.ndarray, out_hw: tuple[int, int], *, flip: bool = False,
    to_normal: bool = False,
) -> np.ndarray | None:
    """uint8 HWC -> float32 (oh, ow, C) resampled/flipped/normalized.

    Returns None when the native library is unavailable (caller falls back to
    the PIL path).
    """
    lib = get_fastimage()
    if lib is None:
        return None
    src_u8 = np.ascontiguousarray(src_u8, dtype=np.uint8)
    h, w, ch = src_u8.shape
    oh, ow = out_hw
    dst = np.empty((oh, ow, ch), dtype=np.float32)
    lib.preprocess_image(
        src_u8.ctypes.data, h, w, ch, dst.ctypes.data, oh, ow,
        1 if flip else 0, 1 if to_normal else 0,
    )
    return dst
