"""Path-list image dataset (reference `datasets/base.py:7-49`), torch-free.

Loads with PIL, resizes bilinear to (H, W), converts to float32 NHWC in [0,1]
with optional [-1,1] normalization, and implements the reference's
flip-doubling trick: when ``flip`` is on, the dataset length doubles and
indices past the original length return the horizontally flipped image.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

import numpy as np
from PIL import Image

_USE_NATIVE = os.environ.get("BBDM_NATIVE", "1") != "0"

# Process-wide decoded-image cache (see ``load_image(cache=True)``). Two
# loader threads missing on the same key may both decode (benign, the
# producer runs outside the lock); the check-and-insert itself is locked so
# the byte counter only ever counts the entry that actually landed.
_RAM_CACHE: dict = {}
_RAM_CACHE_BYTES = 0
_RAM_CACHE_LOCK = threading.Lock()
# soft size cap: enabling cache_in_ram on a dataset too big for host RAM
# should fail loudly with the knob named, not OOM the host


def _default_cache_cap_mb() -> float:
    """Default cap scales with the host: 25% of MemAvailable, floored at
    4096 MB (the old fixed default, kept for small/unknown hosts)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_mb = int(line.split()[1]) / 1024.0
                    return max(4096.0, 0.25 * avail_mb)
    except OSError:
        pass
    return 4096.0


_RAM_CACHE_CAP_BYTES = int(
    float(os.environ.get("BBDM_CACHE_CAP_MB") or _default_cache_cap_mb()) * 2**20)


def clear_image_cache() -> None:
    global _RAM_CACHE_BYTES
    with _RAM_CACHE_LOCK:
        _RAM_CACHE.clear()
        _RAM_CACHE_BYTES = 0


def cache_image(key, producer) -> np.ndarray:
    """Memoize a decoded-image fp32 array process-wide, write-protected.

    ``producer`` runs only on a miss. Tracks the total footprint and raises
    (naming the knobs) when it would exceed BBDM_CACHE_CAP_MB — a dataset
    that large should stream from disk instead of silently exhausting RAM.
    """
    global _RAM_CACHE_BYTES
    hit = _RAM_CACHE.get(key)
    if hit is not None:
        return hit
    arr = producer()  # outside the lock: decode must not serialize threads
    with _RAM_CACHE_LOCK:
        hit = _RAM_CACHE.get(key)
        if hit is not None:  # another thread won the race — count it once
            return hit
        if _RAM_CACHE_BYTES + arr.nbytes > _RAM_CACHE_CAP_BYTES:
            raise RuntimeError(
                f"cache_in_ram footprint would exceed "
                f"{_RAM_CACHE_CAP_BYTES / 2**20:.0f} MB after "
                f"{len(_RAM_CACHE) + 1} images (~{arr.nbytes / 2**20:.2f} MB "
                "each) — disable dataset_config.cache_in_ram for this dataset "
                "or raise BBDM_CACHE_CAP_MB")
        arr.setflags(write=False)
        _RAM_CACHE[key] = arr
        _RAM_CACHE_BYTES += arr.nbytes
    return arr


def load_image(path: str, image_size: tuple[int, int], flip: bool, to_normal: bool,
               cache: bool = False) -> np.ndarray:
    """Decode -> RGB -> resize (H,W) -> [0,1] float32 HWC; optional flip/normalize.

    The resample/flip/normalize pass runs in the fastimage C++ extension when
    available (PIL-compatible triangle-filter resampling, single fused pass);
    set BBDM_NATIVE=0 to force the PIL path.

    ``cache=True`` memoizes the finished fp32 array process-wide, keyed by the
    full argument tuple, and returns it write-protected (consumers must copy
    before mutating — all in-tree datasets already derive new arrays). This
    exists because the 1-core host's PNG decode can starve the TPU: a 256^2
    epoch that decodes from disk every step is input-bound, while the decoded
    set is tiny (~0.75 MB/image fp32). Opt in per dataset with
    ``dataset_config.cache_in_ram: true``.
    """
    if cache:
        return cache_image((path, tuple(image_size), flip, to_normal),
                           lambda: _load_image_uncached(path, image_size, flip, to_normal))
    return _load_image_uncached(path, image_size, flip, to_normal)


def _load_image_uncached(path: str, image_size: tuple[int, int], flip: bool,
                         to_normal: bool) -> np.ndarray:
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    if _USE_NATIVE:
        from bbdm_tpu.native.fastimage import preprocess_image

        arr = preprocess_image(np.asarray(img), tuple(image_size),
                               flip=flip, to_normal=to_normal)
        if arr is not None:
            return arr
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    # PIL resize takes (W, H); reference uses torchvision Resize((H, W)) bilinear
    img = img.resize((image_size[1], image_size[0]), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if to_normal:
        arr = np.clip(arr * 2.0 - 1.0, -1.0, 1.0)
    return arr


class ImagePathDataset:
    def __init__(self, image_paths, image_size=(256, 256), flip=False, to_normal=False,
                 cache=False):
        self.image_paths = list(image_paths)
        self.image_size = tuple(image_size)
        self._length = len(self.image_paths)
        self.flip = flip
        self.to_normal = to_normal
        self.cache = cache

    def __len__(self):
        return self._length * 2 if self.flip else self._length

    def __getitem__(self, index):
        do_flip = False
        if index >= self._length:
            index -= self._length
            do_flip = True
        path = self.image_paths[index]
        img = load_image(path, self.image_size, do_flip, self.to_normal,
                         cache=self.cache)
        return img, Path(path).stem
