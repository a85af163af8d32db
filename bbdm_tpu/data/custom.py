"""The five registered dataset types (reference `datasets/custom.py`).

Every __getitem__ returns ``((x, x_name), (x_cond, x_cond_name))`` with images
as float32 HWC arrays — x is the translation *target* (domain B), x_cond the
*condition* (domain A), matching `datasets/custom.py:49-50`.

Deviations from the reference (documented):
  * custom_colorization_LAB: the reference references an undefined
    ``self.to_lab`` and returns bare tensors instead of (img, name) tuples
    (`datasets/custom.py:78,96` — latent bugs); we always convert to LAB and
    return the standard tuple contract.
  * custom_inpainting: mask geometry is drawn from a per-index deterministic
    RNG (seeded by epoch_seed + index) instead of torch's global RNG, so
    sampling is reproducible; the distribution is identical
    (128-180 px box, uniform position — `datasets/custom.py:195-203`).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from bbdm_tpu.data.base import ImagePathDataset, load_image
from bbdm_tpu.data.utils import get_image_paths_from_dir
from bbdm_tpu.registry import Registers


@Registers.datasets.register_with_name("custom_single")
class CustomSingleDataset:
    """Single domain: condition == target (reference `datasets/custom.py:15-30`)."""

    def __init__(self, dataset_config, stage="train"):
        size = (dataset_config.image_size, dataset_config.image_size)
        paths = get_image_paths_from_dir(os.path.join(dataset_config.dataset_path, stage))
        flip = dataset_config.flip if stage == "train" else False
        cache = getattr(dataset_config, "cache_in_ram", False)
        self.imgs = ImagePathDataset(paths, size, flip=flip,
                                     to_normal=dataset_config.to_normal, cache=cache)

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        item = self.imgs[i]
        return item, item


@Registers.datasets.register_with_name("custom_aligned")
class CustomAlignedDataset:
    """Paired translation: B = target, A = condition (reference `:33-50`)."""

    def __init__(self, dataset_config, stage="train"):
        size = (dataset_config.image_size, dataset_config.image_size)
        paths_ori = get_image_paths_from_dir(
            os.path.join(dataset_config.dataset_path, f"{stage}/B"))
        paths_cond = get_image_paths_from_dir(
            os.path.join(dataset_config.dataset_path, f"{stage}/A"))
        flip = dataset_config.flip if stage == "train" else False
        cache = getattr(dataset_config, "cache_in_ram", False)
        self.imgs_ori = ImagePathDataset(paths_ori, size, flip=flip,
                                         to_normal=dataset_config.to_normal,
                                         cache=cache)
        self.imgs_cond = ImagePathDataset(paths_cond, size, flip=flip,
                                          to_normal=dataset_config.to_normal,
                                          cache=cache)

    def __len__(self):
        return len(self.imgs_ori)

    def __getitem__(self, i):
        return self.imgs_ori[i], self.imgs_cond[i]


class _FlipDoubledPaths:
    """Shared flip-doubling/index bookkeeping for the single-dir datasets."""

    def __init__(self, dataset_config, stage):
        self.image_size = (dataset_config.image_size, dataset_config.image_size)
        self.image_paths = get_image_paths_from_dir(
            os.path.join(dataset_config.dataset_path, stage))
        self.flip = dataset_config.flip if stage == "train" else False
        self.to_normal = dataset_config.to_normal
        self.cache = getattr(dataset_config, "cache_in_ram", False)
        self._length = len(self.image_paths)

    def __len__(self):
        return self._length * 2 if self.flip else self._length

    def resolve(self, index):
        if index >= self._length:
            return index - self._length, True
        return index, False


@Registers.datasets.register_with_name("custom_colorization_RGB")
class CustomColorizationRGBDataset(_FlipDoubledPaths):
    """Grayscale->RGB colorization (reference `:99-149`): the condition is the
    L-channel image replicated to 3 channels."""

    def __init__(self, dataset_config, stage="train"):
        super().__init__(dataset_config, stage)

    def __getitem__(self, index):
        index, do_flip = self.resolve(index)
        path = self.image_paths[index]
        img = load_image(path, self.image_size, do_flip, self.to_normal,
                         cache=self.cache)
        # luminance (ITU-R 601), matching PIL Image.convert('L')
        lum = img if not self.to_normal else (img + 1.0) / 2.0
        L = lum[..., 0] * 0.299 + lum[..., 1] * 0.587 + lum[..., 2] * 0.114
        cond = np.repeat(L[..., None], 3, axis=-1).astype(np.float32)
        if self.to_normal:
            cond = np.clip(cond * 2.0 - 1.0, -1.0, 1.0)
        name = Path(path).stem
        return (img, name), (cond, name)


@Registers.datasets.register_with_name("custom_colorization_LAB")
class CustomColorizationLABDataset(_FlipDoubledPaths):
    """LAB colorization (reference `:53-96`, bugs fixed — see module docstring).

    Target = full LAB image normalized to [-1,1]; condition = L channel
    replicated to 3 channels.
    """

    def __init__(self, dataset_config, stage="train"):
        super().__init__(dataset_config, stage)

    def _decode_lab(self, path, do_flip):
        import cv2

        image = cv2.imread(path)
        image = cv2.cvtColor(image, cv2.COLOR_BGR2LAB)
        if do_flip:
            image = cv2.flip(image, 1)
        image = cv2.resize(image, self.image_size, interpolation=cv2.INTER_LINEAR)
        image = image.astype(np.float32)
        if self.to_normal:
            image = np.clip((image - 127.5) / 127.5, -1.0, 1.0)
        return image

    def __getitem__(self, index):
        index, do_flip = self.resolve(index)
        path = self.image_paths[index]
        if self.cache:
            # the cv2 decode honors cache_in_ram like the load_image path
            # (ADVICE round 3: it used to be a silent no-op here); key is
            # namespaced — LAB arrays are not RGB load_image arrays
            from bbdm_tpu.data.base import cache_image

            image = cache_image(
                ("lab", path, tuple(self.image_size), do_flip, self.to_normal),
                lambda: self._decode_lab(path, do_flip))
        else:
            image = self._decode_lab(path, do_flip)
        L = image[..., 0:1]
        cond = np.repeat(L, 3, axis=-1)
        name = Path(path).stem
        return (image, name), (cond, name)


@Registers.datasets.register_with_name("custom_inpainting")
class CustomInpaintingDataset(_FlipDoubledPaths):
    """Random-box inpainting (reference `:152-206`): condition = image with a
    uniformly placed 128-180 px zero box (25-50% of a 256^2 image)."""

    def __init__(self, dataset_config, stage="train"):
        super().__init__(dataset_config, stage)
        self.mask_seed = 0

    def set_epoch_seed(self, seed: int):
        """Re-randomize mask draws per epoch while staying reproducible."""
        self.mask_seed = int(seed)

    def __getitem__(self, index):
        orig_index = index
        index, do_flip = self.resolve(index)
        path = self.image_paths[index]
        img = load_image(path, self.image_size, do_flip, self.to_normal,
                         cache=self.cache)

        h, w = self.image_size
        rng = np.random.RandomState((self.mask_seed * 1_000_003 + orig_index) % (2**31))
        mask_w = rng.randint(128, 181)
        mask_h = rng.randint(128, 181)
        pos_x = rng.randint(0, h - mask_h + 1)
        pos_y = rng.randint(0, w - mask_w + 1)
        mask = np.ones_like(img)
        mask[pos_x:pos_x + mask_h, pos_y:pos_y + mask_w, :] = 0.0
        cond = img * mask
        name = Path(path).stem
        return (img, name), (cond, name)
