"""Data layer: registered dataset types + per-host sharded prefetching loader."""

from bbdm_tpu.data import custom  # noqa: F401  (registration side effects)
from bbdm_tpu.data.base import ImagePathDataset  # noqa: F401
from bbdm_tpu.data.loader import DataLoader  # noqa: F401
from bbdm_tpu.data.utils import get_dataset, get_image_paths_from_dir  # noqa: F401
