"""Dataset helpers (reference `datasets/utils.py:4-14`, `runners/utils.py:60-64`)."""

from __future__ import annotations

import os

from bbdm_tpu.registry import Registers


def get_image_paths_from_dir(fdir: str) -> list[str]:
    """Recursively collect file paths under fdir, sorted at each level
    (reference `datasets/utils.py:4-14`)."""
    flist = sorted(os.listdir(fdir))
    out = []
    for name in flist:
        fpath = os.path.join(fdir, name)
        if os.path.isdir(fpath):
            out.extend(get_image_paths_from_dir(fpath))
        else:
            out.append(fpath)
    return out


def get_dataset(data_config):
    """(train, val, test) datasets from the registry (reference `runners/utils.py:60-64`)."""
    cls = Registers.datasets[data_config.dataset_type]
    train = cls(data_config.dataset_config, stage="train")
    val = cls(data_config.dataset_config, stage="val")
    test = cls(data_config.dataset_config, stage="test")
    return train, val, test
