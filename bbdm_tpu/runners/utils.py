"""Runner utilities: result-dir layout (reference `runners/utils.py:21-32`)."""

from __future__ import annotations

import os
from datetime import datetime


def remove_file(fpath: str):
    if os.path.exists(fpath):
        os.remove(fpath)


def make_dir(d: str) -> str:
    os.makedirs(d, exist_ok=True)
    return d


def make_save_dirs(args, prefix: str, suffix: str | None = None, with_time: bool = False):
    """<result_path>/<dataset_name>/<model_name>/{image,log,checkpoint,samples,
    sample_to_eval} — same tree as the reference."""
    time_str = datetime.now().strftime("%Y-%m-%dT%H-%M-%S") if with_time else ""
    suffix = suffix if suffix is not None else ""
    result_path = make_dir(os.path.join(args.result_path, prefix, suffix, time_str))
    image_path = make_dir(os.path.join(result_path, "image"))
    log_path = make_dir(os.path.join(result_path, "log"))
    checkpoint_path = make_dir(os.path.join(result_path, "checkpoint"))
    sample_path = make_dir(os.path.join(result_path, "samples"))
    sample_to_eval_path = make_dir(os.path.join(result_path, "sample_to_eval"))
    return result_path, image_path, checkpoint_path, log_path, sample_path, sample_to_eval_path
