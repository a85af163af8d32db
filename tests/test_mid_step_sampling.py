"""Mid-step sampling path: trajectory dumps through the runner."""

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

import os

import numpy as np
from PIL import Image

from bbdm_tpu.registry import get_runner
from tests.test_integration import make_aligned_dataset, make_args, make_config


def test_sample_mid_step_dumps_trajectory(tmp_path):
    data = tmp_path / "data"
    make_aligned_dataset(str(data))
    cfg = make_config(tmp_path, data)
    cfg.testing.sample_mid_step = True
    cfg.args = make_args(tmp_path / "results", train=False, sample_to_eval=False)
    runner = get_runner("BBDMRunner", cfg)
    runner.test()

    base = os.path.join(runner.config.result.sample_path, "0", "test_sample")
    rev = os.path.join(base, "reverse_sample")
    one = os.path.join(base, "reverse_one_step_samples")
    assert os.path.exists(os.path.join(rev, "image_out.png"))
    assert os.path.exists(os.path.join(one, "image_out.png"))
    assert any(f.startswith("image_") for f in os.listdir(rev))
    # final grids still produced
    assert os.path.exists(os.path.join(base, "skip_sample.png"))
    img = Image.open(os.path.join(rev, "image_out.png"))
    assert img.size[0] > 8  # a grid, not a single image
