"""End-to-end checkpoint interop: a reference-format torch .pth (model + EMA
shadow + counters, the exact content contract of reference
`runners/BaseRunner.py:140-170`) goes through `scripts/convert_checkpoint.py`
and resumes in our runner — counters restored, EMA distinct from raw params,
sampling runs.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

torch = pytest.importorskip("torch")

from bbdm_tpu.config import namespace2dict  # noqa: E402
from bbdm_tpu.registry import get_runner  # noqa: E402
from tests.test_integration import make_aligned_dataset, make_args, make_config  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reference_style_ckpt(path):
    sys.path.insert(0, "/root/reference")
    from model.BrownianBridge.base.modules.diffusionmodules.openaimodel import (
        UNetModel as TorchUNet,
    )

    torch.manual_seed(0)
    net = TorchUNet(
        image_size=8, in_channels=6, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        conv_resample=True, dims=2, num_heads=4, num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True,
        use_spatial_transformer=False, condition_key="concat",
    )
    model_sd = {f"denoise_fn.{k}": v for k, v in net.state_dict().items()}
    # EMA shadow: same keys over parameters, shifted values (reference
    # EMA.register over named_parameters, runners/base/EMA.py:10-14)
    ema_sd = {f"denoise_fn.{k}": v + 0.5 for k, v in net.named_parameters()}
    torch.save({"model": model_sd, "ema": ema_sd, "epoch": 3, "step": 42}, path)
    return net


def test_reference_checkpoint_resumes_through_cli(tmp_path):
    data = tmp_path / "data"
    make_aligned_dataset(str(data))
    cfg = make_config(tmp_path, data)
    # the converter CLI reads the model schema from a YAML config
    import yaml

    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(namespace2dict(cfg), f)

    pth = tmp_path / "reference_last_model.pth"
    _reference_style_ckpt(str(pth))
    out = tmp_path / "converted.ckpt"

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_checkpoint.py"),
         "bbdm", "-c", str(cfg_path), "-i", str(pth), "-o", str(out)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()

    cfg.args = make_args(tmp_path / "results", train=False, sample_to_eval=True,
                         resume_model=str(out))
    cfg.model.model_load_path = str(out)  # what apply_cli_overrides does
    runner = get_runner("BBDMRunner", cfg)
    # counters restored (reference load_model_from_checkpoint :115-118)
    assert runner.global_epoch == 3
    assert runner.global_step == 42
    # EMA shadow is the shifted copy, distinct from the raw params
    p = np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree_util.tree_leaves(runner.state.params)])
    e = np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree_util.tree_leaves(runner.state.ema_params)])
    assert np.abs(e - p).max() > 0.4

    runner.test()  # sample_to_eval sweep with the converted weights
    eval_dir = os.path.join(runner.config.result.sample_to_eval_path)
    assert os.path.isdir(os.path.join(eval_dir, "condition"))
    assert os.path.isdir(os.path.join(eval_dir, "ground_truth"))
