"""End-to-end integration: runner lifecycle on a synthetic custom_aligned set
(SURVEY.md §4 integration plan): train -> checkpoints -> resume -> sample_to_eval
directory contract."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')
import yaml
from PIL import Image

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.registry import get_runner


def make_aligned_dataset(root, n=8, size=8):
    rng = np.random.RandomState(0)
    for stage in ("train", "val", "test"):
        for side in ("A", "B"):
            d = os.path.join(root, f"{stage}/{side}")
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"img_{i:03d}.png"))


def make_config(tmp_path, dataset_path, **training_overrides):
    training = {
        "n_epochs": 2, "n_steps": 10000, "save_interval": 1,
        "sample_interval": 10, "validation_interval": 1,
        "accumulate_grad_batches": 2, "mesh_devices": 1,
    }
    training.update(training_overrides)
    return dict2namespace({
        "runner": "BBDMRunner",
        "training": training,
        "testing": {"clip_denoised": True, "sample_num": 2},
        "data": {
            "dataset_name": "synthetic",
            "dataset_type": "custom_aligned",
            "dataset_config": {
                "dataset_path": str(dataset_path), "image_size": 8,
                "channels": 3, "to_normal": True, "flip": False,
            },
            "train": {"batch_size": 8, "shuffle": True},
            "val": {"batch_size": 8, "shuffle": True},
            "test": {"batch_size": 8},
        },
        "model": {
            "model_name": "tiny-bbdm", "model_type": "BBDM",
            "latent_before_quant_conv": False, "normalize_latent": False,
            "only_load_latent_mean_std": False, "mixed_precision": False,
            "EMA": {"use_ema": True, "ema_decay": 0.9,
                    "update_ema_interval": 1, "start_ema_step": 2},
            "CondStageParams": {"n_stages": 1, "in_channels": 3, "out_channels": 3},
            "BB": {
                "optimizer": {"weight_decay": 0.0, "optimizer": "Adam",
                              "lr": 1e-3, "beta1": 0.9},
                "lr_scheduler": {"factor": 0.5, "patience": 100,
                                 "threshold": 1e-4, "cooldown": 100, "min_lr": 1e-7},
                "params": {
                    "mt_type": "linear", "objective": "grad", "loss_type": "l1",
                    "skip_sample": True, "sample_type": "linear", "sample_step": 4,
                    "num_timesteps": 20, "eta": 1.0, "max_var": 1.0,
                    "UNetParams": {
                        "image_size": 8, "in_channels": 6, "model_channels": 32,
                        "out_channels": 3, "num_res_blocks": 1,
                        "attention_resolutions": (2,), "channel_mult": (1, 2),
                        "conv_resample": True, "dims": 2, "num_heads": 4,
                        "num_head_channels": 8, "use_scale_shift_norm": True,
                        "resblock_updown": True, "use_spatial_transformer": False,
                        "context_dim": None, "condition_key": "SpatialRescaler",
                    },
                },
            },
        },
    })


def make_args(result_path, **kw):
    d = dict(
        train=True, sample_to_eval=False, sample_at_start=False, save_top=True,
        seed=123, result_path=str(result_path),
        resume_model=None, resume_optim=None, max_epoch=None, max_steps=None,
        gpu_ids="-1", port="0", config="",
    )
    d.update(kw)
    return dict2namespace(d)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    make_aligned_dataset(str(data))
    return root, data


def test_train_checkpoints_resume_and_eval(workdir):
    root, data = workdir
    cfg = make_config(root, data)
    cfg.args = make_args(root / "results")

    runner = get_runner("BBDMRunner", cfg)
    runner.train()

    ckpt_dir = runner.config.result.ckpt_path
    files = sorted(os.listdir(ckpt_dir))
    # retention: only the newest latest_* pair survives + last_* + top_*
    assert "latest_model_2.ckpt" in files
    assert "latest_model_1.ckpt" not in files
    assert "last_model.ckpt" in files and "last_optim_sche.ckpt" in files
    assert any(f.startswith("top_model_epoch_") for f in files)
    assert "config.yaml" in files
    # 2 epochs x (8 imgs / batch 8) = 2 microbatches
    assert runner.global_step == 2

    # TB event file exists and is non-trivial
    log_dir = runner.config.result.log_path
    events = [f for f in os.listdir(log_dir) if f.startswith("events.out.tfevents")]
    assert events

    # ---- resume: counters and params must round-trip exactly
    cfg2 = make_config(root, data)
    cfg2.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg2.model.optim_sche_load_path = os.path.join(ckpt_dir, "last_optim_sche.ckpt")
    cfg2.args = make_args(root / "results2")
    runner2 = get_runner("BBDMRunner", cfg2)
    assert runner2.global_step == 2
    assert runner2.global_epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(runner.state.params),
                    jax.tree_util.tree_leaves(runner2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(runner.state.ema_params),
                    jax.tree_util.tree_leaves(runner2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored
    for a, b in zip(jax.tree_util.tree_leaves(runner.state.opt_state),
                    jax.tree_util.tree_leaves(runner2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ---- sample_to_eval directory contract (reference BBDMRunner.py:224-253)
    cfg3 = make_config(root, data)
    cfg3.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg3.args = make_args(root / "results3", train=False, sample_to_eval=True)
    runner3 = get_runner("BBDMRunner", cfg3)
    runner3.test()
    eval_dir = runner3.config.result.sample_to_eval_path
    assert sorted(os.listdir(os.path.join(eval_dir, "condition")))[0].endswith(".png")
    assert sorted(os.listdir(os.path.join(eval_dir, "ground_truth")))[0].endswith(".png")
    step_dir = os.path.join(eval_dir, "4")  # named by sample_step
    names = sorted(os.listdir(step_dir))
    assert len(names) == 8  # all test images, per-image subdirs (sample_num=2)
    outputs = sorted(os.listdir(os.path.join(step_dir, names[0])))
    assert outputs == ["output_0.png", "output_1.png"]
    # images decode and have the right size
    img = Image.open(os.path.join(step_dir, names[0], "output_0.png"))
    assert img.size == (8, 8)


def test_single_batch_test_mode(workdir):
    root, data = workdir
    cfg = make_config(root, data)
    cfg.args = make_args(root / "results4", train=False, sample_to_eval=False)
    runner = get_runner("BBDMRunner", cfg)
    runner.test()
    sample_dir = os.path.join(runner.config.result.sample_path, "0", "test_sample")
    files = sorted(os.listdir(sample_dir))
    assert files == ["condition.png", "ground_truth.png", "skip_sample.png"]


def test_resume_across_fuse_small_leaves_mismatch_is_diagnosed(workdir):
    """A checkpoint written with per-leaf optimizer state must not silently
    mis-restore into a bucketed optimizer tree (training.fuse_small_leaves
    changes the opt-state structure) — the runner raises a ValueError naming
    the knob instead."""
    root, data = workdir
    cfg = make_config(root, data, n_epochs=1)
    cfg.args = make_args(root / "results_fuse_src")
    runner = get_runner("BBDMRunner", cfg)
    runner.train()
    ckpt_dir = runner.config.result.ckpt_path

    cfg2 = make_config(root, data, n_epochs=1, fuse_small_leaves=True)
    cfg2.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg2.model.optim_sche_load_path = os.path.join(ckpt_dir, "last_optim_sche.ckpt")
    cfg2.args = make_args(root / "results_fuse_dst")
    with pytest.raises(ValueError, match="fuse_small_leaves"):
        get_runner("BBDMRunner", cfg2)
