"""Runner-level LBBDM lifecycle (the flagship config path): the latent
mean/std dataset pass with normalize_latent, latent-stat checkpoint extras
(reference BBDMRunner.py:70-83), resume restoring the stats instead of
recomputing (reference `:39-47`), only_load_latent_mean_std, and the
sample_to_eval directory contract through the VQGAN decode."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.registry import get_runner
from tests.test_integration import make_aligned_dataset, make_args


def make_lbbdm_config(tmp_path, dataset_path, **model_over):
    d = {
        "runner": "BBDMRunner",
        "training": {
            "n_epochs": 2, "n_steps": 10000, "save_interval": 1,
            "sample_interval": 10, "validation_interval": 1,
            "accumulate_grad_batches": 1, "mesh_devices": 1,
        },
        "testing": {"clip_denoised": False, "sample_num": 1},
        "data": {
            "dataset_name": "synthetic",
            "dataset_type": "custom_aligned",
            "dataset_config": {
                "dataset_path": str(dataset_path), "image_size": 16,
                "channels": 3, "to_normal": True, "flip": False,
            },
            "train": {"batch_size": 4, "shuffle": True},
            "val": {"batch_size": 4, "shuffle": True},
            "test": {"batch_size": 4},
        },
        "model": {
            "model_name": "tiny-lbbdm", "model_type": "LBBDM",
            "latent_before_quant_conv": False, "normalize_latent": True,
            "only_load_latent_mean_std": False, "mixed_precision": False,
            "EMA": {"use_ema": True, "ema_decay": 0.9,
                    "update_ema_interval": 1, "start_ema_step": 0},
            "CondStageParams": {"n_stages": 1, "in_channels": 3,
                                "out_channels": 3},
            "VQGAN": {"params": {
                "ckpt_path": None, "embed_dim": 3, "n_embed": 32,
                "ddconfig": {
                    "double_z": False, "z_channels": 3, "resolution": 16,
                    "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": (1, 2),
                    "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0,
                },
            }},
            "BB": {
                "optimizer": {"weight_decay": 0.0, "optimizer": "Adam",
                              "lr": 1e-3, "beta1": 0.9},
                "lr_scheduler": {"factor": 0.5, "patience": 100,
                                 "threshold": 1e-4, "cooldown": 100,
                                 "min_lr": 1e-7},
                "params": {
                    "mt_type": "linear", "objective": "grad", "loss_type": "l1",
                    "skip_sample": True, "sample_type": "linear",
                    "sample_step": 3, "num_timesteps": 20, "eta": 1.0,
                    "max_var": 1.0,
                    "UNetParams": {
                        "image_size": 8, "in_channels": 3, "out_channels": 3,
                        "model_channels": 32, "num_res_blocks": 1,
                        "attention_resolutions": (2,), "channel_mult": (1, 2),
                        "conv_resample": True, "dims": 2, "num_heads": 4,
                        "num_head_channels": 8, "use_scale_shift_norm": True,
                        "resblock_updown": True,
                        "use_spatial_transformer": False, "context_dim": None,
                        "condition_key": "nocond",
                    },
                },
            },
        },
    }
    for k, v in model_over.items():
        d["model"][k] = v
    return dict2namespace(d)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lbbdm_e2e")
    data = root / "data"
    make_aligned_dataset(str(data), n=8, size=16)
    return root, data


def _stats_of(runner):
    return {k: np.asarray(v) for k, v in runner.state.latent_stats.items()}


def test_lbbdm_latent_stats_train_resume_eval(workdir):
    root, data = workdir
    cfg = make_lbbdm_config(root, data)
    cfg.args = make_args(root / "results")

    runner = get_runner("BBDMRunner", cfg)
    # normalize_latent computed a REAL dataset pass before training: std must
    # differ from the identity-init value 1 (reference BBDMRunner.py:85-162)
    stats = _stats_of(runner)
    assert stats["ori_latent_std"].shape[-1] == 3
    assert float(np.abs(stats["ori_latent_std"] - 1.0).max()) > 1e-3
    assert float(np.abs(stats["cond_latent_mean"]).max()) > 0

    runner.train()
    ckpt_dir = runner.config.result.ckpt_path
    files = sorted(os.listdir(ckpt_dir))
    assert "last_model.ckpt" in files

    # checkpoint carries the 4 latent-stat arrays (reference `:70-83`)
    from bbdm_tpu.checkpoints.io import load_checkpoint

    states = load_checkpoint(os.path.join(ckpt_dir, "last_model.ckpt"))
    for k in ("ori_latent_mean", "ori_latent_std",
              "cond_latent_mean", "cond_latent_std"):
        np.testing.assert_allclose(np.asarray(states[k]), stats[k], rtol=1e-6)

    # resume: stats restored from the checkpoint, not recomputed
    cfg2 = make_lbbdm_config(root, data)
    cfg2.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg2.model.optim_sche_load_path = os.path.join(
        ckpt_dir, "last_optim_sche.ckpt")
    cfg2.args = make_args(root / "results2")
    runner2 = get_runner("BBDMRunner", cfg2)
    for k, v in _stats_of(runner2).items():
        np.testing.assert_array_equal(v, stats[k])
    assert runner2.global_step == runner.global_step

    # only_load_latent_mean_std: stats come from the ckpt, weights stay fresh
    cfg3 = make_lbbdm_config(root, data, only_load_latent_mean_std=True)
    cfg3.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg3.args = make_args(root / "results3")
    runner3 = get_runner("BBDMRunner", cfg3)
    for k, v in _stats_of(runner3).items():
        np.testing.assert_array_equal(v, stats[k])
    assert runner3.global_step == 0  # counters NOT loaded

    # sample_to_eval contract through encode -> bridge -> VQGAN decode
    cfg4 = make_lbbdm_config(root, data)
    cfg4.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg4.args = make_args(root / "results4", train=False, sample_to_eval=True)
    runner4 = get_runner("BBDMRunner", cfg4)
    runner4.test()
    eval_dir = runner4.config.result.sample_to_eval_path
    subdirs = sorted(os.listdir(eval_dir))
    assert "condition" in subdirs and "ground_truth" in subdirs
    step_dir = str(cfg4.model.BB.params.sample_step)
    assert step_dir in subdirs
    outs = os.listdir(os.path.join(eval_dir, step_dir))
    assert len(outs) == 8  # one output png per test image
