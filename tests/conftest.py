"""Test config: force the CPU backend with 8 fake devices.

Distributed tests exercise mesh sharding on a virtual 8-device CPU mesh
(SURVEY.md §4); model tests run tiny shapes so the single host core copes.
NOTE: must run before jax initializes a backend — conftest import order
guarantees that under pytest.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8 fake devices share 1 real core here: replicas reach a collective
    # rendezvous serially, so stretch the abort timeout way out.
    + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    + " --xla_cpu_collective_timeout_seconds=600"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def tiny_bbdm_config(**overrides):
    """A minimal pixel-BBDM config tree for tests."""
    from bbdm_tpu.config import dict2namespace

    base = {
        "model_name": "tiny",
        "model_type": "BBDM",
        "mixed_precision": False,
        "BB": {
            "optimizer": {
                "weight_decay": 0.0, "optimizer": "Adam", "lr": 1.0e-4, "beta1": 0.9,
            },
            "lr_scheduler": {
                "factor": 0.5, "patience": 10, "threshold": 1e-4,
                "cooldown": 10, "min_lr": 5e-7,
            },
            "params": {
                "mt_type": "linear", "objective": "grad", "loss_type": "l1",
                "skip_sample": True, "sample_type": "linear", "sample_step": 6,
                "num_timesteps": 50, "eta": 1.0, "max_var": 1.0,
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
    }

    def deep_update(d, u):
        for k, v in u.items():
            if isinstance(v, dict) and isinstance(d.get(k), dict):
                deep_update(d[k], v)
            else:
                d[k] = v
        return d

    return dict2namespace(deep_update(base, overrides))


@pytest.fixture
def bbdm_config():
    return tiny_bbdm_config()
