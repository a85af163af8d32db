"""LBBDM tests: frozen-VQGAN latent bridge, trainable mask, latent stats,
encode/decode round trip, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.models import build_model
from bbdm_tpu.models.latent import init_latent_stats


def lbbdm_config(condition_key="nocond", **model_over):
    unet_in = {"nocond": 3, "first_stage": 6, "SpatialRescaler": 6}[condition_key]
    d = {
        "model_name": "tiny-lbbdm", "model_type": "LBBDM",
        "latent_before_quant_conv": False, "normalize_latent": False,
        "only_load_latent_mean_std": False, "mixed_precision": False,
        "CondStageParams": {"n_stages": 1, "in_channels": 3, "out_channels": 3},
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
            "lr_scheduler": {"factor": 0.5, "patience": 10, "threshold": 1e-4,
                             "cooldown": 10, "min_lr": 1e-7},
            "params": {
                "mt_type": "linear", "objective": "grad", "loss_type": "l1",
                "skip_sample": True, "sample_type": "linear", "sample_step": 4,
                "num_timesteps": 20, "eta": 1.0, "max_var": 1.0,
                "UNetParams": {
                    "image_size": 8, "in_channels": unet_in, "model_channels": 32,
                    "out_channels": 3, "num_res_blocks": 1,
                    "attention_resolutions": (2,), "channel_mult": (1, 2),
                    "conv_resample": True, "dims": 2, "num_heads": 4,
                    "num_head_channels": 8, "use_scale_shift_norm": True,
                    "resblock_updown": True, "use_spatial_transformer": False,
                    "context_dim": None, "condition_key": condition_key,
                },
            },
        },
    }
    d.update(model_over)
    return dict2namespace(d)


@pytest.fixture(scope="module")
def lbbdm():
    m = build_model(lbbdm_config())
    params = m.init_params(jax.random.PRNGKey(0))
    return m, params


def _imgs(key, b=2):
    return jax.random.uniform(jax.random.PRNGKey(key), (b, 16, 16, 3)) * 2 - 1


def test_param_tree_structure(lbbdm):
    m, params = lbbdm
    assert set(params.keys()) == {"unet", "vqgan"}


def test_trainable_mask_freezes_vqgan(lbbdm):
    m, params = lbbdm
    mask = m.trainable_mask(params)
    assert all(jax.tree_util.tree_leaves(mask["unet"]))
    assert not any(jax.tree_util.tree_leaves(mask["vqgan"]))


def test_encode_shape_is_latent(lbbdm):
    m, params = lbbdm
    z = m.encode(params, _imgs(1))
    assert z.shape == (2, 8, 8, 3)  # 16/2 (one downsample), embed_dim 3


def test_encode_normalization(lbbdm):
    m, params = lbbdm
    x = _imgs(2)
    stats = init_latent_stats(3)
    stats = {**stats, "cond_latent_mean": stats["cond_latent_mean"] + 1.0,
             "cond_latent_std": stats["cond_latent_std"] * 2.0}
    z_raw = m.encode(params, x, cond=True, normalize=False)
    z_norm = m.encode(params, x, cond=True, normalize=True, latent_stats=stats)
    np.testing.assert_allclose(
        np.asarray(z_norm), (np.asarray(z_raw) - 1.0) / 2.0, rtol=1e-5, atol=1e-5)


def test_decode_roundtrip_shape(lbbdm):
    m, params = lbbdm
    z = m.encode(params, _imgs(3))
    img = m.decode(params, z, cond=False)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_loss_and_grads_skip_vqgan(lbbdm):
    m, params = lbbdm
    x, y = _imgs(4), _imgs(5)
    loss, _ = m.loss(params, jax.random.PRNGKey(1), x, y)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: m.loss(p, jax.random.PRNGKey(1), x, y)[0])(params)
    unet_g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["unet"]))
    vq_g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["vqgan"]))
    assert unet_g > 0
    assert vq_g == 0  # frozen first stage: gradients stopped


def test_sample_decodes_to_image_space(lbbdm):
    m, params = lbbdm
    y = _imgs(6)
    out = m.sample(params, jax.random.PRNGKey(2), y)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_first_stage_condition_key():
    m = build_model(lbbdm_config("first_stage"))
    params = m.init_params(jax.random.PRNGKey(0))
    x, y = _imgs(7), _imgs(8)
    loss, _ = m.loss(params, jax.random.PRNGKey(1), x, y)
    assert np.isfinite(float(loss))
    out = m.sample(params, jax.random.PRNGKey(2), y)
    assert out.shape == y.shape


def test_spatial_rescaler_condition_key():
    m = build_model(lbbdm_config("SpatialRescaler"))
    params = m.init_params(jax.random.PRNGKey(0))
    assert "cond_stage" in params
    mask = m.trainable_mask(params)
    assert all(jax.tree_util.tree_leaves(mask["cond_stage"]))
    x, y = _imgs(9), _imgs(10)
    loss, _ = m.loss(params, jax.random.PRNGKey(1), x, y)
    assert np.isfinite(float(loss))


def test_latent_before_quant_conv():
    m = build_model(lbbdm_config(latent_before_quant_conv=True))
    params = m.init_params(jax.random.PRNGKey(0))
    z = m.encode(params, _imgs(11))
    assert z.shape == (2, 8, 8, 3)  # z_channels == embed_dim == 3 here
    img = m.decode(params, z, cond=False)
    assert img.shape == (2, 16, 16, 3)


def test_sample_vqgan_roundtrip(lbbdm):
    m, params = lbbdm
    x = _imgs(12)
    rec = m.sample_vqgan(params, x)
    assert rec.shape == x.shape


def test_multi_sample_latent(lbbdm):
    m, params = lbbdm
    x_cond = _imgs(20)
    outs = m.sample(params, jax.random.PRNGKey(1), x_cond, num_samples=2)
    assert outs.shape == (2,) + x_cond.shape
    assert float(jnp.abs(outs[0] - outs[1]).max()) > 0
    assert bool(jnp.isfinite(outs).all())
