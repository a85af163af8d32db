"""In-framework VQGAN training: GAN step mechanics + runner lifecycle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.models.discriminator import ActNorm, NLayerDiscriminator
from bbdm_tpu.models.gan_losses import adopt_weight, hinge_d_loss, vanilla_d_loss
from bbdm_tpu.models.vqgan import VQModel
from bbdm_tpu.training.gan import GANTrainState, make_vqgan_train_step


def _vq_cfg():
    return dict2namespace({
        "embed_dim": 3, "n_embed": 32,
        "ddconfig": {
            "double_z": False, "z_channels": 3, "resolution": 16,
            "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": (1, 2),
            "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0,
        },
    })


class TestLossPieces:
    def test_hinge_loss_perfect_disc(self):
        real = jnp.full((2, 4, 4, 1), 5.0)
        fake = jnp.full((2, 4, 4, 1), -5.0)
        assert float(hinge_d_loss(real, fake)) == 0.0
        # fooled discriminator pays
        assert float(hinge_d_loss(fake, real)) > 0

    def test_vanilla_loss_finite(self):
        real = jnp.zeros((2, 4, 4, 1))
        fake = jnp.zeros((2, 4, 4, 1))
        assert float(vanilla_d_loss(real, fake)) == pytest.approx(
            float(jnp.log(2.0)), rel=1e-5)

    def test_adopt_weight_gates(self):
        assert float(adopt_weight(1.0, jnp.asarray(10), threshold=100)) == 0.0
        assert float(adopt_weight(1.0, jnp.asarray(200), threshold=100)) == 1.0


class TestDiscriminator:
    def test_patch_logits_shape(self):
        disc = NLayerDiscriminator(ndf=16, n_layers=2)
        x = jnp.zeros((2, 32, 32, 3))
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        out = disc.apply(variables, x, train=False)
        assert out.shape[0] == 2 and out.shape[-1] == 1
        assert out.shape[1] < 32  # patch-level logits

    def test_batchnorm_stats_update(self):
        disc = NLayerDiscriminator(ndf=16, n_layers=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        _, updated = disc.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(updated["batch_stats"])
        assert any(float(jnp.abs(a - b).sum()) > 0 for a, b in zip(before, after))

    def test_actnorm_data_dependent_init(self):
        an = ActNorm()
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 6)) * 3.0 + 1.0
        variables = an.init(jax.random.PRNGKey(0), x)
        out = an.apply(variables, x)
        np.testing.assert_allclose(float(out.mean()), 0.0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out.std(axis=(0, 1, 2))), 1.0, atol=1e-3)


class TestGANStep:
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_both_players_update(self, adaptive):
        vq = VQModel.from_config(_vq_cfg(), dtype=jnp.float32)
        disc = NLayerDiscriminator(ndf=16, n_layers=2)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2 - 1
        vq_vars = vq.init(jax.random.PRNGKey(1), x)
        d_vars = disc.init(jax.random.PRNGKey(2), x, train=False)
        gen_tx = optax.adam(1e-3)
        disc_tx = optax.adam(1e-3)
        loss_cfg = dict2namespace({
            "disc_start": 0, "disc_factor": 1.0, "disc_weight": 0.5,
            "codebook_weight": 1.0, "perceptual_weight": 0.0,
            "disc_loss": "hinge", "adaptive_disc_weight": adaptive,
            "use_actnorm": False,
        })
        step = jax.jit(make_vqgan_train_step(vq, disc, gen_tx, disc_tx, loss_cfg))
        state = GANTrainState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=vq_vars["params"], disc_params=d_vars["params"],
            gen_opt=gen_tx.init(vq_vars["params"]),
            disc_opt=disc_tx.init(d_vars["params"]),
            disc_stats=d_vars["batch_stats"],
        )
        new_state, metrics = step(state, x, jax.random.PRNGKey(3))
        for k in ("loss", "d_loss", "nll", "g_loss", "q_loss", "d_weight"):
            assert np.isfinite(float(metrics[k])), k
        g_moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(new_state.gen_params),
            jax.tree_util.tree_leaves(state.gen_params)))
        d_moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(new_state.disc_params),
            jax.tree_util.tree_leaves(state.disc_params)))
        assert g_moved > 0 and d_moved > 0
        if adaptive:
            assert float(metrics["d_weight"]) >= 0

    def test_disc_gated_before_start(self):
        vq = VQModel.from_config(_vq_cfg(), dtype=jnp.float32)
        disc = NLayerDiscriminator(ndf=16, n_layers=2)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2 - 1
        vq_vars = vq.init(jax.random.PRNGKey(1), x)
        d_vars = disc.init(jax.random.PRNGKey(2), x, train=False)
        gen_tx, disc_tx = optax.adam(1e-3), optax.adam(1e-3)
        loss_cfg = dict2namespace({
            "disc_start": 1000, "disc_weight": 0.5, "codebook_weight": 1.0,
            "perceptual_weight": 0.0, "disc_loss": "hinge",
            "adaptive_disc_weight": False, "use_actnorm": False,
        })
        step = jax.jit(make_vqgan_train_step(vq, disc, gen_tx, disc_tx, loss_cfg))
        state = GANTrainState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=vq_vars["params"], disc_params=d_vars["params"],
            gen_opt=gen_tx.init(vq_vars["params"]),
            disc_opt=disc_tx.init(d_vars["params"]),
            disc_stats=d_vars["batch_stats"],
        )
        _, metrics = step(state, x, jax.random.PRNGKey(3))
        assert float(metrics["d_loss"]) == 0.0  # disc_factor gated to 0


def make_single_image_dataset(data, n=8, size=16):
    from PIL import Image

    rs = np.random.RandomState(0)
    for stage in ("train", "val", "test"):
        d = os.path.join(str(data), stage)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            Image.fromarray(rs.randint(0, 255, (size, size, 3), np.uint8)).save(
                os.path.join(d, f"img_{i}.png"))


def make_vqgan_config(result_root, data, *, mesh_devices=1, batch_size=8,
                      sample_interval=10, **training_overrides):
    """Tiny VQGANRunner config (shared with the 2-process multihost worker)."""
    training = {"n_epochs": 1, "n_steps": 100, "save_interval": 1,
                "sample_interval": sample_interval, "validation_interval": 1,
                "accumulate_grad_batches": 1, "mesh_devices": mesh_devices}
    training.update(training_overrides)
    return dict2namespace({
        "runner": "VQGANRunner",
        "training": training,
        "testing": {"clip_denoised": False, "sample_num": 1},
        "data": {
            "dataset_name": "syn", "dataset_type": "custom_single",
            "dataset_config": {"dataset_path": str(data), "image_size": 16,
                               "channels": 3, "to_normal": True, "flip": False},
            "train": {"batch_size": batch_size, "shuffle": True},
            "val": {"batch_size": batch_size, "shuffle": True},
            "test": {"batch_size": batch_size},
        },
        "model": {
            "model_name": "vq-tiny", "model_type": "VQGAN",
            "VQGAN": {"params": {
                "embed_dim": 3, "n_embed": 32,
                "ddconfig": {"double_z": False, "z_channels": 3, "resolution": 16,
                             "in_channels": 3, "out_ch": 3, "ch": 32,
                             "ch_mult": (1, 2), "num_res_blocks": 1,
                             "attn_resolutions": [], "dropout": 0.0}}},
            "loss": {"disc_start": 0, "disc_weight": 0.5, "codebook_weight": 1.0,
                     "perceptual_weight": 0.0, "disc_loss": "hinge",
                     "adaptive_disc_weight": False, "use_actnorm": False,
                     "disc_ndf": 16, "disc_num_layers": 2},
            "optimizer": {"lr": 1e-4, "beta1": 0.5},
        },
        "args": dict2namespace({
            "train": True, "sample_to_eval": False, "sample_at_start": False,
            "save_top": False, "seed": 1,
            "result_path": str(result_root),
            "resume_model": None, "resume_optim": None,
            "max_epoch": None, "max_steps": None, "gpu_ids": "-1",
            "port": "0", "config": ""}),
    })


def test_vqgan_runner_lifecycle(tmp_path):
    """1-epoch train -> ckpt -> resume -> sample_to_eval reconstructions."""
    from bbdm_tpu.registry import get_runner

    data = tmp_path / "data"
    make_single_image_dataset(data)
    cfg = make_vqgan_config(tmp_path / "results", data)

    runner = get_runner("VQGANRunner", cfg)
    runner.train()
    ckpt = os.path.join(runner.config.result.ckpt_path, "last_model.ckpt")
    assert os.path.exists(ckpt)

    cfg2 = cfg.clone()
    cfg2.model.model_load_path = ckpt
    cfg2.args.train = False
    cfg2.args.sample_to_eval = True
    cfg2.args.result_path = str(tmp_path / "results2")
    runner2 = get_runner("VQGANRunner", cfg2)
    assert runner2.global_step == runner.global_step
    runner2.test()
    rec = os.path.join(runner2.config.result.sample_to_eval_path, "reconstruction")
    assert len(os.listdir(rec)) == 8
