"""GumbelQuantize / GumbelVQ variant (reference `model/VQGAN/quantize.py:110-211`,
`model/VQGAN/vqgan.py:280-382`)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.models.discriminator import NLayerDiscriminator
from bbdm_tpu.models.vqgan import GumbelQuantize, VQModel
from bbdm_tpu.training.gan import GANTrainState, make_vqgan_train_step


def _gumbel_cfg():
    return dict2namespace({
        "embed_dim": 3, "n_embed": 32, "quantizer": "gumbel", "kl_weight": 5e-4,
        "ddconfig": {
            "double_z": False, "z_channels": 3, "resolution": 16,
            "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": (1, 2),
            "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0,
        },
    })


class TestGumbelQuantize:
    def test_eval_is_deterministic_hard_assignment(self):
        q = GumbelQuantize(n_e=16, e_dim=4)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        variables = q.init(jax.random.PRNGKey(1), z)
        zq1, loss1, idx1 = q.apply(variables, z)
        zq2, _, idx2 = q.apply(variables, z)
        np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
        np.testing.assert_array_equal(np.asarray(zq1), np.asarray(zq2))
        # hard: every output vector is exactly a codebook row
        cb = np.asarray(variables["params"]["embedding"])
        np.testing.assert_allclose(
            np.asarray(zq1).reshape(-1, 4), cb[np.asarray(idx1).reshape(-1)],
            rtol=1e-6)
        assert np.isfinite(float(loss1))

    def test_train_gradients_reach_proj_and_codebook(self):
        q = GumbelQuantize(n_e=16, e_dim=4)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        variables = q.init(jax.random.PRNGKey(1), z)

        def loss_fn(params):
            zq, kl, _ = q.apply({"params": params}, z, temp=1.0, train=True,
                                rngs={"gumbel": jax.random.PRNGKey(2)})
            return (zq**2).mean() + kl

        grads = jax.grad(loss_fn)(variables["params"])
        assert float(jnp.abs(grads["proj"]["kernel"]).sum()) > 0
        assert float(jnp.abs(grads["embedding"]).sum()) > 0

    def test_kl_zero_for_uniform_logits(self):
        # uniform q -> KL(q || uniform) == 0
        q = GumbelQuantize(n_e=8, e_dim=2, kl_weight=1.0)
        z = jnp.zeros((1, 4, 4, 2))
        variables = q.init(jax.random.PRNGKey(0), z)
        params = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
        _, kl, _ = q.apply({"params": params}, z)
        assert abs(float(kl)) < 1e-5

    def test_temperature_sharpens(self):
        q = GumbelQuantize(n_e=16, e_dim=4, straight_through=False)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
        variables = q.init(jax.random.PRNGKey(1), z)
        # straight_through=False in train mode returns the soft mixture: at a
        # low temperature it must be closer to the hard assignment
        rngs = {"gumbel": jax.random.PRNGKey(2)}
        soft_hi, _, _ = q.apply(variables, z, temp=10.0, train=True, rngs=rngs)
        soft_lo, _, _ = q.apply(variables, z, temp=0.01, train=True, rngs=rngs)
        hard, _, _ = q.apply(variables, z)  # eval path != same noise; compare dists
        cb = np.asarray(variables["params"]["embedding"])

        def min_dist_to_codebook(x):
            flat = np.asarray(x).reshape(-1, 4)
            d = ((flat[:, None, :] - cb[None]) ** 2).sum(-1).min(1)
            return d.mean()

        assert min_dist_to_codebook(soft_lo) < min_dist_to_codebook(soft_hi)


class TestGumbelVQModel:
    def test_roundtrip_and_quantizer_selection(self):
        vq = VQModel.from_config(_gumbel_cfg(), dtype=jnp.float32)
        assert vq.quantizer_type == "gumbel"
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2 - 1
        variables = vq.init(jax.random.PRNGKey(1), x)
        xrec, qloss = vq.apply(variables, x)
        assert xrec.shape == x.shape
        assert np.isfinite(float(qloss))

    def test_unknown_quantizer_raises(self):
        cfg = _gumbel_cfg()
        cfg.quantizer = "bogus"
        vq = VQModel.from_config(cfg, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 3))
        with pytest.raises(ValueError, match="quantizer_type"):
            vq.init(jax.random.PRNGKey(0), x)


class TestGumbelGANStep:
    def test_train_step_anneals_temperature(self):
        vq = VQModel.from_config(_gumbel_cfg(), dtype=jnp.float32)
        disc = NLayerDiscriminator(ndf=16, n_layers=2)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2 - 1
        vq_vars = vq.init(jax.random.PRNGKey(1), x)
        d_vars = disc.init(jax.random.PRNGKey(2), x, train=False)
        gen_tx, disc_tx = optax.adam(1e-3), optax.adam(1e-3)
        loss_cfg = dict2namespace({
            "disc_start": 0, "disc_factor": 1.0, "disc_weight": 0.5,
            "codebook_weight": 1.0, "perceptual_weight": 0.0,
            "disc_loss": "hinge", "adaptive_disc_weight": False,
            "use_actnorm": False,
            "temperature_scheduler": {
                "temp_init": 1.0, "temp_min": 0.1, "anneal_rate": 0.1,
            },
        })
        step = jax.jit(make_vqgan_train_step(vq, disc, gen_tx, disc_tx, loss_cfg))
        state = GANTrainState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=vq_vars["params"], disc_params=d_vars["params"],
            gen_opt=gen_tx.init(vq_vars["params"]),
            disc_opt=disc_tx.init(d_vars["params"]),
            disc_stats=d_vars["batch_stats"],
        )
        temps = []
        for i in range(3):
            state, metrics = step(state, x, jax.random.PRNGKey(10 + i))
            assert np.isfinite(float(metrics["loss"]))
            temps.append(float(metrics["temperature"]))
        assert temps[0] > temps[1] > temps[2]  # exponential anneal
        assert temps[0] == pytest.approx(1.0 * np.exp(-0.1), rel=1e-5)


def test_gumbel_vqgan_runner_lifecycle(tmp_path):
    """GumbelVQ through the full VQGANRunner lifecycle: train (temperature
    anneal) -> checkpoint -> resume -> reconstruction sweep."""
    import os

    from PIL import Image

    from bbdm_tpu.registry import get_runner

    data = tmp_path / "data"
    rs = np.random.RandomState(0)
    for stage in ("train", "val", "test"):
        d = data / stage
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(rs.randint(0, 255, (16, 16, 3), "uint8")).save(
                d / f"img_{i}.png")

    cfg = dict2namespace({
        "runner": "VQGANRunner",
        "training": {"n_epochs": 1, "n_steps": 100, "save_interval": 1,
                     "sample_interval": 10, "validation_interval": 1,
                     "accumulate_grad_batches": 1, "mesh_devices": 1},
        "testing": {"clip_denoised": False, "sample_num": 1},
        "data": {
            "dataset_name": "syn", "dataset_type": "custom_single",
            "dataset_config": {"dataset_path": str(data), "image_size": 16,
                               "channels": 3, "to_normal": True, "flip": False},
            "train": {"batch_size": 8, "shuffle": True},
            "val": {"batch_size": 8, "shuffle": True},
            "test": {"batch_size": 8},
        },
        "model": {
            "model_name": "gumbel-tiny", "model_type": "VQGAN",
            "VQGAN": {"params": {
                "embed_dim": 3, "n_embed": 32, "quantizer": "gumbel",
                "kl_weight": 5e-4,
                "ddconfig": {"double_z": False, "z_channels": 3, "resolution": 16,
                             "in_channels": 3, "out_ch": 3, "ch": 32,
                             "ch_mult": (1, 2), "num_res_blocks": 1,
                             "attn_resolutions": [], "dropout": 0.0}}},
            "loss": {"disc_start": 0, "disc_weight": 0.5, "codebook_weight": 1.0,
                     "perceptual_weight": 0.0, "disc_loss": "hinge",
                     "adaptive_disc_weight": False, "use_actnorm": False,
                     "disc_ndf": 16, "disc_num_layers": 2,
                     "temperature_scheduler": {"temp_init": 1.0, "temp_min": 0.5,
                                               "anneal_rate": 1e-3}},
            "optimizer": {"lr": 1e-4, "beta1": 0.5},
        },
        "args": dict2namespace({
            "train": True, "sample_to_eval": False, "sample_at_start": False,
            "save_top": False, "seed": 1, "result_path": str(tmp_path / "results"),
            "resume_model": None, "resume_optim": None,
            "max_epoch": None, "max_steps": None, "gpu_ids": "-1",
            "port": "0", "config": ""}),
    })

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
    runner2.test()
