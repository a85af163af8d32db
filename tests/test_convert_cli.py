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


def _taming_style_vqgan_ckpt(path):
    """Fabricate a full taming/LDM VQGAN TRAINING checkpoint: autoencoder at
    the root plus the adversarial loss stack under `loss.` (discriminator +
    LPIPS), the exact on-disk layout of released first-stage weights."""
    from tests.test_golden_gan import DISC_LAYERS, DISC_NDF, _import_reference_loss
    from tests.test_golden_vqgan import _build_reference_pieces

    VQLPIPSWithDiscriminator, saved, saved_mods = _import_reference_loss()
    try:
        torch.manual_seed(0)
        pieces = _build_reference_pieces()
        torch.manual_seed(11)
        loss_mod = VQLPIPSWithDiscriminator(
            disc_start=0, disc_num_layers=DISC_LAYERS, disc_in_channels=3,
            disc_ndf=DISC_NDF, use_actnorm=False, disc_loss="hinge")
    finally:
        from tests.test_golden_gan import _restore_modules

        for obj, name, val in saved:
            setattr(obj, name, val)
        _restore_modules(saved_mods)

    sd = {}
    for prefix, mod in zip(
            ("encoder", "decoder", "quantize", "quant_conv", "post_quant_conv"),
            pieces):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    for k, v in loss_mod.state_dict().items():
        sd[f"loss.{k}"] = v
    torch.save({"state_dict": sd}, path)
    return pieces, loss_mod


def test_vqgan_train_checkpoint_seeds_finetuning(tmp_path):
    """`vqgan-train` conversion: a full taming-layout ckpt becomes a
    VQGANRunner model_load_path plus an LPIPS weight file, with discriminator
    depth/norm inferred from the state_dict itself."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from bbdm_tpu.checkpoints.io import load_checkpoint
    from bbdm_tpu.checkpoints.torch_import import convert_discriminator_state_dict
    from bbdm_tpu.evaluation.lpips import convert_lpips_state_dict, load_lpips_params
    from bbdm_tpu.models.discriminator import NLayerDiscriminator
    from tests.test_golden_gan import DISC_LAYERS, DISC_NDF
    from tests.test_golden_vqgan import DD

    pth = tmp_path / "taming_style.ckpt"
    pieces, loss_mod = _taming_style_vqgan_ckpt(str(pth))
    out = tmp_path / "vqgan_train.ckpt"
    lp_out = tmp_path / "lpips_vgg.ckpt"

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_checkpoint.py"),
         "vqgan-train", "-i", str(pth), "-o", str(out),
         "--lpips-out", str(lp_out)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    states = load_checkpoint(str(out))
    assert states["step"] == 0 and states["epoch"] == 0  # fresh fine-tune
    assert set(states["model"]) == {"vqgan", "discriminator", "disc_stats"}
    # recorded geometry lets VQGANRunner validate the loss config at load
    assert states["disc_config"] == {
        "disc_num_layers": DISC_LAYERS, "use_actnorm": False,
        "disc_ndf": DISC_NDF}

    # discriminator tree identical to the direct converter with KNOWN
    # n_layers/use_actnorm — i.e. the inference from main.* indices is right
    want_disc, want_stats = convert_discriminator_state_dict(
        loss_mod.discriminator.state_dict(), n_layers=DISC_LAYERS,
        use_actnorm=False)
    flat_got = jax.tree_util.tree_leaves_with_path(states["model"]["discriminator"])
    flat_want = jax.tree_util.tree_leaves_with_path(want_disc)
    assert [p for p, _ in flat_got] == [p for p, _ in flat_want]
    for (_, a), (_, b) in zip(flat_got, flat_want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the converted trees load into the flax modules (structural contract)
    disc = NLayerDiscriminator(ndf=DISC_NDF, n_layers=DISC_LAYERS)
    x = jnp.zeros((1, DD["resolution"], DD["resolution"], 3))
    variables = disc.init(jax.random.PRNGKey(0), x, train=False)
    dp = serialization.from_state_dict(
        variables["params"], states["model"]["discriminator"])
    ds = serialization.from_state_dict(
        variables["batch_stats"], states["model"]["disc_stats"])
    logits = disc.apply({"params": dp, "batch_stats": ds}, x, train=False)
    assert logits.shape[0] == 1 and logits.shape[-1] == 1

    # LPIPS export loads through the normal loss.lpips_weights path
    lp = load_lpips_params(str(lp_out), net="vgg")
    want_lp = convert_lpips_state_dict(
        loss_mod.perceptual_loss.state_dict(), net="vgg")
    assert set(lp) == set(want_lp)
    for k in want_lp:
        np.testing.assert_array_equal(
            np.asarray(lp[k]["kernel"]), np.asarray(want_lp[k]["kernel"]))
