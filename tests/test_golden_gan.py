"""Golden gradient parity for the VQGAN adversarial loss stack vs the LIVE
reference `model/VQGAN/vqperceptual.py` (VQLPIPSWithDiscriminator).

The in-framework VQGAN training (training/gan.py — a capability the reference
declares but never drives, `model/VQGAN/vqgan.py:102-150`) reuses the
reference's loss math: nll(+LPIPS) + adaptive d_weight * disc_factor * g_loss
+ codebook term for the generator (`vqperceptual.py:92-119`), hinge/vanilla
patch-logit losses for the discriminator (`:121-137`), and the two truncated
backward passes of `calculate_adaptive_weight` (`:64-75`). These tests run
the reference module itself on CPU with identical converted weights and
compare losses, the adaptive d_weight, and d loss/d params leaf-by-leaf for
BOTH players.

Offline provisioning: the reference LPIPS wants a torchvision VGG16 download
(`lpips.py:42-50`) — we patch `torchvision.models.vgg16` to a seeded random
init (exactly the random-backbone strategy of test_golden_metrics) and point
`get_ckpt_path` at the repo's vendored linear-head weights
(`model/VQGAN/taming/modules/autoencoder/lpips/vgg.pth`), so the comparison
exercises the REAL reference code path end-to-end.

Mode semantics under comparison (documented design choice of training/gan.py):
the generator pass evaluates the discriminator with frozen normalization
(torch .eval() / our train=False), the discriminator pass trains it
(batch-stat BatchNorm / ActNorm). BatchNorm RUNNING-stat updates are not
compared: torch accumulates the unbiased batch variance, flax the biased one —
gradients and normalization are unaffected.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.checkpoints.torch_import import (  # noqa: E402
    convert_discriminator_state_dict,
    convert_vqgan_state_dict,
)
from bbdm_tpu.config import dict2namespace  # noqa: E402
from bbdm_tpu.evaluation.lpips import convert_lpips_state_dict  # noqa: E402
from bbdm_tpu.models.discriminator import NLayerDiscriminator  # noqa: E402
from bbdm_tpu.models.vqgan import VQModel  # noqa: E402
from bbdm_tpu.training.gan import make_vqgan_losses  # noqa: E402
from tests.test_golden_vqgan import (  # noqa: E402
    DD,
    EMBED_DIM,
    N_EMBED,
    _build_reference_pieces,
    _converted_params,
)

pytestmark = pytest.mark.slow

REF = "/root/reference"
VENDORED_LPIPS_HEADS = (
    REF + "/model/VQGAN/taming/modules/autoencoder/lpips/vgg.pth")

DISC_LAYERS = 2
DISC_NDF = 16
DISC_WEIGHT = 0.8
CODEBOOK_WEIGHT = 1.0
PERCEPTUAL_WEIGHT = 1.0
STEP = 5  # > disc_start=0 so the adversarial terms are live


def _install_torchvision_stub():
    """torchvision is not installed here; the reference only touches it for
    `models.vgg16(pretrained=...).features` (lpips.py:121-123) and the
    make_grid/save_image/transforms names imported (unused by us) through
    `runners/utils.py` and `datasets/`. Provide exactly that surface, with a
    SEEDED random VGG16 backbone — the random-backbone strategy of
    test_golden_metrics; the vendored linear heads stay real."""
    import types

    import torch.nn as nn

    from tests.torch_mirrors import _feature_layer

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(7)
            self.features = nn.Sequential(
                *[_feature_layer("vgg", i) for i in range(31)])

    tv = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")
    models_mod.vgg16 = lambda *a, **kw: _VGG()
    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod.make_grid = None
    utils_mod.save_image = None
    transforms_mod = types.ModuleType("torchvision.transforms")
    tv.models, tv.utils, tv.transforms = models_mod, utils_mod, transforms_mod
    mods = {"torchvision": tv, "torchvision.models": models_mod,
            "torchvision.utils": utils_mod,
            "torchvision.transforms": transforms_mod}
    import importlib.machinery

    for name, mod in mods.items():
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    tv.__path__ = []

    # The reference's `datasets/` has no __init__.py, so the installed
    # HuggingFace `datasets` regular package shadows it regardless of sys.path
    # order. Install an explicit package module whose __path__ points at the
    # reference dir so `from datasets.custom import ...` (runners/utils.py:8)
    # resolves to the reference sources.
    ds = types.ModuleType("datasets")
    ds.__path__ = [REF + "/datasets"]
    ds.__spec__ = importlib.machinery.ModuleSpec(
        "datasets", None, is_package=True)
    ds.__spec__.submodule_search_locations = ds.__path__
    mods["datasets"] = ds
    saved = {k: sys.modules.get(k) for k in mods}
    # submodules loaded under the shadowed package must be evicted on restore
    for sub in ("custom", "base", "utils"):
        saved.setdefault(f"datasets.{sub}", sys.modules.get(f"datasets.{sub}"))
        sys.modules.pop(f"datasets.{sub}", None)
    sys.modules.update(mods)
    return saved


def _import_reference_loss():
    """Import VQLPIPSWithDiscriminator with offline weight provisioning."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    saved_mods = _install_torchvision_stub()
    try:
        import model.VQGAN.lpips as ref_lpips

        patched = [(ref_lpips, "get_ckpt_path",
                    lambda *a, **k: VENDORED_LPIPS_HEADS)]
        saved = [(obj, name, getattr(obj, name)) for obj, name, _ in patched]
        for obj, name, val in patched:
            setattr(obj, name, val)
        try:
            from model.VQGAN.vqperceptual import VQLPIPSWithDiscriminator

            return VQLPIPSWithDiscriminator, saved, saved_mods
        except Exception:
            for obj, name, val in saved:
                setattr(obj, name, val)
            raise
    except Exception:
        _restore_modules(saved_mods)
        raise


def _restore_modules(saved_mods):
    for k, v in saved_mods.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _torch_vq_forward(pieces, x):
    """The reference VQModel.forward (vqgan.py:74-93) on the assembled pieces."""
    enc, dec, quant, qc, pqc = pieces
    h = qc(enc(x))
    z_q, qloss, _ = quant(h)
    return dec(pqc(z_q)), qloss


def _vq_grad_tree(pieces):
    """{converted-tree} of d loss/d params, through the SAME converter as the
    weights (zeros where autograd left None — e.g. dead codebook entries)."""
    enc, dec, quant, qc, pqc = pieces
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("quantize", quant),
                        ("quant_conv", qc), ("post_quant_conv", pqc)):
        for n, p in mod.named_parameters():
            g = p.grad
            sd[f"{prefix}.{n}"] = (torch.zeros_like(p) if g is None else g).detach()
    return convert_vqgan_state_dict(sd)


def _compare_trees(ours, ref, *, rtol, atol, path=""):
    if isinstance(ref, dict):
        assert set(ours.keys()) == set(ref.keys()), (
            f"{path}: {sorted(ours.keys())} vs {sorted(ref.keys())}")
        for k in ref:
            _compare_trees(ours[k], ref[k], rtol=rtol, atol=atol,
                           path=f"{path}/{k}")
        return
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=rtol, atol=atol,
        err_msg=f"gradient mismatch at {path}")


def _to_j(a):
    return jnp.asarray(np.asarray(a.detach()).transpose(0, 2, 3, 1))


@pytest.fixture(scope="module", params=["batchnorm-hinge", "actnorm-vanilla"])
def stacks(request):
    use_actnorm = request.param.startswith("actnorm")
    disc_loss = request.param.split("-")[1]

    VQLPIPSWithDiscriminator, saved, saved_mods = _import_reference_loss()
    try:
        torch.manual_seed(0)
        pieces = _build_reference_pieces()
        for m in pieces:
            m.train(False)
        torch.manual_seed(11)
        loss_mod = VQLPIPSWithDiscriminator(
            disc_start=0, codebook_weight=CODEBOOK_WEIGHT,
            disc_num_layers=DISC_LAYERS, disc_in_channels=3,
            disc_factor=1.0, disc_weight=DISC_WEIGHT,
            perceptual_weight=PERCEPTUAL_WEIGHT, use_actnorm=use_actnorm,
            disc_ndf=DISC_NDF, disc_loss=disc_loss)
        if use_actnorm:
            # data-dependent init fires on the first train-mode forward
            # (discriminator.py:21-44); run it BEFORE snapshotting weights so
            # both stacks share the initialized loc/scale
            loss_mod.discriminator.train()
            with torch.no_grad():
                torch.manual_seed(21)
                loss_mod.discriminator(torch.randn(2, 3, DD["resolution"],
                                                   DD["resolution"]))
        loss_mod.eval()
    finally:
        for obj, name, val in saved:
            setattr(obj, name, val)
        _restore_modules(saved_mods)

    gen_params = _converted_params(*pieces)
    disc_params, disc_stats = convert_discriminator_state_dict(
        loss_mod.discriminator.state_dict(), n_layers=DISC_LAYERS,
        use_actnorm=use_actnorm)
    lpips_params = convert_lpips_state_dict(
        loss_mod.perceptual_loss.state_dict(), net="vgg")

    vq = VQModel(ddconfig=DD, n_embed=N_EMBED, embed_dim=EMBED_DIM)
    disc = NLayerDiscriminator(ndf=DISC_NDF, n_layers=DISC_LAYERS,
                               use_actnorm=use_actnorm)
    cfg = dict2namespace({
        "disc_start": 0, "disc_factor": 1.0, "disc_weight": DISC_WEIGHT,
        "codebook_weight": CODEBOOK_WEIGHT,
        "perceptual_weight": PERCEPTUAL_WEIGHT,
        "adaptive_disc_weight": True, "disc_loss": disc_loss,
        "use_actnorm": use_actnorm,
    })
    gen_loss, disc_loss_fn = make_vqgan_losses(vq, disc, cfg,
                                               lpips_params=lpips_params)

    rs = np.random.RandomState(3)
    x = rs.uniform(-1.0, 1.0, (2, 3, DD["resolution"], DD["resolution"]))
    x_t = torch.tensor(x, dtype=torch.float32)

    return dict(pieces=pieces, loss_mod=loss_mod, gen_loss=gen_loss,
                disc_loss_fn=disc_loss_fn, gen_params=gen_params,
                disc_params=disc_params, disc_stats=disc_stats,
                x_t=x_t, use_actnorm=use_actnorm)


def test_generator_loss_and_grad_parity(stacks):
    pieces, loss_mod, x_t = stacks["pieces"], stacks["loss_mod"], stacks["x_t"]
    dec = pieces[1]

    for m in pieces:
        m.zero_grad(set_to_none=True)
    loss_mod.zero_grad(set_to_none=True)
    xrec, qloss = _torch_vq_forward(pieces, x_t)
    t_loss, log = loss_mod(qloss, x_t, xrec, 0, global_step=STEP,
                           last_layer=dec.conv_out.weight)
    assert float(log["train/d_weight"]) > 0.0, (
        "adaptive weight silently zeroed — the reference swallowed a "
        "RuntimeError in calculate_adaptive_weight")
    t_loss.backward()
    t_grads = _vq_grad_tree(pieces)

    (j_loss, aux), j_grads = jax.value_and_grad(
        stacks["gen_loss"], has_aux=True)(
        stacks["gen_params"], stacks["disc_params"], stacks["disc_stats"],
        _to_j(x_t), STEP)

    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=2e-4)
    np.testing.assert_allclose(float(aux["nll"]),
                               float(log["train/nll_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(aux["g_loss"]),
                               float(log["train/g_loss"]), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(aux["q_loss"]),
                               float(log["train/quant_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(aux["d_weight"]),
                               float(log["train/d_weight"]), rtol=5e-4)
    # atol absorbs fp32 accumulation-order noise on near-zero elements of the
    # deep LPIPS/double-backward chains; typical grad magnitudes are ~1e-1
    _compare_trees(j_grads, t_grads, rtol=2e-3, atol=1e-4)


def test_discriminator_loss_and_grad_parity(stacks):
    pieces, loss_mod, x_t = stacks["pieces"], stacks["loss_mod"], stacks["x_t"]

    with torch.no_grad():
        xrec, qloss = _torch_vq_forward(pieces, x_t)

    # train-mode normalization for the discriminator pass (our train=True);
    # LPIPS is unused on optimizer_idx=1 so its train-mode dropout is moot
    loss_mod.discriminator.train()
    loss_mod.zero_grad(set_to_none=True)
    t_loss, log = loss_mod(qloss, x_t, xrec, 1, global_step=STEP)
    t_loss.backward()
    loss_mod.discriminator.eval()
    sd = {n: (torch.zeros_like(p) if p.grad is None else p.grad).detach()
          for n, p in loss_mod.discriminator.named_parameters()}
    t_grads, _ = convert_discriminator_state_dict(
        sd, n_layers=DISC_LAYERS, use_actnorm=stacks["use_actnorm"])

    (j_loss, _), j_grads = jax.value_and_grad(
        stacks["disc_loss_fn"], has_aux=True)(
        stacks["disc_params"], stacks["disc_stats"], _to_j(x_t),
        _to_j(xrec), STEP)

    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-4)
    _compare_trees(j_grads, t_grads, rtol=2e-3, atol=2e-5)
