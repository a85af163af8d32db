"""Golden GRADIENT parity vs the live torch reference (VERDICT round 2 #1).

Every other golden test is forward-only; these compare ``d loss / d params``
leaf-by-leaf between the reference autograd pass
(`model/BrownianBridge/BrownianBridgeModel.py:98-126` +
`LatentBrownianBridgeModel.py:57-71`) and our hand-assembled training path
(stop_gradients in `models/latent.py:89,120`, the train-lowering switch in
`models/layers.py`, ``nn.remat`` when ``use_checkpoint``) with identical
converted weights and the SAME injected (x, y, t, noise), fp32.

The torch gradients are mapped into our tree layout by feeding a
state_dict-shaped dict of ``p.grad`` tensors through the SAME converters used
for weights (`checkpoints/torch_import.py`) — so the comparison exercises the
converter mapping in both directions with zero bespoke glue.

Coverage: all three objectives x l1/l2 x scale-shift on/off x use_checkpoint
on (pixel BBDM), plus LBBDM with frozen VQGAN + trainable SpatialRescaler
(asserting VQGAN grads are EXACTLY zero and cond-stage grads nonzero+matching).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.checkpoints.torch_import import (  # noqa: E402
    convert_cond_stage_state_dict,
    convert_unet_state_dict,
    convert_vqgan_state_dict,
)
from bbdm_tpu.models import build_model  # noqa: E402
from tests.conftest import tiny_bbdm_config  # noqa: E402
from tests.test_latent import lbbdm_config  # noqa: E402

REF = "/root/reference"


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _to_j(a):  # NCHW torch/numpy -> NHWC jax
    return jnp.asarray(np.asarray(a).transpose(0, 2, 3, 1))


def _compare_trees(ours, ref, *, rtol, atol, path=""):
    """Leaf-by-leaf comparison of two nested-dict trees of arrays."""
    if isinstance(ref, dict):
        assert set(ours.keys()) == set(ref.keys()), (
            f"{path}: key mismatch {sorted(ours.keys())} vs {sorted(ref.keys())}")
        for k in ref:
            _compare_trees(ours[k], ref[k], rtol=rtol, atol=atol, path=f"{path}/{k}")
        return
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=rtol, atol=atol,
        err_msg=f"gradient mismatch at {path}")


def _torch_grad_dict(module, prefix=""):
    """{name: grad} over named_parameters, zeros where autograd left None."""
    out = {}
    for n, p in module.named_parameters():
        g = p.grad
        out[prefix + n] = (torch.zeros_like(p) if g is None else g).detach()
    return out


def _randomize(*modules, seed=1234):
    """Replace every parameter with N(0, 0.02) draws.

    The reference UNet zero-initializes its residual/output convs
    (``zero_module``, `openaimodel.py`), which makes ``d loss/d theta``
    EXACTLY zero for everything upstream of the output head — a vacuous
    gradient comparison. Real reference training never runs from that state:
    `BBDMRunner.initialize_model` applies ``weights_init`` N(0,0.02) over all
    convs (`runners/utils.py:35-45`) first. This mirrors that (over all
    params, which is equally valid for parity — the weights are converted
    either way) so gradients flow through the full depth.
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in modules:
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)


def _assert_mostly_nonzero(tree, frac=0.8, what="gradients"):
    nz = [bool(np.any(np.asarray(l) != 0.0))
          for l in jax.tree_util.tree_leaves(tree)]
    assert np.mean(nz) >= frac, (
        f"{what} vacuously zero: only {np.mean(nz):.0%} of leaves nonzero")


@pytest.mark.slow
@pytest.mark.parametrize("objective,loss_type,scale_shift,use_ckpt", [
    ("grad", "l1", True, False),
    ("grad", "l2", True, True),
    ("noise", "l2", False, True),
    ("ysubx", "l1", False, False),
])
def test_pixel_bbdm_grad_parity(objective, loss_type, scale_shift, use_ckpt):
    """d loss/d theta on the pixel BBDM training path (reference
    `BrownianBridgeModel.py:98-126` under autograd)."""
    _ref_path()
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )

    cfg = tiny_bbdm_config(BB={"params": {
        "objective": objective, "loss_type": loss_type, "num_timesteps": 20,
        "UNetParams": {"use_scale_shift_norm": scale_shift,
                       "use_checkpoint": use_ckpt},
    }})
    cfg.BB.params.UNetParams.condition_key = "SpatialRescaler"

    torch.manual_seed(0)
    ref = TorchBBM(cfg)
    _randomize(ref)
    ref.train()

    rs = np.random.RandomState(7)
    B, H = 2, cfg.BB.params.UNetParams.image_size
    x0 = rs.randn(B, 3, H, H).astype(np.float32)
    y = rs.randn(B, 3, H, H).astype(np.float32)
    noise = rs.randn(B, 3, H, H).astype(np.float32)
    t = np.array([3, 16], np.int64)

    ref_loss, _ = ref.p_losses(
        torch.from_numpy(x0), torch.from_numpy(y), torch.from_numpy(y),
        torch.from_numpy(t), noise=torch.from_numpy(noise))
    ref_loss.backward()
    ref_grads = convert_unet_state_dict(
        _torch_grad_dict(ref), cfg.BB.params.UNetParams)

    params = {"unet": convert_unet_state_dict(ref.state_dict(),
                                              cfg.BB.params.UNetParams)}
    ours = build_model(cfg, dtype=jnp.float32)
    jt = jnp.asarray(t)

    def loss_fn(params):
        # models/bridge.py loss() with the internal (t, noise) draw replaced
        # by the injected values — identical math, identical train lowering
        x_t, obj = ours.q_sample(_to_j(x0), _to_j(y), jt, _to_j(noise))
        pred = ours.denoise(params, x_t, jt, _to_j(y), train=True)
        if loss_type == "l1":
            return jnp.abs(obj - pred).mean()
        return jnp.mean((obj - pred) ** 2)

    our_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(our_loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)
    _assert_mostly_nonzero(grads["unet"], what="UNet gradients")
    _compare_trees(grads["unet"], ref_grads, rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_spatial_transformer_grad_parity():
    """Backward parity through the cross-attention SpatialTransformer path
    (CrossAttention q/k/v + GEGLU feed-forward + LayerNorms, reference
    `attention.py:153-264`) — not reachable from the bridge combos above."""
    from tests.test_golden_unet import _load_reference_unet

    cfg = tiny_bbdm_config(BB={"params": {"num_timesteps": 20}})
    p = cfg.BB.params.UNetParams
    p.use_spatial_transformer = True
    p.context_dim = 3
    p.transformer_depth = 1

    torch_net = _load_reference_unet(dict(
        image_size=p.image_size, in_channels=p.in_channels,
        model_channels=p.model_channels, out_channels=p.out_channels,
        num_res_blocks=p.num_res_blocks,
        attention_resolutions=tuple(p.attention_resolutions),
        channel_mult=tuple(p.channel_mult), conv_resample=p.conv_resample,
        dims=2, num_heads=p.num_heads, num_head_channels=p.num_head_channels,
        use_scale_shift_norm=p.use_scale_shift_norm,
        resblock_updown=p.resblock_updown,
        use_spatial_transformer=True, transformer_depth=1, context_dim=3,
        condition_key="concat",
    ))
    _randomize(torch_net)
    torch_net.train()

    rs = np.random.RandomState(5)
    x = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    ctx = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    t = np.array([4, 17], np.int64)

    out = torch_net(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                    context=torch.from_numpy(ctx))
    (out ** 2).mean().backward()
    ref_grads = convert_unet_state_dict(
        {f"denoise_fn.{k}": v for k, v in _torch_grad_dict(torch_net).items()}, p)

    params = convert_unet_state_dict(
        {f"denoise_fn.{k}": v for k, v in torch_net.state_dict().items()}, p)
    from bbdm_tpu.models.unet import UNet

    flax_unet = UNet.from_config(p, condition_key="SpatialRescaler",
                                 dtype=jnp.float32, init_scheme="reference")

    def loss_fn(params):
        o = flax_unet.apply({"params": params},
                            _to_j(x), jnp.asarray(t.astype(np.int32)),
                            _to_j(ctx), train=True)
        return jnp.mean(o ** 2)

    grads = jax.grad(loss_fn)(params)
    _assert_mostly_nonzero(grads, what="ST-UNet gradients")
    _compare_trees(grads, ref_grads, rtol=3e-4, atol=2e-6)


@pytest.mark.slow
def test_lbbdm_grad_parity_frozen_vqgan():
    """LBBDM training gradients: frozen VQGAN must receive EXACTLY zero
    gradient (reference freezes via requires_grad=False + no_grad encode,
    `LatentBrownianBridgeModel.py:23-27,57-62`; ours via stop_gradient +
    mask), the SpatialRescaler cond stage must receive nonzero gradients
    matching torch, and UNet gradients must match leaf-by-leaf."""
    _ref_path()
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )
    from model.BrownianBridge.base.modules.encoders.modules import (
        SpatialRescaler as TorchSR,
    )
    from model.VQGAN.model import Encoder

    cfg = lbbdm_config("SpatialRescaler")
    dd = {k: v for k, v in vars(cfg.VQGAN.params.ddconfig).items()}

    torch.manual_seed(0)
    enc = Encoder(**dd)
    qc = torch.nn.Conv2d(dd["z_channels"], cfg.VQGAN.params.embed_dim, 1)
    bbm = TorchBBM(cfg)
    sr = TorchSR(n_stages=cfg.CondStageParams.n_stages,
                 in_channels=cfg.CondStageParams.in_channels,
                 out_channels=cfg.CondStageParams.out_channels)
    _randomize(bbm, sr)
    bbm.train(), sr.train(), enc.eval(), qc.eval()

    rs = np.random.RandomState(13)
    R = dd["resolution"]
    x_img = (rs.rand(2, 3, R, R).astype(np.float32) * 2 - 1)
    y_img = (rs.rand(2, 3, R, R).astype(np.float32) * 2 - 1)
    t = np.array([5, 14], np.int64)

    # ---- reference LBBDM.forward semantics (`:57-62`): no_grad encode +
    # detach; trainable context from the rescaler on the FULL-RES condition
    with torch.no_grad():
        x_lat = qc(enc(torch.from_numpy(x_img)))
        y_lat = qc(enc(torch.from_numpy(y_img)))
    noise = rs.randn(*x_lat.shape).astype(np.float32)
    context = sr(torch.from_numpy(y_img))
    ref_loss, _ = bbm.p_losses(x_lat.detach(), y_lat.detach(), context,
                               torch.from_numpy(t), noise=torch.from_numpy(noise))
    ref_loss.backward()

    # torch-side frozen contract: the no_grad encode leaves no graph
    assert all(p.grad is None for p in enc.parameters())
    assert all(p.grad is None for p in qc.parameters())

    ref_unet_grads = convert_unet_state_dict(
        _torch_grad_dict(bbm), cfg.BB.params.UNetParams)
    ref_cond_grads = convert_cond_stage_state_dict(
        _torch_grad_dict(sr), prefix="")
    assert ref_cond_grads, "rescaler produced no gradients"

    # ---- ours: full param tree (random decoder/quantizer leaves are unused
    # by the loss and must come back with zero gradient)
    ours = build_model(cfg, dtype=jnp.float32)
    params = ours.init_params(jax.random.PRNGKey(0))
    params["unet"] = convert_unet_state_dict(bbm.state_dict(),
                                             cfg.BB.params.UNetParams)
    sd = {}
    for prefix, mod in (("encoder", enc), ("quant_conv", qc)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    conv = convert_vqgan_state_dict(sd)
    params["vqgan"]["encoder"] = conv["encoder"]
    params["vqgan"]["quant_conv"] = conv["quant_conv"]
    params["cond_stage"] = convert_cond_stage_state_dict(
        {k: v for k, v in sr.state_dict().items()}, prefix="")

    jt = jnp.asarray(t)

    def loss_fn(params):
        # models/latent.py loss() with the internal draw replaced
        x_latent = ours.encode(params, _to_j(x_img), cond=False, normalize=False)
        y_latent = ours.encode(params, _to_j(y_img), cond=True, normalize=False)
        ctx = ours.get_cond_stage_context(params, _to_j(y_img))
        x_t, obj = ours.q_sample(x_latent, y_latent, jt, _to_j(noise))
        pred = ours.denoise(params, x_t, jt, ctx, train=True)
        return jnp.abs(obj - pred).mean()  # cfg loss_type l1

    our_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(our_loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)

    # frozen first stage: EXACTLY zero everywhere (stop_gradient, not just
    # small) — matches the reference's requires_grad=False contract
    for leaf in jax.tree_util.tree_leaves(grads["vqgan"]):
        assert np.all(np.asarray(leaf) == 0.0)

    # trainable cond stage: nonzero and matching
    assert any(np.any(np.asarray(g) != 0.0)
               for g in jax.tree_util.tree_leaves(grads["cond_stage"]))
    _compare_trees(grads["cond_stage"], ref_cond_grads, rtol=2e-4, atol=1e-6)
    _assert_mostly_nonzero(grads["unet"], what="UNet gradients")
    _compare_trees(grads["unet"], ref_unet_grads, rtol=2e-4, atol=1e-6)
