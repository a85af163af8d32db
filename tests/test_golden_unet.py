"""Golden-value parity: our flax UNet vs the reference PyTorch UNet.

Builds the reference `UNetModel` (openaimodel.py:446-759) on CPU with a tiny
config, converts its live state_dict through our torch importer, and checks
the two forwards agree numerically on fixed inputs (SURVEY.md §4
"golden-value" plan). This validates both the weight converter and the layer
semantics (GroupNorm32 fp32 stats, scale-shift FiLM, legacy QKV attention,
up/down ResBlocks) in one shot.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.checkpoints.torch_import import convert_unet_state_dict  # noqa: E402
from bbdm_tpu.models.unet import UNet  # noqa: E402
from tests.conftest import tiny_bbdm_config  # noqa: E402

REF = "/root/reference"


def _load_reference_unet(unet_kwargs):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "omegaconf" not in sys.modules:
        # the reference imports omegaconf.listconfig.ListConfig only for an
        # isinstance check on context_dim (openaimodel.py:480); stub it
        import types

        omegaconf = types.ModuleType("omegaconf")
        listconfig = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        listconfig.ListConfig = ListConfig
        omegaconf.listconfig = listconfig
        sys.modules["omegaconf"] = omegaconf
        sys.modules["omegaconf.listconfig"] = listconfig
    from model.BrownianBridge.base.modules.diffusionmodules.openaimodel import (
        UNetModel as TorchUNet,
    )

    torch.manual_seed(0)
    net = TorchUNet(**unet_kwargs)
    net.eval()
    return net


@pytest.mark.parametrize("use_scale_shift_norm", [True, False])
def test_unet_forward_matches_reference(use_scale_shift_norm):
    cfg = tiny_bbdm_config()
    p = cfg.BB.params.UNetParams
    p.use_scale_shift_norm = use_scale_shift_norm

    torch_net = _load_reference_unet(dict(
        image_size=p.image_size, in_channels=p.in_channels,
        model_channels=p.model_channels, out_channels=p.out_channels,
        num_res_blocks=p.num_res_blocks,
        attention_resolutions=tuple(p.attention_resolutions),
        channel_mult=tuple(p.channel_mult), conv_resample=p.conv_resample,
        dims=2, num_heads=p.num_heads, num_head_channels=p.num_head_channels,
        use_scale_shift_norm=p.use_scale_shift_norm,
        resblock_updown=p.resblock_updown,
        use_spatial_transformer=False, condition_key="concat",
    ))

    sd = {f"denoise_fn.{k}": v for k, v in torch_net.state_dict().items()}
    params = convert_unet_state_dict(sd, p)

    rs = np.random.RandomState(42)
    x = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    ctx = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    t = np.array([3, 11], np.int64)

    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                        context=torch.from_numpy(ctx)).numpy()

    flax_unet = UNet.from_config(p, condition_key="SpatialRescaler",
                                 dtype=jnp.float32, init_scheme="reference")
    out = flax_unet.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(ctx.transpose(0, 2, 3, 1)),
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_unet_timestep_dependence_matches_reference():
    """Same net, different timesteps -> both stacks move the same way."""
    cfg = tiny_bbdm_config()
    p = cfg.BB.params.UNetParams

    torch_net = _load_reference_unet(dict(
        image_size=p.image_size, in_channels=p.in_channels,
        model_channels=p.model_channels, out_channels=p.out_channels,
        num_res_blocks=p.num_res_blocks,
        attention_resolutions=tuple(p.attention_resolutions),
        channel_mult=tuple(p.channel_mult), conv_resample=p.conv_resample,
        dims=2, num_heads=p.num_heads, num_head_channels=p.num_head_channels,
        use_scale_shift_norm=p.use_scale_shift_norm,
        resblock_updown=p.resblock_updown,
        use_spatial_transformer=False, condition_key="concat",
    ))
    sd = {f"denoise_fn.{k}": v for k, v in torch_net.state_dict().items()}
    params = convert_unet_state_dict(sd, p)

    rs = np.random.RandomState(7)
    x = rs.randn(1, 3, p.image_size, p.image_size).astype(np.float32)
    ctx = rs.randn(1, 3, p.image_size, p.image_size).astype(np.float32)

    flax_unet = UNet.from_config(p, condition_key="SpatialRescaler",
                                 dtype=jnp.float32, init_scheme="reference")

    for tv in (0, 19):
        t = np.array([tv], np.int64)
        with torch.no_grad():
            ref = torch_net(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                            context=torch.from_numpy(ctx)).numpy()
        out = np.asarray(flax_unet.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t.astype(np.int32)),
            jnp.asarray(ctx.transpose(0, 2, 3, 1)),
        )).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_spatial_transformer_unet_matches_reference():
    """Cross-attention SpatialTransformer path (use_spatial_transformer=True,
    reference attention.py:221-264 + openaimodel.py concat+crossattn)."""
    cfg = tiny_bbdm_config()
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
    sd = {f"denoise_fn.{k}": v for k, v in torch_net.state_dict().items()}
    from bbdm_tpu.checkpoints.torch_import import convert_unet_state_dict

    params = convert_unet_state_dict(sd, p)

    rs = np.random.RandomState(5)
    x = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    ctx = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    t = np.array([4, 17], np.int64)

    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                        context=torch.from_numpy(ctx)).numpy()

    from bbdm_tpu.models.unet import UNet

    flax_unet = UNet.from_config(p, condition_key="SpatialRescaler",
                                 dtype=jnp.float32, init_scheme="reference")
    out = np.asarray(flax_unet.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(ctx.transpose(0, 2, 3, 1)),
    )).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_spatial_rescaler_matches_reference():
    """SpatialRescaler bilinear downscale + 1x1 channel map vs the reference
    (encoders/modules.py:106-134): torch F.interpolate(align_corners=False)
    == jax.image.resize('bilinear', antialias=False)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.BrownianBridge.base.modules.encoders.modules import (
        SpatialRescaler as TorchSR,
    )

    from bbdm_tpu.models.cond import SpatialRescaler

    torch.manual_seed(0)
    ref = TorchSR(n_stages=2, method="bilinear", multiplier=0.5,
                  in_channels=3, out_channels=5, bias=True).eval()

    rs = np.random.RandomState(3)
    x = rs.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    ours = SpatialRescaler(n_stages=2, method="bilinear", multiplier=0.5,
                           out_channels=5, bias=True, dtype=jnp.float32)
    w = ref.channel_mapper.weight.detach().numpy()  # [O,I,1,1]
    params = {"channel_mapper": {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": ref.channel_mapper.bias.detach().numpy(),
    }}
    out = np.asarray(ours.apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), out_ref,
                               atol=1e-5, rtol=1e-5)


def test_num_heads_upsample_matches_reference():
    """Decoder attention honors num_heads_upsample when num_head_channels=-1
    (reference openaimodel.py:496-497,659; ADVICE r1)."""
    cfg = tiny_bbdm_config()
    p = cfg.BB.params.UNetParams
    p.num_heads = 4
    p.num_head_channels = -1
    p.num_heads_upsample = 2

    torch_net = _load_reference_unet(dict(
        image_size=p.image_size, in_channels=p.in_channels,
        model_channels=p.model_channels, out_channels=p.out_channels,
        num_res_blocks=p.num_res_blocks,
        attention_resolutions=tuple(p.attention_resolutions),
        channel_mult=tuple(p.channel_mult), conv_resample=p.conv_resample,
        dims=2, num_heads=p.num_heads, num_head_channels=-1,
        num_heads_upsample=2,
        use_scale_shift_norm=p.use_scale_shift_norm,
        resblock_updown=p.resblock_updown,
        use_spatial_transformer=False, condition_key="concat",
    ))
    sd = {f"denoise_fn.{k}": v for k, v in torch_net.state_dict().items()}
    params = convert_unet_state_dict(sd, p)

    rs = np.random.RandomState(5)
    x = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    ctx = rs.randn(2, 3, p.image_size, p.image_size).astype(np.float32)
    t = np.array([1, 17], np.int64)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                        context=torch.from_numpy(ctx)).numpy()
    flax_unet = UNet.from_config(p, condition_key="SpatialRescaler",
                                 dtype=jnp.float32, init_scheme="reference")
    out = np.asarray(flax_unet.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t.astype(np.int32)),
        jnp.asarray(ctx.transpose(0, 2, 3, 1)),
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
