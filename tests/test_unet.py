"""UNet structure tests: shapes, conditioning, attention variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.models.layers import timestep_embedding
from bbdm_tpu.models.unet import UNet


def _unet(**kw):
    base = dict(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, num_head_channels=8, use_scale_shift_norm=True,
        resblock_updown=True, condition_key="nocond", dtype=jnp.float32,
    )
    base.update(kw)
    return UNet(**base)


def test_timestep_embedding_matches_reference_formula():
    """cos-first ordering, freqs = exp(-ln(1e4) * i/half)
    (reference diffusionmodules/util.py:151-171)."""
    t = jnp.array([0.0, 1.0, 500.0])
    emb = timestep_embedding(t, 8)
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=1e-4, atol=1e-5)
    # t=0: cos part 1, sin part 0
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0)


def test_unet_output_shape_nocond():
    net = _unet()
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.array([0, 5])
    params = net.init(jax.random.PRNGKey(0), x, t, None)["params"]
    out = net.apply({"params": params}, x, t, None)
    assert out.shape == (2, 8, 8, 3)
    assert out.dtype == jnp.float32


def test_unet_concat_conditioning():
    """condition_key != nocond concatenates context channels
    (reference openaimodel.py:741-742)."""
    net = _unet(in_channels=6, condition_key="SpatialRescaler")
    x = jnp.zeros((1, 8, 8, 3))
    ctx = jnp.ones((1, 8, 8, 3))
    t = jnp.array([1])
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    out = net.apply({"params": params}, x, t, ctx)
    assert out.shape == (1, 8, 8, 3)
    # context actually matters
    out2 = net.apply({"params": params}, x, t, 2.0 * ctx)
    assert float(jnp.abs(out - out2).max()) > 0


def test_unet_timestep_matters():
    net = _unet()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    params = net.init(jax.random.PRNGKey(0), x, jnp.array([0]), None)["params"]
    o0 = net.apply({"params": params}, x, jnp.array([0]), None)
    o1 = net.apply({"params": params}, x, jnp.array([40]), None)
    assert float(jnp.abs(o0 - o1).max()) > 0


def test_unet_spatial_transformer_cross_attention():
    net = _unet(
        use_spatial_transformer=True, context_dim=16,
        in_channels=6, condition_key="SpatialRescaler",
    )
    x = jnp.zeros((1, 8, 8, 3))
    ctx = jnp.ones((1, 8, 8, 3))
    t = jnp.array([1])
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    out = net.apply({"params": params}, x, t, ctx)
    assert out.shape == (1, 8, 8, 3)


def test_unet_conv_downsample_variant():
    net = _unet(resblock_updown=False)
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.array([0])
    params = net.init(jax.random.PRNGKey(0), x, t, None)["params"]
    assert net.apply({"params": params}, x, t, None).shape == (1, 8, 8, 3)


def test_attention_triggers_on_ds_factor():
    """attention_resolutions holds downsampling factors, not pixel sizes."""
    net = _unet(attention_resolutions=(2,))
    x = jnp.zeros((1, 8, 8, 3))
    params = net.init(jax.random.PRNGKey(0), x, jnp.array([0]), None)["params"]
    names = set(params.keys())
    assert "down_1_0_attn" in names  # level 1 has ds=2
    assert not any(n.startswith("down_0_0_attn") for n in names)  # ds=1: no attn
    assert "mid_attn" in names


def test_init_scheme_reference_has_nonzero_head():
    """The reference's weights_init re-randomizes zero_module'd Conv2d heads
    (runners/utils.py:35-45); 'zero_heads' restores guided-diffusion zero init."""
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.array([0])
    p_ref = _unet(init_scheme="reference").init(jax.random.PRNGKey(0), x, t, None)["params"]
    p_zero = _unet(init_scheme="zero_heads").init(jax.random.PRNGKey(0), x, t, None)["params"]
    assert float(jnp.abs(p_ref["out_conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(p_zero["out_conv"]["kernel"]).sum()) == 0
    # attention proj_out is a 'Conv1d' in the reference: zero in both schemes
    assert float(jnp.abs(p_ref["mid_attn"]["proj_out"]["kernel"]).sum()) == 0


def test_class_embedder_shape_and_grad():
    """ClassEmbedder (reference encoders/modules.py:21-33): [B] labels ->
    [B, 1, embed_dim] context; embedding rows receive gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bbdm_tpu.models.cond import ClassEmbedder

    emb = ClassEmbedder(embed_dim=16, n_classes=10)
    labels = jnp.asarray([0, 3, 9])
    variables = emb.init(jax.random.PRNGKey(0), labels)
    out = emb.apply(variables, labels)
    assert out.shape == (3, 1, 16)

    grads = jax.grad(
        lambda p: (emb.apply({"params": p}, labels) ** 2).sum()
    )(variables["params"])
    g = np.asarray(grads["embedding"]["embedding"])
    assert np.abs(g[[0, 3, 9]]).sum() > 0
    assert np.abs(g[[1, 2, 4, 5, 6, 7, 8]]).sum() == 0
