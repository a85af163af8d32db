"""Torch-checkpoint importer tests.

Structural: a synthetic state_dict with the reference's exact key naming must
convert into a tree that matches our flax init structure leaf-for-leaf.
Numeric: converted weights must make the flax modules reproduce torch's
functional forward (conv/linear golden paths are covered in test_ops.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bbdm_tpu.checkpoints.torch_import import (
    convert_unet_state_dict,
    convert_vqgan_state_dict,
    unet_module_map,
)
from bbdm_tpu.models.unet import UNet
from tests.conftest import tiny_bbdm_config


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def build_synthetic_unet_sd(unet_cfg, params):
    """Invert our mapping: produce a torch-style state_dict whose keys follow
    the reference naming (`openaimodel.py`) with correctly-shaped arrays."""
    inv = {}
    mod_map = unet_module_map(unet_cfg)

    flax_shapes = tree_paths(params)

    def torch_shape(path, fshape):
        leaf = path[-1]
        if leaf == "scale" or leaf == "bias":
            return fshape
        if leaf == "kernel":
            if len(fshape) == 4:  # HWIO -> OIHW
                return (fshape[3], fshape[2], fshape[0], fshape[1])
            if len(fshape) == 2:
                return (fshape[1], fshape[0])
        raise AssertionError(path)

    rs = np.random.RandomState(0)

    top = {
        ("time_dense_0", "kernel"): "time_embed.0.weight",
        ("time_dense_0", "bias"): "time_embed.0.bias",
        ("time_dense_1", "kernel"): "time_embed.2.weight",
        ("time_dense_1", "bias"): "time_embed.2.bias",
        ("out_norm", "scale"): "out.0.weight",
        ("out_norm", "bias"): "out.0.bias",
        ("out_conv", "kernel"): "out.2.weight",
        ("out_conv", "bias"): "out.2.bias",
        ("stem", "kernel"): "input_blocks.0.0.weight",
        ("stem", "bias"): "input_blocks.0.0.bias",
    }
    # invert the module map
    flax_to_torch_mod = {v[0]: (k, v[1]) for k, v in mod_map.items()}

    sd = {}
    for path, fshape in flax_shapes.items():
        if path in top:
            key = top[path]
        else:
            mod = path[0]
            assert mod in flax_to_torch_mod, f"no torch module for {mod}"
            torch_prefix, pmap = flax_to_torch_mod[mod]
            # find the torch suffix whose flax path matches
            match = [ts for ts, (fp, _) in pmap.items() if fp == path[1:]]
            assert match, f"no torch suffix for {path}"
            key = f"{torch_prefix}.{match[0]}"
        # attention qkv/proj use Conv1d shapes [O, I, 1]
        if ("attn" in path[0] and path[-1] == "kernel") and len(fshape) == 2:
            shape = (fshape[1], fshape[0], 1)
        else:
            shape = torch_shape(path, fshape)
        sd["denoise_fn." + key] = rs.randn(*shape).astype(np.float32)
    return sd


def test_unet_import_structure_roundtrip():
    cfg = tiny_bbdm_config()
    up = cfg.BB.params.UNetParams
    net = UNet.from_config(up, condition_key=up.condition_key, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 3))
    ctx = jnp.zeros((1, 8, 8, 3))
    params = net.init(jax.random.PRNGKey(0), x, jnp.array([0]), ctx)["params"]

    sd = build_synthetic_unet_sd(up, params)
    converted = convert_unet_state_dict(sd, up, prefix="denoise_fn.")

    assert tree_paths(converted).keys() == tree_paths(params).keys()
    for path, shape in tree_paths(converted).items():
        assert shape == tree_paths(params)[path], path

    # and the converted tree actually runs through the module
    out = net.apply({"params": converted}, x, jnp.array([0]), ctx)
    assert out.shape == (1, 8, 8, 3)


def test_unet_import_rejects_unknown_keys():
    cfg = tiny_bbdm_config()
    up = cfg.BB.params.UNetParams
    with pytest.raises(ValueError, match="unmatched"):
        convert_unet_state_dict(
            {"denoise_fn.middle_block.9.bogus.weight": np.zeros(3)}, up)


def _vqgan_torch_keys(ch, ch_mult, nrb, z_ch, embed_dim, n_embed, resolution,
                      attn_res=()):
    """Enumerate LDM VQModel state_dict keys (reference model.py/vqgan.py
    naming) with shapes, independently of our mapping code."""
    rs = np.random.RandomState(1)
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32)
        sd[f"{name}.bias"] = rs.randn(cout).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = rs.randn(c).astype(np.float32)
        sd[f"{name}.bias"] = rs.randn(c).astype(np.float32)

    def resblock(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout, 3)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{name}.nin_shortcut", cin, cout, 1)

    def attnblock(name, c):
        norm(f"{name}.norm", c)
        for q in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{q}", c, c, 1)

    # encoder
    conv("encoder.conv_in", 3, ch, 3)
    in_mult = (1,) + tuple(ch_mult)
    curr = resolution
    for i in range(len(ch_mult)):
        cin, cout = ch * in_mult[i], ch * ch_mult[i]
        for j in range(nrb):
            resblock(f"encoder.down.{i}.block.{j}", cin if j == 0 else cout, cout)
            if curr in attn_res:
                attnblock(f"encoder.down.{i}.attn.{j}", cout)
        if i != len(ch_mult) - 1:
            conv(f"encoder.down.{i}.downsample.conv", cout, cout, 3)
            curr //= 2
    cmid = ch * ch_mult[-1]
    resblock("encoder.mid.block_1", cmid, cmid)
    attnblock("encoder.mid.attn_1", cmid)
    resblock("encoder.mid.block_2", cmid, cmid)
    norm("encoder.norm_out", cmid)
    conv("encoder.conv_out", cmid, z_ch, 3)

    # decoder
    conv("decoder.conv_in", z_ch, cmid, 3)
    resblock("decoder.mid.block_1", cmid, cmid)
    attnblock("decoder.mid.attn_1", cmid)
    resblock("decoder.mid.block_2", cmid, cmid)
    block_in = cmid
    for i in reversed(range(len(ch_mult))):
        cout = ch * ch_mult[i]
        for j in range(nrb + 1):
            resblock(f"decoder.up.{i}.block.{j}", block_in if j == 0 else cout, cout)
            if curr in attn_res:
                attnblock(f"decoder.up.{i}.attn.{j}", cout)
        block_in = cout
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", cout, cout, 3)
    norm("decoder.norm_out", block_in)
    conv("decoder.conv_out", block_in, 3, 3)

    sd["quantize.embedding.weight"] = rs.randn(n_embed, embed_dim).astype(np.float32)
    conv("quant_conv", z_ch, embed_dim, 1)
    conv("post_quant_conv", embed_dim, z_ch, 1)
    sd["loss.dummy"] = np.zeros(1, np.float32)  # GAN loss stack must be skipped
    return sd


def test_vqgan_import_structure_roundtrip():
    from bbdm_tpu.config import dict2namespace
    from bbdm_tpu.models.vqgan import VQModel

    vq_cfg = dict2namespace({
        "embed_dim": 3, "n_embed": 64,
        "ddconfig": {
            "double_z": False, "z_channels": 3, "resolution": 16,
            "in_channels": 3, "out_ch": 3, "ch": 32,
            "ch_mult": (1, 2), "num_res_blocks": 1,
            "attn_resolutions": [], "dropout": 0.0,
        },
    })
    model = VQModel.from_config(vq_cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    sd = _vqgan_torch_keys(ch=32, ch_mult=(1, 2), nrb=1, z_ch=3,
                           embed_dim=3, n_embed=64, resolution=16)
    converted = convert_vqgan_state_dict(sd)

    assert tree_paths(converted).keys() == tree_paths(params).keys()
    for path, shape in tree_paths(converted).items():
        assert shape == tree_paths(params)[path], path

    rec, _ = model.apply({"params": converted}, jnp.ones((1, 16, 16, 3)))
    assert rec.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(rec)).all()


def test_vqgan_resblock_numeric_golden():
    """A VQ resnet block with converted torch weights must reproduce the torch
    functional forward (GN(32) -> swish -> conv3x3, twice, + shortcut)."""
    import torch
    import torch.nn.functional as F

    from bbdm_tpu.models.vqgan import VQResnetBlock

    rs = np.random.RandomState(2)
    C = 32
    x = rs.randn(1, 6, 6, C).astype(np.float32)
    sd = {}
    sd["norm1.weight"] = rs.randn(C).astype(np.float32)
    sd["norm1.bias"] = rs.randn(C).astype(np.float32)
    sd["conv1.weight"] = (rs.randn(C, C, 3, 3) * 0.1).astype(np.float32)
    sd["conv1.bias"] = rs.randn(C).astype(np.float32)
    sd["norm2.weight"] = rs.randn(C).astype(np.float32)
    sd["norm2.bias"] = rs.randn(C).astype(np.float32)
    sd["conv2.weight"] = (rs.randn(C, C, 3, 3) * 0.1).astype(np.float32)
    sd["conv2.bias"] = rs.randn(C).astype(np.float32)

    # torch functional forward (NCHW)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    h = F.group_norm(tx, 32, torch.from_numpy(sd["norm1.weight"]),
                     torch.from_numpy(sd["norm1.bias"]), eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv2d(h, torch.from_numpy(sd["conv1.weight"]),
                 torch.from_numpy(sd["conv1.bias"]), padding=1)
    h = F.group_norm(h, 32, torch.from_numpy(sd["norm2.weight"]),
                     torch.from_numpy(sd["norm2.bias"]), eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv2d(h, torch.from_numpy(sd["conv2.weight"]),
                 torch.from_numpy(sd["conv2.bias"]), padding=1)
    ref = (tx + h).permute(0, 2, 3, 1).numpy()

    # ours with converted weights
    from bbdm_tpu.checkpoints.torch_import import _t_conv2d

    params = {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "conv1": {"kernel": _t_conv2d(sd["conv1.weight"]), "bias": sd["conv1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "conv2": {"kernel": _t_conv2d(sd["conv2.weight"]), "bias": sd["conv2.bias"]},
    }
    block = VQResnetBlock(out_channels=C, dtype=jnp.float32)
    ours = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_vqgan_import_gumbel_quantize_keys():
    """GumbelVQ torch checkpoints carry quantize.proj.{weight,bias} (1x1 conv)
    + quantize.embed.weight; the converter must map all three (not fold every
    quantize.* key onto the codebook) and reject unknown quantize keys
    (ADVICE r1)."""
    import numpy as np

    from bbdm_tpu.checkpoints.torch_import import convert_vqgan_state_dict

    n_e, z_ch, e_dim = 16, 4, 8
    rs = np.random.RandomState(0)
    sd = {
        "quantize.proj.weight": rs.randn(n_e, z_ch, 1, 1).astype(np.float32),
        "quantize.proj.bias": rs.randn(n_e).astype(np.float32),
        "quantize.embed.weight": rs.randn(n_e, e_dim).astype(np.float32),
    }
    out = convert_vqgan_state_dict(sd)
    q = out["quantize"]
    assert q["embedding"].shape == (n_e, e_dim)
    np.testing.assert_array_equal(q["embedding"], sd["quantize.embed.weight"])
    # conv OIHW -> HWIO
    assert q["proj"]["kernel"].shape == (1, 1, z_ch, n_e)
    np.testing.assert_array_equal(
        q["proj"]["kernel"][0, 0], sd["quantize.proj.weight"][:, :, 0, 0].T)
    np.testing.assert_array_equal(q["proj"]["bias"], sd["quantize.proj.bias"])

    import pytest

    with pytest.raises(ValueError, match="unmatched"):
        convert_vqgan_state_dict({"quantize.used": np.zeros(3, np.float32)})


def test_background_save_ordering(tmp_path):
    """Background saves land atomically; same-path saves are ordered (the
    last dispatched wins) and load_checkpoint joins pending writers."""
    import numpy as np

    from bbdm_tpu.checkpoints.io import (load_checkpoint, save_checkpoint,
                                         wait_for_saves)

    path = str(tmp_path / "state.ckpt")
    for v in range(5):
        save_checkpoint({"v": np.full((64, 64), v, np.float32)}, path,
                        background=True)
    out = load_checkpoint(path)  # joins the writers itself
    assert float(out["v"][0, 0]) == 4.0
    # sync save over a pending background one also wins
    save_checkpoint({"v": np.full((64, 64), 9, np.float32)}, path,
                    background=True)
    save_checkpoint({"v": np.full((64, 64), 10, np.float32)}, path)
    wait_for_saves()
    assert float(load_checkpoint(path)["v"][0, 0]) == 10.0


def test_background_save_failure_propagates(tmp_path):
    """A failed background write (e.g. ENOSPC/unwritable dir) must re-raise
    at wait_for_saves()/the next same-path save — never be swallowed."""
    import numpy as np
    import pytest

    from bbdm_tpu.checkpoints.io import save_checkpoint, wait_for_saves

    wait_for_saves()  # drain earlier tests' writers
    bad = str(tmp_path / "no_such_dir" / "state.ckpt")
    save_checkpoint({"v": np.zeros(4, np.float32)}, bad, background=True)
    with pytest.raises(FileNotFoundError):
        wait_for_saves()
    wait_for_saves()  # failure is consumed; subsequent saves work again
    ok = str(tmp_path / "state.ckpt")
    save_checkpoint({"v": np.ones(4, np.float32)}, ok, background=True)
    wait_for_saves()
