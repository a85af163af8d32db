"""Golden-value parity: our flax VQGAN vs the reference PyTorch modules.

Assembles the reference's Encoder/Decoder/VectorQuantizer2 + 1x1 quant convs
(`model/VQGAN/model.py:342-537`, `quantize.py:213-329`, `vqgan.py:31-93`) on
CPU, converts the live state_dict through our importer, and checks encode /
quantize / decode agree numerically (SURVEY.md §4 golden plan; §7 hard part
"VQGAN checkpoint conversion ... with bit-level validation").
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.checkpoints.torch_import import convert_vqgan_state_dict  # noqa: E402
from bbdm_tpu.config import dict2namespace  # noqa: E402
from bbdm_tpu.models.vqgan import VQModel  # noqa: E402

REF = "/root/reference"

DD = {
    "double_z": False, "z_channels": 3, "resolution": 32, "in_channels": 3,
    "out_ch": 3, "ch": 32, "ch_mult": (1, 2), "num_res_blocks": 1,
    "attn_resolutions": (16,), "dropout": 0.0,
}
N_EMBED, EMBED_DIM = 64, 3


def _build_reference_pieces():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.VQGAN.model import Decoder, Encoder
    from model.VQGAN.quantize import VectorQuantizer2

    torch.manual_seed(0)
    enc = Encoder(**DD)
    dec = Decoder(**DD)
    quant = VectorQuantizer2(N_EMBED, EMBED_DIM, beta=0.25)
    qc = torch.nn.Conv2d(DD["z_channels"], EMBED_DIM, 1)
    pqc = torch.nn.Conv2d(EMBED_DIM, DD["z_channels"], 1)
    for m in (enc, dec, quant, qc, pqc):
        m.eval()
    return enc, dec, quant, qc, pqc


def _converted_params(enc, dec, quant, qc, pqc):
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("quantize", quant),
                        ("quant_conv", qc), ("post_quant_conv", pqc)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    return convert_vqgan_state_dict(sd)


@pytest.fixture(scope="module")
def stacks():
    enc, dec, quant, qc, pqc = _build_reference_pieces()
    params = _converted_params(enc, dec, quant, qc, pqc)
    flax_vq = VQModel.from_config(dict2namespace({
        "embed_dim": EMBED_DIM, "n_embed": N_EMBED, "ddconfig": dict(DD),
    }), dtype=jnp.float32)
    return enc, dec, quant, qc, pqc, flax_vq, params


def test_encode_latent_matches(stacks):
    enc, dec, quant, qc, pqc, flax_vq, params = stacks
    rs = np.random.RandomState(1)
    x = rs.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = qc(enc(torch.from_numpy(x))).numpy()
    out = np.asarray(flax_vq.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=VQModel.encode_latent,
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_quantize_and_decode_match(stacks):
    enc, dec, quant, qc, pqc, flax_vq, params = stacks
    rs = np.random.RandomState(2)
    x = rs.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        z = qc(enc(torch.from_numpy(x)))
        zq_ref, _, (_, _, idx_ref) = quant(z)
        rec_ref = dec(pqc(zq_ref)).numpy()

    z_j = jnp.asarray(z.numpy().transpose(0, 2, 3, 1))
    zq, _, idx = flax_vq.apply({"params": params}, z_j,
                               method=VQModel.quantize_latent)
    np.testing.assert_array_equal(
        np.asarray(idx).reshape(-1), idx_ref.numpy().reshape(-1))
    np.testing.assert_allclose(
        np.asarray(zq).transpose(0, 3, 1, 2), zq_ref.numpy(), atol=2e-5, rtol=2e-5)

    rec = np.asarray(flax_vq.apply({"params": params}, zq,
                                   method=VQModel.decode_from_quant))
    np.testing.assert_allclose(
        rec.transpose(0, 3, 1, 2), rec_ref, atol=5e-4, rtol=5e-4)
