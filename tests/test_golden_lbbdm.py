"""End-to-end golden parity: full LBBDM sampling pipeline vs the reference.

Capstone test combining every conversion/semantics path in one shot: a live
tiny reference stack (torch VQGAN pieces + `BrownianBridgeModel` with its own
`UNetModel` denoiser) runs the latent pipeline of
`model/BrownianBridge/LatentBrownianBridgeModel.py:102-132` — encode condition
(encoder + quant_conv, `:73-85`), reverse bridge from the conditioning latent,
decode (quantize -> post_quant_conv -> decoder, `:87-100`) — assembled
manually (importing the reference `vqgan.py` would pull pytorch_lightning).
Our `LatentBrownianBridgeModel.sample` must reproduce the final image from
the converted state dicts. eta=0 removes the noise term so the trajectories
are deterministic; any slip in the UNet conversion, schedule coefficients,
latent plumbing or VQGAN conversion diverges over the steps.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.checkpoints.torch_import import (  # noqa: E402
    convert_unet_state_dict,
    convert_vqgan_state_dict,
)
from bbdm_tpu.models import build_model  # noqa: E402
from tests.test_latent import lbbdm_config  # noqa: E402

REF = "/root/reference"

DD = {
    "double_z": False, "z_channels": 3, "resolution": 16, "in_channels": 3,
    "out_ch": 3, "ch": 32, "ch_mult": (1, 2), "num_res_blocks": 1,
    "attn_resolutions": (), "dropout": 0.0,
}
N_EMBED, EMBED_DIM = 32, 3


def _ref_imports():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "omegaconf" not in sys.modules:
        # reference imports omegaconf.listconfig.ListConfig only for an
        # isinstance check (openaimodel.py:480); stub it
        omegaconf = types.ModuleType("omegaconf")
        listconfig = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        listconfig.ListConfig = ListConfig
        omegaconf.listconfig = listconfig
        sys.modules["omegaconf"] = omegaconf
        sys.modules["omegaconf.listconfig"] = listconfig
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )
    from model.VQGAN.model import Decoder, Encoder
    from model.VQGAN.quantize import VectorQuantizer2

    return TorchBBM, Encoder, Decoder, VectorQuantizer2


def test_lbbdm_sample_matches_reference_pipeline():
    cfg = lbbdm_config("nocond")
    cfg.BB.params.eta = 0.0
    cfg.BB.params.sample_step = 5

    TorchBBM, Encoder, Decoder, VectorQuantizer2 = _ref_imports()
    torch.manual_seed(0)
    enc, dec = Encoder(**DD), Decoder(**DD)
    quant = VectorQuantizer2(N_EMBED, EMBED_DIM, beta=0.25)
    qc = torch.nn.Conv2d(DD["z_channels"], EMBED_DIM, 1)
    pqc = torch.nn.Conv2d(EMBED_DIM, DD["z_channels"], 1)
    bbm = TorchBBM(cfg)
    for m in (enc, dec, quant, qc, pqc, bbm):
        m.eval()

    # ---- reference latent pipeline (LatentBrownianBridgeModel.py:73-132) ----
    rs = np.random.RandomState(11)
    x_cond = (rs.rand(2, 3, 16, 16).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        y_lat = qc(enc(torch.from_numpy(x_cond)))                  # encode :73-85
        out_lat = bbm.p_sample_loop(y_lat, context=None,
                                    clip_denoised=False)           # bridge :102-132
        q, _, _ = quant(out_lat)                                   # decode :87-100
        ref_img = dec(pqc(q)).numpy()

    # ---- ours, from the converted live state dicts ----
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("quantize", quant),
                        ("quant_conv", qc), ("post_quant_conv", pqc)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    params = {
        "unet": convert_unet_state_dict(bbm.state_dict(),
                                        cfg.BB.params.UNetParams),
        "vqgan": convert_vqgan_state_dict(sd),
    }
    ours = build_model(cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ours.steps), bbm.steps.numpy())

    out = ours.sample(params, jax.random.PRNGKey(0),
                      jnp.asarray(x_cond.transpose(0, 2, 3, 1)),
                      clip_denoised=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out, ref_img, atol=5e-4, rtol=5e-4)
