"""Golden-value parity for the training loss: reference `p_losses`
(`model/BrownianBridge/BrownianBridgeModel.py:98-126`) vs our q_sample +
denoise + reduction, with the SAME injected timesteps/noise and converted
UNet weights — the last seam between the two training stacks.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.checkpoints.torch_import import convert_unet_state_dict  # noqa: E402
from bbdm_tpu.models import build_model  # noqa: E402
from tests.conftest import tiny_bbdm_config  # noqa: E402

REF = "/root/reference"


@pytest.mark.parametrize("objective,loss_type", [
    ("grad", "l1"), ("noise", "l2"), ("ysubx", "l1"),
])
def test_p_losses_matches_reference(objective, loss_type):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )

    cfg = tiny_bbdm_config(BB={"params": {
        "objective": objective, "loss_type": loss_type, "num_timesteps": 20,
    }})
    cfg.BB.params.UNetParams.condition_key = "SpatialRescaler"

    torch.manual_seed(0)
    ref = TorchBBM(cfg)
    ref.eval()

    sd = {k: v for k, v in ref.state_dict().items()}
    params = {"unet": convert_unet_state_dict(sd, cfg.BB.params.UNetParams)}

    ours = build_model(cfg, dtype=jnp.float32)

    rs = np.random.RandomState(11)
    B, H = 2, cfg.BB.params.UNetParams.image_size
    x0 = rs.randn(B, 3, H, H).astype(np.float32)
    y = rs.randn(B, 3, H, H).astype(np.float32)
    noise = rs.randn(B, 3, H, H).astype(np.float32)
    t = np.array([2, 17], np.int64)

    with torch.no_grad():
        ref_loss, log = ref.p_losses(
            torch.from_numpy(x0), torch.from_numpy(y), torch.from_numpy(y),
            torch.from_numpy(t), noise=torch.from_numpy(noise))
    ref_loss = float(ref_loss)
    ref_x0_recon = log["x0_recon"].numpy()

    # our loss path with the same injected randomness: q_sample -> denoise ->
    # reduction (models/bridge.py loss() draws t/noise internally; this is
    # the identical math with the draw replaced)
    to_j = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    x_t, obj = ours.q_sample(to_j(x0), to_j(y), jnp.asarray(t), to_j(noise))
    pred = ours.denoise(params, x_t, jnp.asarray(t), to_j(y))
    if loss_type == "l1":
        our_loss = float(jnp.abs(obj - pred).mean())
    else:
        our_loss = float(jnp.mean((obj - pred) ** 2))

    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-5, atol=2e-6)

    m_t = jnp.asarray(ours.schedule.m_t)[jnp.asarray(t)].reshape(B, 1, 1, 1)
    sigma_t = jnp.sqrt(
        jnp.asarray(ours.schedule.variance_t)[jnp.asarray(t)]).reshape(B, 1, 1, 1)
    x0_recon = ours.predict_x0_from_objective(x_t, to_j(y), pred,
                                              m_t=m_t, sigma_t=sigma_t)
    np.testing.assert_allclose(
        np.asarray(x0_recon).transpose(0, 3, 1, 2), ref_x0_recon,
        rtol=2e-4, atol=2e-4)
