"""Golden-value parity: full reverse-sampler trajectories vs the reference
`BrownianBridgeModel` (`model/BrownianBridge/BrownianBridgeModel.py:171-221`).

The reference's per-step posterior math (schedule ratios, x_tminus_mean mixing,
last-step x0 return) is compared against our precomputed SamplerCoeffs + scan
by swapping both stacks' denoisers for the same deterministic function and
running with eta=0 (no noise term) — any coefficient slip shows up as a
trajectory divergence after 6+ steps.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.models import build_model  # noqa: E402
from tests.conftest import tiny_bbdm_config  # noqa: E402

REF = "/root/reference"


def _reference_bbm(cfg):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )

    torch.manual_seed(0)
    return TorchBBM(cfg)


class _MockDenoiseTorch(torch.nn.Module):
    def forward(self, x_t, timesteps=None, context=None):
        return 0.1 * x_t + 0.05 * context


def _mock_denoise_torch():
    return _MockDenoiseTorch()


def _run_pair(objective, mt_type, clip):
    cfg = tiny_bbdm_config(BB={"params": {
        "objective": objective, "mt_type": mt_type, "eta": 0.0,
        "num_timesteps": 50, "sample_step": 8,
    }})
    cfg.BB.params.UNetParams.condition_key = "SpatialRescaler"

    ref = _reference_bbm(cfg)
    ref.denoise_fn = _mock_denoise_torch()

    ours = build_model(cfg, dtype=jnp.float32)
    ours.denoise = lambda params, x_t, t, context: 0.1 * x_t + 0.05 * context

    # identical step grids
    np.testing.assert_array_equal(
        np.asarray(ours.steps), ref.steps.numpy())

    rs = np.random.RandomState(3)
    y = rs.randn(2, 3, 8, 8).astype(np.float32) * 0.5

    with torch.no_grad():
        ref_out = ref.p_sample_loop(
            torch.from_numpy(y), context=torch.from_numpy(y),
            clip_denoised=clip).numpy()

    y_j = jnp.asarray(y.transpose(0, 2, 3, 1))
    out = np.asarray(ours.p_sample_loop(
        {}, jax.random.PRNGKey(0), y_j, context=y_j, clip_denoised=clip,
    )).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("objective", ["grad", "noise", "ysubx"])
def test_sampler_trajectory_matches_reference(objective):
    _run_pair(objective, "linear", clip=False)


def test_sampler_trajectory_matches_reference_sin_clip():
    _run_pair("grad", "sin", clip=True)


def test_mid_step_outputs_match_reference():
    cfg = tiny_bbdm_config(BB={"params": {
        "eta": 0.0, "num_timesteps": 50, "sample_step": 6,
    }})
    cfg.BB.params.UNetParams.condition_key = "SpatialRescaler"

    ref = _reference_bbm(cfg)
    ref.denoise_fn = _mock_denoise_torch()
    ours = build_model(cfg, dtype=jnp.float32)
    ours.denoise = lambda params, x_t, t, context: 0.1 * x_t + 0.05 * context

    rs = np.random.RandomState(4)
    y = rs.randn(1, 3, 8, 8).astype(np.float32) * 0.5

    with torch.no_grad():
        imgs_ref, one_ref = ref.p_sample_loop(
            torch.from_numpy(y), context=torch.from_numpy(y),
            clip_denoised=False, sample_mid_step=True)

    y_j = jnp.asarray(y.transpose(0, 2, 3, 1))
    imgs, one = ours.p_sample_loop(
        {}, jax.random.PRNGKey(0), y_j, context=y_j, clip_denoised=False,
        sample_mid_step=True)

    # reference returns [y, x_1, ..., x_S]; our scan stacks [x_1, ..., x_S]
    assert len(imgs_ref) == len(ours.steps) + 1
    for i in range(len(ours.steps)):
        np.testing.assert_allclose(
            np.asarray(imgs[i]).transpose(0, 3, 1, 2), imgs_ref[i + 1].numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"x at step {i}")
        np.testing.assert_allclose(
            np.asarray(one[i]).transpose(0, 3, 1, 2), one_ref[i].numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"x0_recon at step {i}")
