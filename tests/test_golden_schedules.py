"""Golden schedule parity: every buffer the reference registers
(`model/BrownianBridge/BrownianBridgeModel.py:42-79`) against our precomputed
schedule arrays, for both mt types and both skip grids."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bbdm_tpu.models.schedules import make_bridge_schedule, make_sampling_steps  # noqa: E402
from tests.conftest import tiny_bbdm_config  # noqa: E402

REF = "/root/reference"


def _ref_bbm(mt_type, sample_type, T=50, S=8):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )

    cfg = tiny_bbdm_config(BB={"params": {
        "mt_type": mt_type, "sample_type": sample_type,
        "num_timesteps": T, "sample_step": S,
    }})
    torch.manual_seed(0)
    return TorchBBM(cfg)


@pytest.mark.parametrize("mt_type", ["linear", "sin"])
def test_schedule_buffers_match(mt_type):
    T = 50
    ref = _ref_bbm(mt_type, "linear", T=T)
    sched = make_bridge_schedule(T, mt_type, 1.0)
    np.testing.assert_allclose(np.asarray(sched.m_t), ref.m_t.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.variance_t),
                               ref.variance_t.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance_t),
                               ref.posterior_variance_t.numpy(),
                               rtol=1e-5, atol=1e-9)


def test_linear_skip_grid_matches():
    ref = _ref_bbm("linear", "linear", T=50, S=8)
    steps = make_sampling_steps(50, True, "linear", 8)
    np.testing.assert_array_equal(np.asarray(steps), ref.steps.numpy())


def test_full_grid_matches_when_skip_disabled():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.BrownianBridge.BrownianBridgeModel import (
        BrownianBridgeModel as TorchBBM,
    )

    cfg = tiny_bbdm_config(BB={"params": {"skip_sample": False,
                                          "num_timesteps": 30}})
    ref = TorchBBM(cfg)
    steps = make_sampling_steps(30, False, "linear", 30)
    np.testing.assert_array_equal(np.asarray(steps), ref.steps.numpy())
