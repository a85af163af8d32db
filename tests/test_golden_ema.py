"""Golden EMA parity: our functional ema_update vs the reference shadow-dict
EMA (`runners/base/EMA.py:4-43`), including the with_decay warmup gate."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.training.ema import ema_init, ema_update  # noqa: E402

REF = "/root/reference"


def test_ema_sequence_matches_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from runners.base.EMA import EMA

    torch.manual_seed(0)
    net = torch.nn.Sequential(torch.nn.Linear(4, 8), torch.nn.Linear(8, 2))
    ema = EMA(ema_decay=0.9)
    ema.register(net)

    params = {n: jnp.asarray(p.detach().numpy()) for n, p in net.named_parameters()}
    shadow = ema_init(params)

    rs = np.random.RandomState(0)
    # interleave warmup (with_decay=False -> plain copy) and decayed updates,
    # mirroring the reference's start_ema_step gate (BaseRunner.py:173-178)
    for step, with_decay in enumerate([False, False, True, True, True]):
        with torch.no_grad():
            for p in net.parameters():
                p.add_(torch.from_numpy(rs.randn(*p.shape).astype(np.float32)) * 0.1)
        ema.update(net, with_decay=with_decay)

        params = {n: jnp.asarray(p.detach().numpy()) for n, p in net.named_parameters()}
        shadow = ema_update(shadow, params, 0.9, jnp.asarray(with_decay))

        for name in params:
            np.testing.assert_allclose(
                np.asarray(shadow[name]), ema.shadow[name].numpy(),
                rtol=1e-6, atol=1e-7, err_msg=f"{name} @ step {step}")
