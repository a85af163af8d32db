"""Optimizer factory (reference `runners/utils.py:48-57`).

Produces a *unit-LR* optax transform — the learning rate is applied separately
from the PlateauState so ReduceLROnPlateau can live inside the jitted step.
torch parity notes:
  * Adam weight decay is L2-style (added to the gradient before the moments),
    i.e. ``add_decayed_weights`` *before* ``scale_by_adam``.
  * frozen subtrees (the LBBDM VQGAN) are masked out, so no moment memory is
    allocated for them.
"""

from __future__ import annotations

import optax


def build_optimizer(optim_config, trainable_mask=None) -> optax.GradientTransformation:
    name = optim_config.optimizer
    wd = optim_config.get("weight_decay", 0.0)
    if name == "Adam":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam(b1=optim_config.get("beta1", 0.9), b2=0.999))
        tx = optax.chain(*parts)
    elif name == "RMSProp":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        # torch RMSprop defaults: alpha=0.99, eps=1e-8. torch applies eps
        # OUTSIDE the sqrt (g / (sqrt(v) + eps)); optax's default is inside
        # (g / sqrt(v + eps)) — eps_in_sqrt=False selects torch semantics
        # (trajectory parity asserted by tests/test_golden_optim.py).
        parts.append(optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False))
        tx = optax.chain(*parts)
    elif name == "SGD":
        tx = optax.trace(decay=0.9)  # torch SGD(momentum=0.9)
    else:
        raise NotImplementedError(f"Optimizer {name} not understood.")

    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx
