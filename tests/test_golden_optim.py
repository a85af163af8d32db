"""Optimizer + plateau-scheduler trajectory parity vs torch (VERDICT r2 #4).

Drives torch.optim.{Adam,RMSprop,SGD} (constructed exactly as the reference
factory does, `runners/utils.py:48-57`) together with
``ReduceLROnPlateau`` against our unit-LR optax chains
(`bbdm_tpu/training/optim.py`) + ``plateau_step`` over a scripted gradient
and loss sequence, asserting parameter-trajectory parity leaf-by-leaf in
fp64 and an identical LR schedule (including two plateau reductions and the
cooldown window).

The update application mirrors `training/step.py`: the CURRENT update uses
the pre-transition LR (the reference calls ``scheduler.step(loss)`` after
``optimizer.step()``, `runners/BaseRunner.py:413-417`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.config import dict2namespace  # noqa: E402
from bbdm_tpu.training.optim import build_optimizer  # noqa: E402
from bbdm_tpu.training.plateau import plateau_init, plateau_step  # noqa: E402

LR0 = 1e-2
SCHED = dict(factor=0.5, patience=3, threshold=1e-2, cooldown=2, min_lr=1e-4)
N_STEPS = 60

# loss script: improves for 10 steps, then flatlines -> two plateau
# reductions (with a cooldown window between), then improves again
LOSSES = ([1.0 - 0.05 * i for i in range(10)]
          + [0.55] * 30
          + [0.55 - 0.02 * i for i in range(1, 21)])


def _shapes():
    return {"w": (4, 3), "b": (3,), "k": (2, 2, 3, 3)}


def _grad_script(step, shapes):
    rs = np.random.RandomState(1000 + step)
    return {k: rs.randn(*s) for k, s in shapes.items()}


def _torch_optimizer(name, params, wd):
    # exactly the reference factory (`runners/utils.py:48-57`)
    if name == "Adam":
        return torch.optim.Adam(params, lr=LR0, weight_decay=wd, betas=(0.9, 0.999))
    if name == "RMSProp":
        return torch.optim.RMSprop(params, lr=LR0, weight_decay=wd)
    return torch.optim.SGD(params, lr=LR0, momentum=0.9)


@pytest.mark.parametrize("name,wd", [
    ("Adam", 0.0), ("Adam", 0.01),
    ("RMSProp", 0.0), ("RMSProp", 0.01),
    ("SGD", 0.0),
])
def test_optimizer_plateau_trajectory_parity(name, wd):
    shapes = _shapes()
    rs = np.random.RandomState(0)
    init = {k: rs.randn(*s) for k, s in shapes.items()}

    # ---- torch fp64
    tparams = {k: torch.tensor(v, dtype=torch.float64, requires_grad=True)
               for k, v in init.items()}
    topt = _torch_optimizer(name, list(tparams.values()), wd)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", **SCHED)
    torch_lrs = []
    for step in range(N_STEPS):
        g = _grad_script(step, shapes)
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k], dtype=torch.float64)
        # PlateauState stores the LR in float32 (the production dtype inside
        # the jitted step); snap torch's applied LR to the same grid so the
        # trajectory comparison isolates optimizer semantics, not f32 LR
        # representation error
        for pg in topt.param_groups:
            pg["lr"] = float(np.float32(pg["lr"]))
        torch_lrs.append(topt.param_groups[0]["lr"])
        topt.step()
        tsched.step(LOSSES[step])

    # ---- ours fp64 (x64 so trajectory drift is purely semantic)
    with jax.enable_x64(True):
        cfg = dict2namespace({"optimizer": name, "weight_decay": wd,
                              "lr": LR0, "beta1": 0.9})
        tx = build_optimizer(cfg)
        params = {k: jnp.asarray(v, jnp.float64) for k, v in init.items()}
        opt_state = tx.init(params)
        pl = plateau_init(LR0)
        our_lrs = []
        for step in range(N_STEPS):
            g = {k: jnp.asarray(v, jnp.float64)
                 for k, v in _grad_script(step, shapes).items()}
            updates, opt_state = tx.update(g, opt_state, params)
            lr = pl.lr  # pre-transition LR, as in training/step.py
            pl = plateau_step(pl, jnp.asarray(LOSSES[step]), **SCHED)
            our_lrs.append(float(lr))
            params = jax.tree_util.tree_map(
                lambda p, u: p - jnp.float64(lr) * u, params, updates)

        np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-6,
                                   err_msg="LR schedule diverged")
        # the scripted losses must actually have exercised the scheduler
        assert torch_lrs[-1] < LR0 / 3, "plateau never reduced the LR"
        for k in shapes:
            np.testing.assert_allclose(
                np.asarray(params[k]), tparams[k].detach().numpy(),
                rtol=1e-6, atol=1e-9,
                err_msg=f"{name} wd={wd}: trajectory diverged at leaf {k}")
