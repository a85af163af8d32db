"""Second-order (Heun) reverse sampler — an extension knob with no reference
equivalent (`BB.params.sampler: heun`, models/bridge.py).

The claim that justifies the feature is tested head-on: at MATCHED NFE
(two UNet evals per Heun step vs one per reference/Euler step), Heun's
integration error against a dense-grid solution is strictly smaller — i.e.
it buys few-step sampling the reference's first-order posterior step cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.models import build_model


def make_cfg(sampler, sample_step, *, skip=True, eta=0.0, T=100):
    return dict2namespace({
        "model_name": "heun-test", "model_type": "BBDM", "mixed_precision": False,
        "BB": {
            "optimizer": {"weight_decay": 0.0, "optimizer": "Adam",
                          "lr": 1e-4, "beta1": 0.9},
            "lr_scheduler": {"factor": 0.5, "patience": 10, "threshold": 1e-4,
                             "cooldown": 10, "min_lr": 1e-7},
            "params": {
                "mt_type": "linear", "objective": "grad", "loss_type": "l1",
                "skip_sample": skip, "sample_type": "linear",
                "sample_step": sample_step, "num_timesteps": T,
                "eta": eta, "max_var": 1.0, "sampler": sampler,
                "UNetParams": {
                    "image_size": 8, "in_channels": 6, "model_channels": 32,
                    "out_channels": 3, "num_res_blocks": 1,
                    "attention_resolutions": (4,), "channel_mult": (1, 2),
                    "conv_resample": True, "dims": 2, "num_heads": 4,
                    "num_head_channels": 8, "use_scale_shift_norm": True,
                    "resblock_updown": False, "use_spatial_transformer": False,
                    "context_dim": None, "condition_key": "SpatialRescaler",
                },
            },
        },
    })


def random_params(model, scale=0.05):
    """Non-degenerate weights: at raw init the zero_module output convs make
    the UNet output exactly 0 (x0_hat == x_t for the grad objective), which
    would collapse the dynamics to a linear map both samplers integrate too
    well to rank."""
    params = model.init_params(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [scale * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


Y = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 3))
RNG = jax.random.PRNGKey(9)


def run(sampler, sample_step, params, *, skip=True, eta=0.0, **kw):
    m = build_model(make_cfg(sampler, sample_step, skip=skip, eta=eta))
    fn = jax.jit(lambda p, r, y: m.p_sample_loop(p, r, y, **kw))
    return m, jax.device_get(fn(params, RNG, Y))


@pytest.mark.slow
def test_heun_beats_euler_at_matched_nfe():
    """Deterministic (eta=0) integration error vs the dense-grid (full-T Heun)
    solution: Heun at S steps costs 2(S-1)+1 UNet evals; it must beat Euler at
    2S steps (matched NFE) at every measured budget, and converge as S grows.
    Margins observed on this fixed seed: ~1.2-1.9x lower error (the probe run
    recorded euler {16: .081, 32: .056} vs heun {8: .068, 16: .041})."""
    model = build_model(make_cfg("heun", 0, skip=False))
    params = random_params(model)
    ref = jax.device_get(jax.jit(
        lambda p, r, y: model.p_sample_loop(p, r, y))(params, RNG, Y))
    assert np.isfinite(ref).all()

    err = {}
    for sampler, S in (("euler", 16), ("euler", 32), ("heun", 8), ("heun", 16)):
        _, out = run(sampler, S, params)
        err[(sampler, S)] = float(np.abs(out - ref).mean())

    assert err[("heun", 8)] < err[("euler", 16)], err   # NFE 15 vs 16
    assert err[("heun", 16)] < err[("euler", 32)], err  # NFE 31 vs 32
    assert err[("heun", 16)] < err[("heun", 8)], err    # converging in S


def test_heun_contract():
    """Shape/finiteness/mid-step/num_samples contracts match the euler path;
    eta=1.0 (the template protocol) runs stochastically; the knob validates."""
    model = build_model(make_cfg("heun", 8, eta=1.0))
    params = random_params(model)

    out = jax.device_get(jax.jit(
        lambda p, r, y: model.p_sample_loop(p, r, y))(params, RNG, Y))
    assert out.shape == Y.shape and np.isfinite(out).all()

    # mid-step: same [S, B, H, W, C] stacked contract as euler
    S = len(model.coeffs.steps)
    imgs, one_step = jax.device_get(jax.jit(
        lambda p, r, y: model.p_sample_loop(p, r, y, sample_mid_step=True)
    )(params, RNG, Y))
    assert imgs.shape == (S,) + Y.shape and one_step.shape == (S,) + Y.shape
    # the scan tail is the terminal x0_hat — identical to the non-mid output
    np.testing.assert_allclose(imgs[-1], out, rtol=1e-5, atol=1e-6)
    assert np.isfinite(imgs).all() and np.isfinite(one_step).all()

    # num_samples>1 folds draws into one compiled call, heun included
    outs = jax.device_get(jax.jit(
        lambda p, r, y: model.sample(p, r, y, num_samples=2))(params, RNG, Y))
    assert outs.shape == (2,) + Y.shape and np.isfinite(outs).all()
    assert np.abs(outs[0] - outs[1]).max() > 0  # eta=1: distinct draws

    with pytest.raises(NotImplementedError):
        build_model(make_cfg("rk45", 8))
