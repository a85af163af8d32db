"""Bridge model identities: q_sample/predict_x0 round trips, loss, sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.models import build_model
from tests.conftest import tiny_bbdm_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_bbdm_config()
    m = build_model(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    return m, params


def _data(key, b=2, s=8, c=3):
    kx, ky = jax.random.split(jax.random.PRNGKey(key))
    return (jax.random.normal(kx, (b, s, s, c)), jax.random.normal(ky, (b, s, s, c)))


@pytest.mark.parametrize("objective", ["grad", "noise", "ysubx"])
def test_q_sample_predict_x0_roundtrip(objective):
    """With the *true* objective as prediction, predict_x0 must recover x0
    exactly (all three modes, reference BrownianBridgeModel.py:128-160)."""
    cfg = tiny_bbdm_config(BB={"params": {"objective": objective}})
    m = build_model(cfg)
    x0, y = _data(1)
    t = jnp.array([3, 40])
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    x_t, obj = m.q_sample(x0, y, t, noise)
    m_t = jnp.asarray(m.schedule.m_t)[t].reshape(-1, 1, 1, 1)
    sigma_t = jnp.sqrt(jnp.asarray(m.schedule.variance_t)[t]).reshape(-1, 1, 1, 1)
    x0_rec = m.predict_x0_from_objective(x_t, y, obj, m_t=m_t, sigma_t=sigma_t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_q_sample_interpolates(model_and_params):
    """x_t at t=0 is ~x0, at t=T-1 is ~y (m: 0.001 -> 0.999)."""
    m, _ = model_and_params
    x0, y = _data(3)
    zero_noise = jnp.zeros_like(x0)
    x_lo, _ = m.q_sample(x0, y, jnp.array([0, 0]), zero_noise)
    x_hi, _ = m.q_sample(x0, y, jnp.array([49, 49]), zero_noise)
    assert float(jnp.abs(x_lo - x0).mean()) < 5e-3
    assert float(jnp.abs(x_hi - y).mean()) < 5e-3


def test_loss_finite_and_deterministic(model_and_params):
    m, params = model_and_params
    x0, y = _data(4)
    l1, _ = m.loss(params, jax.random.PRNGKey(7), x0, y)
    l2, _ = m.loss(params, jax.random.PRNGKey(7), x0, y)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)


def test_l2_loss():
    cfg = tiny_bbdm_config(BB={"params": {"loss_type": "l2"}})
    m = build_model(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    x0, y = _data(5)
    loss, _ = m.loss(params, jax.random.PRNGKey(1), x0, y)
    assert np.isfinite(float(loss))


def test_sampler_shapes_and_determinism(model_and_params):
    m, params = model_and_params
    _, y = _data(6)
    s1 = m.sample(params, jax.random.PRNGKey(1), y)
    s2 = m.sample(params, jax.random.PRNGKey(1), y)
    s3 = m.sample(params, jax.random.PRNGKey(2), y)
    assert s1.shape == y.shape
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert float(jnp.abs(s1 - s3).max()) > 0  # eta=1 -> stochastic


def test_sampler_mid_steps(model_and_params):
    m, params = model_and_params
    _, y = _data(8)
    imgs, one_step = m.sample(params, jax.random.PRNGKey(1), y, sample_mid_step=True)
    S = len(m.steps)
    assert imgs.shape == (S,) + y.shape
    assert one_step.shape == (S,) + y.shape


def test_nocond_ignores_context():
    cfg = tiny_bbdm_config(
        BB={"params": {"UNetParams": {"condition_key": "nocond", "in_channels": 3}}}
    )
    m = build_model(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    x0, y = _data(9)
    loss, _ = m.loss(params, jax.random.PRNGKey(1), x0, y)
    assert np.isfinite(float(loss))


def test_grad_flows(model_and_params):
    m, params = model_and_params
    x0, y = _data(10)
    g = jax.grad(lambda p: m.loss(p, jax.random.PRNGKey(3), x0, y)[0])(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_loss_dropout_train_mode():
    """With UNet dropout > 0 the loss path (train=True, reference net stays
    in train mode during the loss, BaseRunner.py:398-417) must thread a
    dropout rng: finite, deterministic per rng, varying across rngs."""
    cfg = tiny_bbdm_config(BB={"params": {"UNetParams": {"dropout": 0.5}}})
    m = build_model(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    x0, y = _data(11)
    l1, _ = m.loss(params, jax.random.PRNGKey(1), x0, y)
    l1b, _ = m.loss(params, jax.random.PRNGKey(1), x0, y)
    l2, _ = m.loss(params, jax.random.PRNGKey(2), x0, y)
    assert np.isfinite(float(l1)) and float(l1) == float(l1b)
    # dropout masks differ across rngs (beyond the t/noise draw differences);
    # sampling ignores dropout entirely (train=False path)
    assert float(l1) != float(l2)
    s = m.sample(params, jax.random.PRNGKey(3), y)
    assert bool(jnp.isfinite(s).all())


def test_upsample_conv_train_eval_parity():
    """UpsampleConv3x3's train=True naive lowering and train=False subpixel
    decomposition are the same function (exact in fp32) — checkpoints and
    loss/sampler numerics interchange (BENCH_NOTES.md round 2)."""
    from bbdm_tpu.models.layers import UpsampleConv3x3

    mod = UpsampleConv3x3(16, dtype=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
    # n.b. the `init` field (param initializer) shadows Module.init
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params = {"kernel": 0.1 * jax.random.normal(k1, (3, 3, 12, 16)),
              "bias": jax.random.normal(k2, (16,))}
    train_out = mod.apply({"params": params}, x, True)
    eval_out = mod.apply({"params": params}, x, False)
    np.testing.assert_allclose(np.asarray(train_out), np.asarray(eval_out),
                               atol=1e-5, rtol=1e-5)


def test_multi_sample_stacks_distinct_draws(model_and_params):
    """num_samples>1 returns [n, B, H, W, C] with distinct stochastic draws
    in one compiled call (runner sample_to_eval path)."""
    m, params = model_and_params
    _, y = _data(12)
    outs = m.sample(params, jax.random.PRNGKey(5), y, num_samples=3)
    assert outs.shape == (3,) + y.shape
    assert float(jnp.abs(outs[0] - outs[1]).max()) > 0
    assert float(jnp.abs(outs[1] - outs[2]).max()) > 0
