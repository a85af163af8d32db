"""Schedule math vs closed form (SURVEY.md §4 unit-test plan)."""

import numpy as np
import pytest

from bbdm_tpu.models.schedules import (
    make_bridge_schedule,
    make_m_schedule,
    make_sampler_coeffs,
    make_sampling_steps,
)


def test_linear_mt_endpoints():
    m = make_m_schedule(1000, "linear")
    assert m[0] == pytest.approx(0.001)
    assert m[-1] == pytest.approx(0.999)
    assert np.all(np.diff(m) > 0)


def test_sin_mt_normalized():
    m = make_m_schedule(1000, "sin")
    assert m[-1] == pytest.approx(0.999)
    assert np.all(m > 0) and np.all(m <= 1.0)
    assert np.all(np.diff(m[:-1]) > 0)


def test_variance_closed_form():
    sched = make_bridge_schedule(100, "linear", max_var=0.5)
    m = make_m_schedule(100, "linear")
    np.testing.assert_allclose(sched.variance_t, 2 * (m - m**2) * 0.5, rtol=1e-6)
    # posterior variance identity: var_t_tminus * var_tminus / var_t
    vt = sched.variance_t.astype(np.float64)
    vtm = np.append(0.0, vt[:-1])
    mtm = np.append(0.0, m[:-1])
    vttm = vt - vtm * ((1 - m) / (1 - mtm)) ** 2
    np.testing.assert_allclose(
        sched.posterior_variance_t, vttm * vtm / vt, rtol=1e-4, atol=1e-7
    )


def test_linear_skip_grid_matches_reference_semantics():
    # torch: arange(999, 1, -(999/198)).long() then cat([1, 0])
    steps = make_sampling_steps(1000, True, "linear", 200)
    assert len(steps) == 200
    assert steps[0] == 999
    assert steps[-2] == 1 and steps[-1] == 0
    assert np.all(np.diff(steps) < 0)  # strictly descending
    # spot-check truncation semantics against the torch formula
    mid = np.arange(999, 1, -(999 / 198))
    assert list(steps[:198]) == [int(v) for v in mid]


def test_no_skip_grid():
    steps = make_sampling_steps(10, False, "linear", 5)
    assert list(steps) == list(range(9, -1, -1))


def test_cosine_grid_ends_at_zero():
    steps = make_sampling_steps(1000, True, "cosine", 50)
    assert steps[-1] == 0
    assert steps.dtype == np.int64


def test_sampler_coeffs_terminal_step():
    steps = make_sampling_steps(100, True, "linear", 10)
    c = make_sampler_coeffs(100, "linear", 1.0, steps, eta=1.0)
    # terminal: x_next == x0_hat
    assert c.a_xt[-1] == 0 and c.a_x0[-1] == 1 and c.a_y[-1] == 0 and c.sigma[-1] == 0


def test_sampler_coeffs_match_reference_formula():
    """Re-derive the reference p_sample arithmetic (BrownianBridgeModel.py:190-201)
    independently and check the folded linear coefficients reproduce it."""
    T, S, eta = 100, 10, 0.7
    steps = make_sampling_steps(T, True, "linear", S)
    c = make_sampler_coeffs(T, "linear", 1.0, steps, eta=eta)
    m = make_m_schedule(T, "linear")
    var = 2 * (m - m**2)

    rs = np.random.RandomState(0)
    x_t = rs.randn(4)
    x0 = rs.randn(4)
    y = rs.randn(4)
    noise = rs.randn(4)

    for i in range(len(steps) - 1):
        t, nt = steps[i], steps[i + 1]
        m_t, m_nt, var_t, var_nt = m[t], m[nt], var[t], var[nt]
        sigma2 = (var_t - var_nt * (1 - m_t) ** 2 / (1 - m_nt) ** 2) * var_nt / var_t
        ref = (
            (1 - m_nt) * x0 + m_nt * y
            + np.sqrt((var_nt - sigma2) / var_t) * (x_t - (1 - m_t) * x0 - m_t * y)
            + eta * np.sqrt(sigma2) * noise
        )
        ours = c.a_xt[i] * x_t + c.a_x0[i] * x0 + c.a_y[i] * y + c.sigma[i] * noise
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_eta_zero_is_deterministic():
    steps = make_sampling_steps(100, True, "linear", 10)
    c = make_sampler_coeffs(100, "linear", 1.0, steps, eta=0.0)
    assert np.all(c.sigma == 0)


def test_cosine_grid_has_no_duplicate_steps():
    """np.round of a cosine grid collides near both ends; duplicates are
    identity sampler steps (wasted UNet forwards) and must be dropped
    (ADVICE r1)."""
    steps = make_sampling_steps(1000, True, "cosine", 200)
    assert (np.diff(steps) < 0).all(), "grid must be strictly decreasing"
    assert steps[0] == 999 and steps[-1] == 0
