"""Beta schedules vs closed-form / reference formulas.

Parity targets: reference models/diffusion.py:312-326.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from osteosarcoma_diffusionmodel_tpu.ops.schedules import (
    DiffusionSchedule,
    ddim_timesteps,
    get_beta_schedule,
)


def test_linear_schedule_endpoints():
    betas = np.asarray(get_beta_schedule("linear", 1000))
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_matches_formula():
    num_steps = 1000
    betas = np.asarray(get_beta_schedule("cosine", num_steps))
    # Independent numpy recomputation of the Nichol-Dhariwal schedule.
    steps = np.arange(num_steps + 1, dtype=np.float64) / num_steps
    acp = np.cos((steps + 0.008) / 1.008 * np.pi / 2) ** 2
    acp = acp / acp[0]
    expected = np.clip(1 - acp[1:] / acp[:-1], 0.0001, 0.9999)
    np.testing.assert_allclose(betas, expected, rtol=2e-4, atol=2e-6)


def test_sigmoid_schedule_bounds():
    betas = np.asarray(get_beta_schedule("sigmoid", 100))
    assert betas.min() >= 1e-4 - 1e-8
    assert betas.max() <= 0.02 + 1e-8


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        get_beta_schedule("nope", 10)


def test_schedule_coefficients_consistency():
    sched = DiffusionSchedule.create("cosine", 200)
    acp = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2, acp, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2,
        1 - acp,
        rtol=1e-4,
        atol=1e-6,
    )
    # Posterior mean coefficients sum sanity: c0*sqrt(acp_t) + c1 ~= known identity.
    # Check posterior variance formula directly at a few t.
    betas = np.asarray(sched.betas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    expected_var = (1 - acp_prev) / (1 - acp) * betas
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), expected_var, rtol=1e-5
    )


def test_ddim_timesteps():
    ts = ddim_timesteps(1000, 50)
    assert len(ts) == 50
    assert ts[0] == 0
    assert ts[-1] < 1000
    assert np.all(np.diff(ts) > 0)
    # Degenerate: as many sampling steps as train steps.
    full = ddim_timesteps(100, 100)
    np.testing.assert_array_equal(full, np.arange(100))
