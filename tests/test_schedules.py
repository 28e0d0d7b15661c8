"""Golden-value tests of beta schedules and diffusion tables vs independent
NumPy math and (where cheap) the torch-CPU formulas the reference uses."""
import numpy as np
import jax.numpy as jnp
import pytest

from ramp_tpu.core.schedules import (
    BETA_SCHEDULES, make_schedule, ddim_timesteps, exponential_beta_schedule,
    cosine_beta_schedule,
)


def test_exponential_schedule_matches_torch_formula():
    # independent recomputation with torch to cross-check linspace semantics
    import torch
    T = 100
    x = torch.linspace(0, T, T)
    a = (1 / T) * torch.log(torch.tensor(1.0) / torch.tensor(1e-4))
    expected = (1e-4 * torch.exp(a * x)).numpy()
    got = exponential_beta_schedule(T)
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    assert got[0] == pytest.approx(1e-4)
    assert got[-1] == pytest.approx(1.0, rel=1e-5)


def test_cosine_schedule_range():
    betas = cosine_beta_schedule(100)
    assert betas.shape == (100,)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)


@pytest.mark.parametrize("name", list(BETA_SCHEDULES))
def test_all_schedules_valid(name):
    betas = BETA_SCHEDULES[name](50)
    assert betas.shape == (50,)
    if name != "variance_preserving":
        # the reference's variance-preserving formula yields beta[0] < 0 at
        # x=0 (helpers.py:55-62); it is unused by shipped configs
        assert np.all(betas > 0)
    assert np.all(betas <= 1.0 + 1e-9)


def test_tables_consistency():
    sch = make_schedule("exponential", 100)
    # mirror make_schedule's clip guard (beta_end == 1.0 -> alpha floor 1e-9)
    alphas = np.clip(1 - np.asarray(sch.betas, np.float64), 1e-9, 1.0)
    np.testing.assert_allclose(np.asarray(sch.alphas_cumprod), np.cumprod(alphas),
                               rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sch.alphas_cumprod_prev)[1:],
                               np.asarray(sch.alphas_cumprod)[:-1], rtol=1e-6)
    assert sch.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(
        np.asarray(sch.sqrt_alphas_cumprod) ** 2 + np.asarray(sch.sqrt_one_minus_alphas_cumprod) ** 2,
        1.0, atol=1e-5)
    # posterior mean coefficients sum behavior at x_start == x_t == x
    c1 = np.asarray(sch.posterior_mean_coef1)
    c2 = np.asarray(sch.posterior_mean_coef2)
    assert np.all(c1 >= 0) and np.all(c2 >= 0)


def test_ddim_timesteps_table():
    np.testing.assert_array_equal(ddim_timesteps(100, 10),
                                  np.array([90, 80, 70, 60, 50, 40, 30, 20, 10, 0]))
    np.testing.assert_array_equal(ddim_timesteps(100, 5),
                                  np.array([80, 60, 40, 20, 0]))
    np.testing.assert_array_equal(ddim_timesteps(100, 8),
                                  np.array([84, 72, 60, 48, 36, 24, 12, 0]))


def test_ddim_timesteps_validates_range():
    import pytest
    from ramp_tpu.core.schedules import ddim_timesteps
    with pytest.raises(ValueError):
        ddim_timesteps(100, 150)  # ratio would truncate to 0 (no-op sampler)
    with pytest.raises(ValueError):
        ddim_timesteps(100, 0)
    assert ddim_timesteps(100, 100).tolist()[0] == 99
