"""Golden-value tests of q_sample / posterior / DDIM step vs independent NumPy."""
import numpy as np
import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import make_schedule


def _np_tables(T=100):
    x = np.linspace(0, T, T)
    a = (1 / T) * np.log(1.0 / 1e-4)
    betas = 1e-4 * np.exp(a * x)
    alphas_cumprod = np.cumprod(np.clip(1 - betas, 1e-9, 1.0))
    return betas, alphas_cumprod


def test_q_sample_golden():
    sch = make_schedule("exponential", 100)
    _, ac = _np_tables()
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 8, 4)).astype(np.float32)
    noise = rng.normal(size=(4, 8, 4)).astype(np.float32)
    t = np.array([0, 10, 50, 99])
    got = dfn.q_sample(sch, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    expected = (np.sqrt(ac[t])[:, None, None] * x0
                + np.sqrt(1 - ac[t])[:, None, None] * noise)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=1e-5)


def test_posterior_golden():
    sch = make_schedule("exponential", 100)
    betas, ac = _np_tables()
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(3, 8, 4)).astype(np.float32)
    xt = rng.normal(size=(3, 8, 4)).astype(np.float32)
    t = np.array([1, 40, 99])
    mean, var, logvar = dfn.q_posterior(sch, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    c1 = betas * np.sqrt(ac_prev) / (1 - ac)
    c2 = (1 - ac_prev) * np.sqrt(np.clip(1 - betas, 1e-9, 1.0)) / (1 - ac)
    expected_mean = c1[t][:, None, None] * x0 + c2[t][:, None, None] * xt
    np.testing.assert_allclose(np.asarray(mean), expected_mean, rtol=2e-4, atol=1e-5)
    expected_var = (betas * (1 - ac_prev) / (1 - ac))[t][:, None, None]
    np.testing.assert_allclose(np.asarray(var), np.broadcast_to(expected_var, var.shape),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar),
                               np.broadcast_to(np.log(np.clip(expected_var, 1e-20, None)),
                                               logvar.shape), rtol=2e-3)


def test_predict_start_roundtrip():
    """x0 -> q_sample -> predict_start_from_noise(eps) recovers x0 exactly."""
    sch = make_schedule("exponential", 100)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    t = jnp.asarray([5, 60])
    xt = dfn.q_sample(sch, x0, t, noise)
    x0_hat = dfn.predict_start_from_noise(sch, xt, t, noise, predict_epsilon=True)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-2, atol=1e-3)


def test_hard_conditioning_pins_endpoints():
    x = jnp.zeros((3, 10, 4))
    conds = dfn.Endpoints(start=jnp.ones((3, 4)), goal=2 * jnp.ones((3, 4)))
    y = dfn.apply_hard_conditioning(x, conds)
    assert np.all(np.asarray(y[:, 0]) == 1.0)
    assert np.all(np.asarray(y[:, -1]) == 2.0)
    assert np.all(np.asarray(y[:, 1:-1]) == 0.0)


def test_ddim_step_exact_denoising_limit():
    """With a perfect eps oracle, DDIM recovers x0 when the final alpha is 1."""
    sch = make_schedule("exponential", 100)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(2, 8, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    t = jnp.asarray([0, 0])
    xt = dfn.q_sample(sch, x0, t, noise)
    # last DDIM step: t=0 -> prev timestep < 0 -> alpha_prev = 1
    x_prev = dfn.ddim_step(sch, xt, x0, t, step_ratio=20)
    # alpha_prev=1 => x_prev = x_recon + 0*model_output = x0
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_ddim_alpha_prev_branches():
    sch = make_schedule("exponential", 100)
    t = jnp.asarray([80, 20, 0])
    out = dfn.ddim_alpha_prod_prev(sch, t, 20, 3)
    ac = np.asarray(sch.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(out).ravel(),
                               [ac[60], ac[0], 1.0], rtol=1e-5)
