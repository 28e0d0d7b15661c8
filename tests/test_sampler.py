"""End-to-end sampler tests on a tiny U-Net (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import make_schedule
from ramp_tpu.guidance.apf import APFParams
from ramp_tpu.nn.unet import TemporalUnet
from ramp_tpu.sampler.ddim import ddim_sample_chain
from ramp_tpu.sampler.ddpm import ddpm_sample_chain
from ramp_tpu.sampler.energy import make_eps_fn
from ramp_tpu.sampler.guidance_fold import cfg_fold, compose_fold, guided_eps


H, D, B = 16, 4, 3


@pytest.fixture(scope="module")
def tiny_model():
    unet = TemporalUnet(state_dim=D, unet_input_dim=8, dim_mults=(1, 2),
                        attention_dim_head=8, depth_attn=1, context_dim=12)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, D))
    params = unet.init(key, x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 12)))
    eps_fn = make_eps_fn(unet.apply, energy_mode=True)
    return unet, params, eps_fn


def _endpoints():
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    return dfn.Endpoints(start=start, goal=goal)


@pytest.mark.slow
def test_guided_eps_cfg_combine(tiny_model):
    """CFG fold must equal the explicit (1+w)*cond - w*uncond combine."""
    _, params, eps_fn = tiny_model
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, H, D))
    t = jnp.full((B,), 5, jnp.int32)
    lat = jax.random.normal(key, (1, 12))
    w = 2.0
    fold = cfg_fold(lat, w)
    combined = guided_eps(eps_fn, params, x, t, fold)
    lat_b = jnp.broadcast_to(lat[None], (B, 1, 12))
    eps_cond = eps_fn(params, x, t, lat_b)
    eps_uncond = eps_fn(params, x, t, jnp.zeros_like(lat_b))
    expected = (1 + w) * eps_cond - w * eps_uncond
    np.testing.assert_allclose(np.asarray(combined), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_guided_eps_compose_combine(tiny_model):
    """Compose fold must equal out2 + w1(out0-out2) + w2(out1-out2)."""
    _, params, eps_fn = tiny_model
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, H, D))
    t = jnp.full((B,), 5, jnp.int32)
    lat_a = jax.random.normal(jax.random.PRNGKey(3), (1, 12))
    lat_b = jax.random.normal(jax.random.PRNGKey(4), (1, 12))
    w1, w2 = 2.0, 2.0
    fold = compose_fold(lat_a, lat_b, w1, w2)
    combined = guided_eps(eps_fn, params, x, t, fold)
    def e(lat):
        return eps_fn(params, x, t, jnp.broadcast_to(lat[None], (B, 1, 12)))
    out0, out1, out2 = e(lat_a), e(lat_b), e(jnp.zeros_like(lat_a))
    expected = out2 + w1 * (out0 - out2) + w2 * (out1 - out2)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_ddim_chain_shapes_and_endpoints(tiny_model):
    _, params, eps_fn = tiny_model
    sch = make_schedule("exponential", 100)
    fold = cfg_fold(jnp.zeros((1, 12)), 2.0)
    ep = _endpoints()
    x, chain = ddim_sample_chain(sch, eps_fn, params, jax.random.PRNGKey(0),
                                 (B, H, D), ep, fold, 5)
    assert x.shape == (B, H, D)
    assert chain.shape == (6, B, H, D)
    np.testing.assert_allclose(np.asarray(x[:, 0]),
                               np.broadcast_to(np.asarray(ep.start), (B, D)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, -1]),
                               np.broadcast_to(np.asarray(ep.goal), (B, D)), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(x)))


def test_ddim_chain_with_apf(tiny_model):
    _, params, eps_fn = tiny_model
    sch = make_schedule("exponential", 100)
    fold = cfg_fold(jnp.zeros((1, 12)), 2.0)
    ep = _endpoints()
    pts = jnp.zeros((32, 2))  # cluster at origin
    x, chain = ddim_sample_chain(sch, eps_fn, params, jax.random.PRNGKey(0),
                                 (B, H, D), ep, fold, 5,
                                 apf=APFParams(), apf_points=pts)
    assert np.all(np.isfinite(np.asarray(x)))


def test_ddpm_chain_extra_noiseless_steps(tiny_model):
    _, params, eps_fn = tiny_model
    sch = make_schedule("exponential", 25)
    fold = cfg_fold(jnp.zeros((1, 12)), 5.75)
    ep = _endpoints()
    x, chain = ddpm_sample_chain(sch, eps_fn, params, jax.random.PRNGKey(0),
                                 (B, H, D), ep, fold,
                                 n_diffusion_steps_without_noise=5,
                                 return_chain=True)
    assert chain.shape == (31, B, H, D)  # 25 + 5 + initial
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x[:, 0]),
                               np.broadcast_to(np.asarray(ep.start), (B, D)), atol=1e-6)


@pytest.mark.slow
def test_ddim_jit_once_for_different_scenes(tiny_model):
    """One compiled plan must serve different obstacle latents (traced args)."""
    _, params, eps_fn = tiny_model
    # at init the SpatialTransformer output conv is zero (SD-style zero-init),
    # so the scene latent has no effect; perturb params so it does
    k_perturb = jax.random.PRNGKey(42)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(k_perturb, len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    sch = make_schedule("exponential", 100)
    ep = _endpoints()

    import functools
    calls = {"n": 0}

    @functools.partial(jax.jit, static_argnames=())
    def plan(lat, key):
        fold = cfg_fold(lat, 2.0)
        x, _ = ddim_sample_chain(sch, eps_fn, params, key, (B, H, D), ep, fold, 5,
                                 return_chain=False)
        return x

    k = jax.random.PRNGKey(0)
    x1 = plan(jnp.zeros((1, 12)), k)
    x2 = plan(jnp.ones((1, 12)), k)
    assert plan._cache_size() == 1
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_ddim_times_3d_step_count_knob():
    """ddim_times_3d generalizes the reference's hardcoded T//5 divisor
    (diffusion_model_3d.py:234) into a step-count knob: default keeps the
    reference grid; n_ddim=k gives k (t, t_next) pairs plus the final
    (0, -1) sentinel pair."""
    from ramp_tpu.sampler.ddim import ddim_times_3d

    ref = np.asarray(ddim_times_3d(25))
    assert ref.tolist() == [24, 19, 14, 9, 4, 0, -1]
    assert np.array_equal(np.asarray(ddim_times_3d(25, 5)), ref)
    t12 = np.asarray(ddim_times_3d(25, 12))
    assert t12[0] == 24 and t12[-2] == 0 and t12[-1] == -1
    assert len(t12) == 14  # 12 denoise pairs + the (0, -1) x0 pair
    assert np.all(np.diff(t12) < 0)


def test_ddim_3d_clip_x0_repairs_divergence(tiny_model):
    """The reference's dormant 3-D DDIM (diffusion_model_3d.py:220-287)
    neither clips x0-hat nor recomputes the direction from it; under the
    exponential schedule alpha_bar(T-1) ~ 5.7e-11 the first
    predict_start_from_noise amplifies model error by ~1.3e5 and the chain
    diverges to workspace-boundary noise (which games collision metrics).
    clip_x0=True (our default) must keep the chain inside [-1, 1];
    clip_x0=False must reproduce the divergence."""
    from ramp_tpu.sampler.ddim import ddim_sample_chain_3d

    _, params, eps_fn = tiny_model
    sch = make_schedule("exponential", 25)
    fold = cfg_fold(jnp.zeros((1, 12)), 5.75)
    ep = _endpoints()

    x_fixed, _ = ddim_sample_chain_3d(sch, eps_fn, params,
                                      jax.random.PRNGKey(0), (B, H, D), ep,
                                      fold, clip_x0=True)
    assert np.all(np.isfinite(np.asarray(x_fixed)))
    assert np.abs(np.asarray(x_fixed)).max() <= 1.0 + 1e-5

    x_ref, _ = ddim_sample_chain_3d(sch, eps_fn, params,
                                    jax.random.PRNGKey(0), (B, H, D), ep,
                                    fold, clip_x0=False)
    interior = np.asarray(x_ref)[:, 1:-1]  # endpoints stay pinned
    assert np.abs(interior).max() > 10.0
