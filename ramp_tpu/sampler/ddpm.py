"""Jitted ancestral DDPM chain (used by the 3-D planner and as the static
DDPM fallback path).

Behavioral parity with `sample_functions.py:19-48` +
`diffusion_model_static.py:231-256` / `diffusion_model_3d.py:184-218`:
loop i = T-1 .. -n_extra; for i < 0 the timestep clamps to 0 and (because the
clamped t == 0) the injected noise is zero — those are the reference's
"extra no-noise steps". An optional extra noise-std schedule scales the
injected noise (the static harness passes a constant 0.5,
`inference_static.py:143`; the dynamic DDPM path uses (t/T)^2,
`sample_functionsdynamic.py:272`).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import DiffusionSchedule
from ramp_tpu.guidance.apf import APFParams, apf_batch_fn
from ramp_tpu.sampler.guidance_fold import GuidanceFold, guided_eps


def ddpm_sample_chain(sch: DiffusionSchedule,
                      eps_fn,
                      params,
                      key: jax.Array,
                      shape: Tuple[int, int, int],
                      endpoints: dfn.Endpoints,
                      fold: GuidanceFold,
                      *,
                      n_diffusion_steps_without_noise: int = 0,
                      noise_std_fn: Optional[Callable] = None,
                      predict_epsilon: bool = True,
                      clip_denoised: bool = True,
                      apf: Optional[APFParams] = None,
                      apf_points: Optional[jax.Array] = None,
                      resample_steps: int = 1,
                      return_chain: bool = False):
    """Full ancestral chain. Returns (x_final, chain [T+n_extra+1, B, H, D]).

    `resample_steps` > 1 repeats each denoise step, re-noising the result back
    to the same timestep with q_sample between repeats — the 3-D model's
    resampling loop (`diffusion_model_3d.py:199-210`; it ships with
    resample_steps=1, i.e. disabled, and so does this default).
    """
    b, h, d = shape
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, jnp.float32)
    x = dfn.apply_hard_conditioning(x, endpoints)

    raw_ts = jnp.arange(sch.n_steps - 1, -n_diffusion_steps_without_noise - 1, -1)
    forward_ts = jnp.arange(raw_ts.shape[0])
    step_keys = jax.random.split(key, raw_ts.shape[0])

    def denoise_once(x, i, forward_t, k, t):
        e = guided_eps(eps_fn, params, x, t, fold)
        x_recon = dfn.predict_start_from_noise(sch, x, t, e, predict_epsilon)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean, _, log_var = dfn.q_posterior(sch, x_recon, x, t)
        if apf is not None and apf_points is not None:
            # ref diffusion_model_static.py:176-185 (DDPM branch: single APF
            # pass on the posterior mean once forward_t > 20)
            apf_step = apf_batch_fn(apf.backend)
            mean = jax.lax.cond(
                forward_t > apf.apply_from_step,
                lambda m: apf_step(m, apf_points, apf.distance_threshold,
                                   apf.strength, apf.window),
                lambda m: m, mean)
        std = jnp.exp(0.5 * log_var)
        noise = jax.random.normal(k, x.shape, jnp.float32)
        noise = jnp.where((t == 0)[:, None, None], 0.0, noise)
        noise_std = 1.0 if noise_std_fn is None else noise_std_fn(i)
        x = mean + std * noise * noise_std
        return dfn.apply_hard_conditioning(x, endpoints)

    def step(x, scan_in):
        i, forward_t, k = scan_in
        t = jnp.full((b,), jnp.maximum(i, 0), jnp.int32)
        if resample_steps <= 1:
            x = denoise_once(x, i, forward_t, k, t)
        else:
            # unrolled (resample_steps is static and small): denoise, then
            # diffuse back to t and denoise again
            for r in range(resample_steps):
                k, k_dn, k_q = jax.random.split(k, 3)
                x = denoise_once(x, i, forward_t, k_dn, t)
                if r < resample_steps - 1:
                    x = dfn.q_sample(sch, x, t, jax.random.normal(k_q, x.shape,
                                                                  jnp.float32))
                    x = dfn.apply_hard_conditioning(x, endpoints)
        return x, (x if return_chain else None)

    x0_chain = x
    x, chain = jax.lax.scan(step, x, (raw_ts, forward_ts, step_keys))
    if return_chain:
        chain = jnp.concatenate([x0_chain[None], chain], axis=0)
    return x, chain
