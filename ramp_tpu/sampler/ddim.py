"""Jitted DDIM reverse chain: the static-planning hot loop.

Behavioral parity with `diffusion_model_static.py:259-384` (ddim_p_sample /
ddim_p_sample_loop with use_clipped_model_output=True, eta=0, CFG or energy
composition, optional APF refinement of x0-hat from forward step >= 2 with 3
re-query passes, endpoint pinning after every step).

TPU design: the whole chain is a single `lax.scan` under jit — one
compilation serves every scene/context because obstacle latents, start and
goal are arguments (the reference re-`torch.compile`s per environment,
`inference_static.py:114`). RNG is an explicit key; no host sync anywhere.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import DiffusionSchedule, ddim_timesteps
from ramp_tpu.guidance.apf import APFParams, apf_batch_fn
from ramp_tpu.sampler.guidance_fold import GuidanceFold, guided_eps


def ddim_sample_chain(sch: DiffusionSchedule,
                      eps_fn,
                      params,
                      key: jax.Array,
                      shape: Tuple[int, int, int],
                      endpoints: dfn.Endpoints,
                      fold: GuidanceFold,
                      num_inference_steps: int,
                      *,
                      predict_epsilon: bool = True,
                      clip_denoised: bool = True,
                      apf: Optional[APFParams] = None,
                      apf_points: Optional[jax.Array] = None,
                      x_init: Optional[jax.Array] = None,
                      start_step_index: int = 0,
                      return_chain: bool = True):
    """Run the full DDIM chain.

    shape: (B, H, D). `apf_points`: flattened [N, 2] obstacle points used for
    potential-field refinement (None disables APF). `x_init` /
    `start_step_index` allow re-entering the chain part-way (used by the
    dynamic planner's STAGE-II refinement, which re-noises a plan and runs
    only the last few DDIM steps, ref diffusion_model_dynamic.py:552-587).

    Returns (x_final, chain) where chain is [n_steps+1, B, H, D] (the initial
    noise is chain[0], matching the reference's `diffusion = [x]` seed).
    """
    b, h, d = shape
    timesteps = ddim_timesteps(sch.n_steps, num_inference_steps)[start_step_index:]
    step_ratio = sch.n_steps // num_inference_steps

    if x_init is None:
        x = jax.random.normal(key, shape, jnp.float32)
    else:
        x = x_init
    x = dfn.apply_hard_conditioning(x, endpoints)

    def step(x, scan_in):
        t_scalar, forward_t = scan_in
        t = jnp.full((b,), t_scalar, jnp.int32)
        e = guided_eps(eps_fn, params, x, t, fold)
        x_recon = dfn.predict_start_from_noise(sch, x, t, e, predict_epsilon)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        if apf is not None and apf_points is not None:
            apf_step = apf_batch_fn(apf.backend)

            def with_apf(xr):
                for _ in range(apf.iters):
                    xr = apf_step(xr, apf_points,
                                  apf.distance_threshold,
                                  apf.strength, apf.window)
                    xr = dfn.apply_hard_conditioning(xr, endpoints)
                return xr
            x_recon = jax.lax.cond(forward_t >= apf.apply_from_step,
                                   with_apf, lambda xr: xr, x_recon)
        x = dfn.ddim_step(sch, x, x_recon, t, step_ratio)
        x = dfn.apply_hard_conditioning(x, endpoints)
        return x, (x if return_chain else None)

    forward_ts = jnp.arange(start_step_index, start_step_index + len(timesteps))
    x0_chain = x
    x, chain = jax.lax.scan(step, x, (jnp.asarray(timesteps), forward_ts))
    if return_chain:
        chain = jnp.concatenate([x0_chain[None], chain], axis=0)
    return x, chain
