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
                      return_chain: bool = True):
    """Run the full DDIM chain from noise.

    shape: (B, H, D). `apf_points`: flattened [N, 2] obstacle points used for
    potential-field refinement (None disables APF). (Partial-chain re-entry
    for STAGE-II refinement lives in the dynamic planner itself —
    `DynamicPlanner._refine` — not here.)

    Returns (x_final, chain) where chain is [n_steps+1, B, H, D] (the initial
    noise is chain[0], matching the reference's `diffusion = [x]` seed).
    """
    b, h, d = shape
    timesteps = ddim_timesteps(sch.n_steps, num_inference_steps)
    step_ratio = sch.n_steps // num_inference_steps

    x = jax.random.normal(key, shape, jnp.float32)
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

    forward_ts = jnp.arange(len(timesteps))
    x0_chain = x
    x, chain = jax.lax.scan(step, x, (jnp.asarray(timesteps), forward_ts))
    if return_chain:
        chain = jnp.concatenate([x0_chain[None], chain], axis=0)
    return x, chain


def ddim_times_3d(n_steps: int, n_ddim: int = None) -> "jnp.ndarray":
    """The 3-D model's DDIM grid (ref diffusion_model_3d.py:236-241):
    linspace(0, T-1, n_ddim + 1) truncated to int, a -1 sentinel appended,
    reversed, consumed as (t, t_next) pairs. The reference hardcodes
    n_ddim = T // 5 (ref :234); for T=25 that gives pairs
    (24,19) (19,14) (14,9) (9,4) (4,0) (0,-1) — note the non-uniform
    first gap from the int truncation. `n_ddim` generalizes the divisor
    so the step count is a tunable knob (`--ddim-steps`)."""
    import numpy as np
    if n_ddim is None:
        n_ddim = n_steps // 5
    times = np.linspace(0, n_steps - 1, n_ddim + 1).astype(int)
    times = np.concatenate([[-1], times])[::-1]
    return jnp.asarray(times.copy(), jnp.int32)


def ddim_sample_chain_3d(sch: DiffusionSchedule,
                         eps_fn,
                         params,
                         key: jax.Array,
                         shape: Tuple[int, int, int],
                         endpoints: dfn.Endpoints,
                         fold: GuidanceFold,
                         *,
                         predict_epsilon: bool = True,
                         clip_x0: bool = True,
                         n_ddim: int = None,
                         return_chain: bool = True):
    """The 3-D model's DDIM variant
    (ref diffusion_model_3d.py:220-287, eta=0, predict_epsilon=True shipped):

      * per-pair update x = sqrt(a_next)*x0 + sqrt(1-a_next)*eps with a_next
        taken at the exact t_next of the non-uniform grid (`ddim_times_3d`)
      * the final (0, -1) pair returns x0 itself (hard-conditioned)

    `clip_x0` (default True) is a deliberate repair of the reference's
    dormant path, which neither clips x0-hat nor recomputes the direction
    from it: under the exponential schedule alpha_bar(T-1) = 5.7e-11, so the
    first `predict_start_from_noise` multiplies model error by 1/sqrt(ab) ~
    1.3e5 and the chain saturates — every waypoint lands on the scene
    boundary after the normalizer's clip, which *games* collision metrics
    (obstacles are interior) while producing noise paths (path length ~120
    vs ~1.4, `eval_results_3d_grid_ddim.json` pre-fix). With clip_x0 the
    direction is recomputed from the clipped x0 exactly like the static
    chain's `use_clipped_model_output=True` recipe
    (`diffusion_model_static.py:321-332`). `clip_x0=False` reproduces the
    reference's (broken) dormant behavior for comparison.
    """
    b, h, d = shape
    times = ddim_times_3d(sch.n_steps, n_ddim)
    t_pairs = jnp.stack([times[:-1], times[1:]], axis=-1)  # [(T-1,..), next]

    x = jax.random.normal(key, shape, jnp.float32)
    x = dfn.apply_hard_conditioning(x, endpoints)

    alphas_cumprod = jnp.asarray(sch.alphas_cumprod)

    def step(x, pair):
        t_scalar, t_next = pair[0], pair[1]
        t = jnp.full((b,), t_scalar, jnp.int32)
        e = guided_eps(eps_fn, params, x, t, fold)
        x_start = dfn.predict_start_from_noise(sch, x, t, e, predict_epsilon)
        if clip_x0:
            x_start = jnp.clip(x_start, -1.0, 1.0)
            # direction recomputed from the clipped x0 (static-chain recipe)
            pred_noise = dfn.predict_noise_from_start(
                sch, x, t, x_start, predict_epsilon=False)
        elif predict_epsilon:
            pred_noise = e  # predict_noise_from_start returns model_out (:92)
        else:
            pred_noise = ((dfn.extract(sch.sqrt_recip_alphas_cumprod, t, x.ndim) * x
                           - e)
                          / dfn.extract(sch.sqrt_recipm1_alphas_cumprod, t, x.ndim))
        alpha_next = alphas_cumprod[jnp.maximum(t_next, 0)]
        x_upd = (jnp.sqrt(alpha_next) * x_start
                 + jnp.sqrt(1.0 - alpha_next) * pred_noise)
        x = jnp.where(t_next < 0, x_start, x_upd)
        x = dfn.apply_hard_conditioning(x, endpoints)
        return x, (x if return_chain else None)

    x0_chain = x
    x, chain = jax.lax.scan(step, x, t_pairs)
    if return_chain:
        chain = jnp.concatenate([x0_chain[None], chain], axis=0)
    return x, chain
