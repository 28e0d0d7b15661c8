"""Pure-functional DDPM/DDIM math.

Behavioral parity with `mpd/models/diffusion_models/diffusion_model_static.py`
(q_sample :467, q_posterior :122, predict_start_from_noise :109,
predict_noise_from_start :97, DDIM update :259-333) and
`sample_functions.py` (hard conditioning :5, extract :13).

Everything here is a pure function of a `DiffusionSchedule` pytree and traced
arrays; no Python state, no host sync. Samplers build `lax.scan` chains out of
these.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ramp_tpu.core.schedules import DiffusionSchedule


def extract(table, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-sample table entries, broadcastable against an ndim tensor.

    ref `sample_functions.py:13-16`. `t` has shape [B]; result [B, 1, ...].
    Tables are host (numpy) arrays — `jnp.asarray` at trace time bakes them
    into the program as literals (see `schedules` module docstring).
    """
    out = jnp.asarray(table)[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


class Endpoints(NamedTuple):
    """Hard conditions: pinned start/goal rows.

    The reference expresses these as `{0: start, H-1: goal}` dicts
    (`mpd/datasets/trajectories.py:286-309`); all active code paths use
    exactly those two indices, so we give them a first-class pytree.
    `start`/`goal` have shape [B, D] (or [D], broadcast).
    """
    start: jax.Array
    goal: jax.Array


def apply_hard_conditioning(x: jax.Array, conds: Endpoints) -> jax.Array:
    """Pin the first and last waypoints. ref `sample_functions.py:5-10`."""
    x = x.at[..., 0, :].set(jnp.broadcast_to(conds.start, x[..., 0, :].shape))
    x = x.at[..., -1, :].set(jnp.broadcast_to(conds.goal, x[..., -1, :].shape))
    return x


def apply_hard_conditioning_dict(x: jax.Array, conds: Dict[int, jax.Array]) -> jax.Array:
    """General dict form {time_index: value}; indices must be static ints."""
    for t_idx, val in conds.items():
        x = x.at[..., t_idx, :].set(jnp.broadcast_to(val, x[..., t_idx, :].shape))
    return x


def q_sample(sch: DiffusionSchedule, x_start: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion q(x_t | x_0). ref `diffusion_model_static.py:467-476`."""
    return (extract(sch.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(sch.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise)


def predict_start_from_noise(sch: DiffusionSchedule, x_t: jax.Array, t: jax.Array,
                             model_out: jax.Array, predict_epsilon: bool = True) -> jax.Array:
    """x0-hat from model output. ref `diffusion_model_static.py:109-120`.

    predict_epsilon=True is what the reference actually runs with
    (`scripts/train/trainddp.py:219`, `config/base_config.py:24`).
    """
    if predict_epsilon:
        return (extract(sch.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - extract(sch.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * model_out)
    return model_out


def predict_noise_from_start(sch: DiffusionSchedule, x_t: jax.Array, t: jax.Array,
                             x0: jax.Array, predict_epsilon: bool = True) -> jax.Array:
    """eps-hat from x0. ref `diffusion_model_static.py:97-107`."""
    if predict_epsilon:
        return x0
    return ((extract(sch.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0)
            / extract(sch.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))


def q_posterior(sch: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
    """Posterior q(x_{t-1} | x_t, x_0). ref `diffusion_model_static.py:122-129`."""
    mean = (extract(sch.posterior_mean_coef1, t, x_t.ndim) * x_start
            + extract(sch.posterior_mean_coef2, t, x_t.ndim) * x_t)
    variance = extract(sch.posterior_variance, t, x_t.ndim)
    log_variance = extract(sch.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


def ddim_alpha_prod_prev(sch: DiffusionSchedule, t: jax.Array, step_ratio: int,
                         ndim: int) -> jax.Array:
    """alpha_cumprod at the previous DDIM timestep (1.0 when stepping past 0).

    ref `diffusion_model_static.py:265-273`: `prev = t - T // n_inference`;
    the reference branches on `prev[0] >= 0`; we express it as a where so it
    stays trace-free.
    """
    prev_t = t - step_ratio
    safe_prev = jnp.maximum(prev_t, 0)
    prev_alpha = extract(sch.alphas_cumprod, safe_prev, ndim)
    final = jnp.broadcast_to(sch.final_alpha_cumprod, prev_alpha.shape)
    keep = (prev_t >= 0).reshape(-1, *([1] * (ndim - 1)))
    return jnp.where(keep, prev_alpha, final)


def ddim_step(sch: DiffusionSchedule, x: jax.Array, x_recon: jax.Array,
              t: jax.Array, step_ratio: int) -> jax.Array:
    """One deterministic DDIM update (use_clipped_model_output=True path).

    ref `diffusion_model_static.py:259-333`: recompute model_output from the
    (clipped / APF-adjusted) x_recon, then
        x_prev = sqrt(a_prev) * x_recon + sqrt(1 - a_prev) * model_output.
    eta=0 everywhere in the reference; a previous eta parameter here shrank
    the direction term without injecting the matching stochastic noise
    (neither DDIM(0) nor DDIM(eta)), so it was removed rather than shipped
    broken.
    """
    alpha_prod_t = extract(sch.alphas_cumprod, t, x.ndim)
    alpha_prod_t_prev = ddim_alpha_prod_prev(sch, t, step_ratio, x.ndim)
    beta_prod_t = 1.0 - alpha_prod_t
    model_output = (x - jnp.sqrt(alpha_prod_t) * x_recon) / jnp.sqrt(beta_prod_t)
    direction = jnp.sqrt(1.0 - alpha_prod_t_prev) * model_output
    return jnp.sqrt(alpha_prod_t_prev) * x_recon + direction


# NOTE: there is deliberately no packaged `ddpm_step` here. Every ancestral
# caller (sampler/ddpm.py `denoise_once`, planners/dynamic.py `_ddpm_step`)
# must hook guidance into the POSTERIOR MEAN between `q_posterior` and the
# noise add (ref diffusion_model_static.py:176-185), so a mean-to-sample
# helper would either hide that hook or be bypassed — the two call sites
# compose `q_posterior` + noise directly instead.
