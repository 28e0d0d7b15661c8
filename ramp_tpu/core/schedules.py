"""Variance (beta) schedules and precomputed diffusion tables.

Behavioral parity with the reference schedules in
`mpd/models/diffusion_models/helpers.py:13-62` (linear, quadratic, sigmoid,
cosine, exponential [the default, 1e-4 -> 1.0], constant-fraction,
variance-preserving) and the table construction in
`mpd/models/diffusion_models/diffusion_model_static.py:48-94`.

All tables live in a single immutable pytree (`DiffusionSchedule`) so the
whole object can be closed over by jitted samplers; XLA constant-folds the
gathers against the (tiny) tables.

The leaves are HOST (numpy) arrays on purpose: a numpy constant closed over
by a jitted function is baked into the HLO as a literal, whereas a committed
device buffer captured as a constant forces a per-call buffer-rendezvous in
the runtime that costs ~25 ms per dispatch on the target platform (measured;
it also degrades every subsequent dispatch in the process). Samplers convert
with `jnp.asarray` at trace time, which is free.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(n_steps, beta_start=1e-4, beta_end=2e-2):
    return np.linspace(beta_start, beta_end, n_steps, dtype=np.float64)


def quadratic_beta_schedule(n_steps, beta_start=1e-4, beta_end=2e-2):
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, n_steps, dtype=np.float64) ** 2


def sigmoid_beta_schedule(n_steps, beta_start=1e-4, beta_end=2e-2):
    x = np.linspace(-6.0, 6.0, n_steps, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start


def cosine_beta_schedule(n_steps, s=0.008, a_min=0.0, a_max=0.999):
    # ref: helpers.py:26-37 (Nichol & Dhariwal cosine schedule)
    steps = n_steps + 1
    x = np.linspace(0, steps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, a_min, a_max)


def exponential_beta_schedule(n_steps, beta_start=1e-4, beta_end=1.0):
    # ref: helpers.py:40-46. Exponentially increasing noise; the default.
    # Note the reference uses torch.linspace(0, T, T) which spans [0, T]
    # inclusive with T points (step T/(T-1)); we reproduce that exactly.
    x = np.linspace(0.0, n_steps, n_steps, dtype=np.float64)
    a = (1.0 / n_steps) * np.log(beta_end / beta_start)
    return beta_start * np.exp(a * x)


def constant_fraction_beta_schedule(n_steps):
    # ref: helpers.py:49-52
    x = np.linspace(0.0, n_steps, n_steps, dtype=np.float64)
    return 1.0 / (n_steps - x + 1.0)


def variance_preserving_beta_schedule(n_steps, beta_start=1e-4, beta_end=1.0):
    # ref: helpers.py:55-62
    x = np.linspace(0.0, n_steps, n_steps, dtype=np.float64)
    alphas = np.exp(
        -beta_start * (1.0 / n_steps)
        - 0.5 * (beta_end - beta_start) * (2 * x - 1) / (n_steps ** 2)
    )
    return 1.0 - alphas


BETA_SCHEDULES = {
    "linear": linear_beta_schedule,
    "quadratic": quadratic_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
    "cosine": cosine_beta_schedule,
    "exponential": exponential_beta_schedule,
    "constant_fraction": constant_fraction_beta_schedule,
    "variance_preserving": variance_preserving_beta_schedule,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All precomputed diffusion tables (shape [T] each, numpy leaves —
    see module docstring for why they stay on host).

    Mirrors the registered buffers of the reference diffusion models
    (`diffusion_model_static.py:62-94`).
    """
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    # DDIM: alpha_cumprod used when stepping past t=0 (set-alpha-to-one)
    final_alpha_cumprod: np.ndarray
    n_steps: int = dataclasses.field(metadata=dict(static=True))


def make_schedule(variance_schedule: str = "exponential",
                  n_diffusion_steps: int = 100,
                  dtype=jnp.float32,
                  **schedule_kwargs) -> DiffusionSchedule:
    betas = BETA_SCHEDULES[variance_schedule](n_diffusion_steps, **schedule_kwargs)
    # guard float roundoff when beta_end == 1.0 exactly (exponential default):
    # alpha must stay in (0, 1] or the sqrt/reciprocal tables go NaN/inf. The
    # reference lands at alpha ~ 1e-7 via torch-f32 roundoff; any tiny floor
    # is equivalent because x0-hat is clamped to [-1, 1] downstream.
    alphas = np.clip(1.0 - betas, 1e-9, 1.0)
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    arr = partial(np.asarray, dtype=np_dtype)
    return DiffusionSchedule(
        betas=arr(betas),
        alphas_cumprod=arr(alphas_cumprod),
        alphas_cumprod_prev=arr(alphas_cumprod_prev),
        sqrt_alphas_cumprod=arr(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=arr(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=arr(posterior_variance),
        posterior_log_variance_clipped=arr(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=arr(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=arr((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        final_alpha_cumprod=arr(np.array(1.0)),
        n_steps=int(n_diffusion_steps),
    )


def ddim_timesteps(n_diffusion_steps: int, num_inference_steps: int) -> np.ndarray:
    """Descending DDIM timestep table; ref `diffusion_model_static.py:336-345`.

    e.g. T=100, n=10 -> [90, 80, ..., 10, 0]. Static (numpy) so samplers can
    unroll or scan over it without tracing.
    """
    if not 1 <= num_inference_steps <= n_diffusion_steps:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} must be in "
            f"[1, n_diffusion_steps={n_diffusion_steps}] — above T the step "
            "ratio truncates to 0 and the chain would never denoise")
    step_ratio = n_diffusion_steps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int64)
