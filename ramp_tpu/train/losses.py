"""Training losses for the energy-based diffusion planner.

Behavioral parity with the reference training path:

  * `p_losses` (`diffusion_model_static.py:478-511`): t ~ U[0, T) per batch
    element, q_sample, pin x_noisy's endpoint rows to x_start's, run the
    U-Net in energy mode (eps = grad_x of the scalar energy, with
    create_graph=True — in JAX the outer `jax.grad` simply differentiates
    through the inner one), then MSE(eps, noise).
  * Endpoint handling: the reference overwrites the *prediction's* endpoint
    rows with x_start's rows before the MSE (`:498-501`). Those rows are
    detached constants, so they contribute zero gradient; here the endpoint
    rows are masked out of the mean instead, which is gradient-equivalent
    and keeps the reported loss from carrying a data-dependent constant.
  * Concept dropout for CFG: each element's scene latent is zeroed with
    p=0.2 during training (`UnetTrain.py:41,128-130`).
  * Weighted L1/L2/L2-smooth registry (`helpers.py:71-129`); l2 is what
    training runs (`trainddp.py` via GaussianDiffusionLossDDP -> model.loss).

Everything is a pure function of (params, key, batch) so the train step jits
and shards without a DDP wrapper — no `find_unused_parameters` workarounds
(the reference needs that flag because the double-backward through the energy
confuses DDP's autograd hooks, `trainddp.py:161`).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ramp_tpu.core import diffusion as dfn
from ramp_tpu.core.schedules import DiffusionSchedule


def weighted_l1(pred: jax.Array, targ: jax.Array, weights=None) -> jax.Array:
    err = jnp.abs(pred - targ)
    return (err * weights).mean() if weights is not None else err.mean()


def weighted_l2(pred: jax.Array, targ: jax.Array, weights=None) -> jax.Array:
    err = jnp.square(pred - targ)
    return (err * weights).mean() if weights is not None else err.mean()


def weighted_l2_smooth(pred: jax.Array, targ: jax.Array, weights=None,
                       smoothness_weight: float = 0.1) -> jax.Array:
    """0.9 * MSE + w * MSE on velocity first differences, zero-padded back to
    the full [B, H, D] grid before the mean (ref helpers.py:104-123).

    States are [positions, velocities] with an equal split in every family
    (2-D: D=4, vel at 2:; 3-D: D=6, vel at 3:), so the velocity block is the
    upper half of the last axis — a hardcoded `2:` would fold z-position into
    the 3-D smoothness term.
    """
    vel0 = pred.shape[-1] // 2
    mse = jnp.square(pred - targ)
    dv_pred = jnp.diff(pred[..., vel0:], axis=-2)
    dv_targ = jnp.diff(targ[..., vel0:], axis=-2)
    sm = jnp.square(dv_pred - dv_targ)
    sm = jnp.pad(sm, ((0, 0), (0, 1), (0, pred.shape[-1] - sm.shape[-1])))
    combined = 0.9 * mse + smoothness_weight * sm
    return (combined * weights).mean() if weights is not None else combined.mean()


LOSSES: Dict[str, Callable] = {
    "l1": weighted_l1,
    "l2": weighted_l2,
    "l2smooth": weighted_l2_smooth,
}


def diffusion_loss(unet_apply: Callable,
                   encoder_apply: Callable,
                   schedule: DiffusionSchedule,
                   params: Dict,
                   key: jax.Array,
                   traj: jax.Array,
                   obstacle_points: jax.Array,
                   *,
                   concept_drop_prob: float = 0.2,
                   loss_type: str = "l2",
                   predict_epsilon: bool = True) -> Tuple[jax.Array, Dict]:
    """One training loss evaluation. traj: [B, H, D] normalized; obstacle
    points: [B, O, P, dim]. Returns (scalar loss, info dict)."""
    b, h, d = traj.shape
    k_t, k_noise, k_drop = jax.random.split(key, 3)

    t = jax.random.randint(k_t, (b,), 0, schedule.n_steps)
    noise = jax.random.normal(k_noise, traj.shape, jnp.float32)
    x_noisy = dfn.q_sample(schedule, traj, t, noise)
    # pin endpoints to the clean trajectory (ref :485-486)
    x_noisy = x_noisy.at[:, 0, :].set(traj[:, 0, :])
    x_noisy = x_noisy.at[:, -1, :].set(traj[:, -1, :])

    latents = encoder_apply(params["encoder"], obstacle_points)  # [B, S, C]
    drop = jax.random.uniform(k_drop, (b,)) < concept_drop_prob
    latents = jnp.where(drop[:, None, None], 0.0, latents)

    # energy-based eps with grad-of-grad: grad w.r.t. x of the scalar batch
    # energy, differentiated again by the outer loss grad (ref UnetTrain.py:
    # 165-178). Defined inline (not via sampler.energy) so the energy value
    # is also reported, matching the reference's (eps, energy) return.
    def batch_energy(x):
        out = unet_apply(params["unet"], x, t, latents).astype(jnp.float32)
        return 0.5 * jnp.sum(out * out)

    energy, eps = jax.value_and_grad(batch_energy)(x_noisy)

    target = noise if predict_epsilon else traj
    # mask endpoint rows out of the mean (gradient-equivalent to the
    # reference's overwrite of the prediction rows, see module docstring)
    row_mask = jnp.ones((h,), jnp.float32).at[0].set(0.0).at[-1].set(0.0)
    weights = row_mask[None, :, None]
    err = LOSSES[loss_type](eps * weights, target * weights)
    # renormalize for the masked rows so the scale matches an unmasked mean
    loss = err * (h / (h - 2))
    info = {"energy": energy / b, "t_mean": t.mean().astype(jnp.float32)}
    return loss, info
