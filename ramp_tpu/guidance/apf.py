"""Device-resident artificial-potential-field (APF) guidance.

The reference has three avoidance implementations, all built on SciPy
cKDTree queries that force a device->host->device round-trip per guided
denoise step:

  1. vectorized static avoidance with a Gaussian time-window scatter
     (`mpd/models/diffusion_models/APFhelper.py:37-104`)
  2. per-trajectory windowed avoidance around the deepest collision, with an
     optional goal-direction blend for the pursuer
     (`APFhelper_dynamic.py:107-142`)
  3. an inline DDPM-path variant (`sample_functionsdynamic.py:121-161`)
     sharing 2's semantics.

Obstacle clouds are tiny (<= 10 obstacles x 64 points), so on TPU the KD-tree
is replaced by an exact brute-force nearest-point reduction: the (B*H) x N
squared-distance tile is one small matmul-shaped op that XLA fuses with the
force computation — the entire guided step stays on device. The Gaussian
window scatter of (1) is an H x H banded matrix product (MXU), which is
exactly equivalent to the reference's per-collision scatter-add loop.

cKDTree `distance_upper_bound` semantics (miss -> inf distance, index == N
sentinel, ref APFhelper.py:63) reduce to the `d < threshold` mask here: a
brute-force argmin always finds the true nearest point, and waypoints whose
nearest point is beyond the threshold contribute zero force in both
implementations.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class APFParams(NamedTuple):
    """Static-guidance constants (ref diffusion_model_static.py:299-319).

    distance_threshold=0.07, strength=0.1, window=7, iters=3 are the shipped
    values; `apply_from_step` gates APF to forward_t >= 2 (ref :298-299).
    """
    distance_threshold: float = 0.07
    strength: float = 0.1
    window: int = 7
    iters: int = 3
    apply_from_step: int = 2
    backend: str = "xla"   # "xla" (fused by the compiler) or "pallas"


def apf_batch_fn(backend: str):
    """Resolve the static-APF implementation: the XLA version (portable,
    compiler-fused) or the hand-fused Pallas TPU kernel (apf_pallas.py).
    On CPU the Pallas kernel runs in interpret mode (no Mosaic backend)."""
    if backend == "pallas":
        import functools

        import jax

        from ramp_tpu.guidance.apf_pallas import apf_static_batch_pallas
        if jax.default_backend() == "cpu":
            return functools.partial(apf_static_batch_pallas, interpret=True)
        return apf_static_batch_pallas
    return apf_static_batch


def nearest_obstacle(xy: jax.Array, pts: jax.Array):
    """Exact nearest obstacle point for each query.

    xy: [..., 2]; pts: [N, 2]. Returns (dist [...], nearest [..., 2]).
    Uses the |a|^2 + |b|^2 - 2ab expansion so the N-reduction rides a matmul.
    """
    q = xy.reshape(-1, xy.shape[-1]).astype(jnp.float32)
    p = pts.astype(jnp.float32)
    d2 = (jnp.sum(q * q, axis=-1, keepdims=True)
          + jnp.sum(p * p, axis=-1)[None, :]
          - 2.0 * q @ p.T)
    d2 = jnp.maximum(d2, 0.0)
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=-1))[:, 0]
    nearest = p[idx]
    return dist.reshape(xy.shape[:-1]), nearest.reshape(xy.shape)


def _gaussian_window_matrix(horizon: int, window: int) -> jax.Array:
    """W[j, i] = exp(-0.5 * (j-i)^2 / (window/2)^2) for |j-i| <= window.

    Multiplying the per-waypoint force vector by W reproduces the reference's
    scatter-add over the time window (APFhelper.py:42-44, 87-101), with
    out-of-range indices dropped (zero rows outside the band).
    """
    offs = jnp.arange(horizon)[:, None] - jnp.arange(horizon)[None, :]
    weights = jnp.exp(-0.5 * jnp.square(offs.astype(jnp.float32)) / (window / 2.0) ** 2)
    return jnp.where(jnp.abs(offs) <= window, weights, 0.0)


def apf_static_batch(traj: jax.Array, pts: jax.Array,
                     distance_threshold: float = 0.07,
                     strength: float = 0.1,
                     window: int = 7) -> jax.Array:
    """Vectorized static avoidance (ref APFhelper.py:37-104).

    traj: [B, H, D] (the first `pts.shape[-1]` state dims are the
    position); pts: [N, P] flattened obstacle points. P=2 matches the
    reference exactly; P=3 is the beyond-parity 3-D extension (the
    reference has no 3-D APF) — the math is dimension-generic, only the
    position slice changes. One pass; callers iterate (the static DDIM
    sampler applies 3 passes, re-querying each time, ref
    diffusion_model_static.py:315-319).
    """
    b, h, d = traj.shape
    pos_dim = pts.shape[-1]
    xy = traj[..., :pos_dim]
    dist, nearest = nearest_obstacle(xy, pts)           # [B,H], [B,H,P]
    direction = xy - nearest
    direction = direction / (dist[..., None] + 1e-8)
    collide = dist < distance_threshold
    magnitude = jnp.where(collide, strength * jnp.exp(-dist / distance_threshold), 0.0)
    force = magnitude[..., None] * direction            # [B,H,P]
    w_mat = _gaussian_window_matrix(h, window)
    force_field = jnp.einsum("ji,bic->bjc", w_mat, force,
                             preferred_element_type=jnp.float32)
    return traj.at[..., :pos_dim].add(force_field.astype(traj.dtype))


def apf_windowed(traj: jax.Array, pts: jax.Array,
                 distance_threshold: float,
                 strength: float,
                 window: int,
                 goal: Optional[jax.Array] = None,
                 goal_blend: float = 0.1) -> jax.Array:
    """Windowed avoidance around the deepest collision, one trajectory.

    ref APFhelper_dynamic.py:107-142 (is_dynamic=False path): window is
    [argmin_d - window, min(H-1, argmin_d + window)) — note the exclusive end
    and the H-1 cap, reproduced exactly. traj: [H, D]; pts: [N, 2].
    """
    h = traj.shape[0]
    xy = traj[:, :2]
    dist, nearest = nearest_obstacle(xy, pts)
    ci = jnp.argmin(dist)
    rows = jnp.arange(h)
    in_window = (rows >= jnp.maximum(0, ci - window)) & (rows < jnp.minimum(h - 1, ci + window))
    valid = dist < distance_threshold
    direction = (xy - nearest) / (dist[:, None] + 1e-8)
    if goal is not None:
        goal_dir = goal[None, :2] - xy
        goal_dir = goal_dir / (jnp.linalg.norm(goal_dir, axis=-1, keepdims=True) + 1e-8)
        direction = (1.0 - goal_blend) * direction + goal_blend * goal_dir
        direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-8)
    force = strength * jnp.exp(-dist / distance_threshold)
    update = (in_window & valid)[:, None] * force[:, None] * direction
    return traj.at[:, :2].add(update.astype(traj.dtype))


def apf_pursuer(traj: jax.Array, pursuer_pts: jax.Array,
                distance_threshold: float,
                strength: float,
                goal: jax.Array,
                affected_states: Optional[int] = None,
                goal_blend: float = 0.1,
                decay_threshold: Optional[float] = None) -> jax.Array:
    """Pursuer avoidance over [0, affected_states) with goal-direction blend.

    ref APFhelper_dynamic.py:107-142 (is_dynamic=True path): all rows up to
    `affected_states` (exclusive) are pushed; direction is
    0.9*avoid + 0.1*goal, renormalized. traj: [H, D].

    The reference MASKS pursuer hits with the pred threshold (the dynamic
    KD-tree's `distance_upper_bound`, :105) but DECAYS the force with the
    obstacle field's STATIC threshold (`force = strength *
    exp(-d / obstacle_field.distance_threshold)`, :141) — pass it as
    `decay_threshold` (defaults to `distance_threshold` when omitted).
    """
    h = traj.shape[0]
    affected = h if affected_states is None else affected_states
    decay = distance_threshold if decay_threshold is None else decay_threshold
    xy = traj[:, :2]
    dist, nearest = nearest_obstacle(xy, pursuer_pts)
    rows = jnp.arange(h)
    in_range = rows < jnp.minimum(affected, h)
    valid = dist < distance_threshold
    direction = (xy - nearest) / (dist[:, None] + 1e-8)
    goal_dir = goal[None, :2] - xy
    goal_dir = goal_dir / (jnp.linalg.norm(goal_dir, axis=-1, keepdims=True) + 1e-8)
    combined = (1.0 - goal_blend) * direction + goal_blend * goal_dir
    combined = combined / (jnp.linalg.norm(combined, axis=-1, keepdims=True) + 1e-8)
    force = strength * jnp.exp(-dist / decay)
    update = (in_range & valid)[:, None] * force[:, None] * combined
    return traj.at[:, :2].add(update.astype(traj.dtype))
