"""Evaluation metrics — definition parity with
`scripts/inference/core/metrics.py`.

  * waypoint variance (diversity): sum over horizon of the variance of
    upper-triangular pairwise distances between samples (:8-18)
  * smoothness: summed velocity deltas (:20-30)
  * path length over xy of collision-free trajectories (:32-45)
  * collision intensity: fraction of waypoints inside any axis-aligned box
    (:48-82), in percent at the aggregate level
  * success: any sampled trajectory with <= 1% colliding waypoints (:84-126)
  * dynamic episode metrics: capture (pursuer radius + 0.02 margin), goal
    reached <= goal_safe_threshold, score = 0.5*goal + 0.5*not-captured
    (:128-171)

All functions are jnp and jit-friendly; aggregation loops live in the eval
harnesses.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def compute_path_length(trajs) -> jnp.ndarray:
    """[B, H, D] -> [B]; xy arc length (ref :32-45).

    numpy in -> numpy math (host eval path; see
    compute_collision_intensity), jnp otherwise.
    """
    if isinstance(trajs, np.ndarray):
        diffs = trajs[:, 1:, :2] - trajs[:, :-1, :2]
        return np.sqrt((diffs ** 2).sum(-1)).sum(-1)
    trajs = jnp.asarray(trajs)
    pos = trajs[..., :2]
    diffs = pos[:, 1:] - pos[:, :-1]
    return jnp.sqrt((diffs ** 2).sum(-1)).sum(-1)


def compute_smoothness(trajs) -> jnp.ndarray:
    """[B, H, D>=4] -> [B]; summed velocity deltas (ref :20-30)."""
    trajs = jnp.asarray(trajs)
    vel = trajs[..., 2:]
    return jnp.linalg.norm(jnp.diff(vel, axis=-2), axis=-1).sum(-1)


def compute_variance_waypoints(trajs, eps: float = 1e-8) -> jnp.ndarray:
    """Diversity metric (ref :8-18).

    For each waypoint index, the variance of the strict-upper-triangle
    pairwise distances between samples — including, as in the reference, the
    zero entries of the lower triangle+diagonal that `.view(-1)` keeps.
    """
    if isinstance(trajs, np.ndarray):
        pos = trajs[..., :2]
        via = pos.transpose(1, 0, 2)  # [H, B, 2]
        d = np.linalg.norm(via[:, :, None, :] - via[:, None, :, :], axis=-1)
        triu = np.triu(d, k=1).reshape(d.shape[0], -1) + eps
        return np.var(triu, axis=-1, ddof=1).sum()
    trajs = jnp.asarray(trajs)
    pos = trajs[..., :2]
    via = pos.transpose(1, 0, 2)  # [H, B, 2]
    d = jnp.linalg.norm(via[:, :, None, :] - via[:, None, :, :], axis=-1)  # [H,B,B]
    triu = jnp.triu(d, k=1).reshape(d.shape[0], -1) + eps
    # torch.var defaults to unbiased (ddof=1)
    return jnp.var(triu, axis=-1, ddof=1).sum()


def compute_collision_intensity(trajs, box_centers, box_sizes) -> jnp.ndarray:
    """[B] fraction of waypoints inside any box (ref :48-82).

    numpy in -> numpy math: the eval harnesses call this per cell on HOST
    arrays, and eager jnp ops each pay a device dispatch (on the tunneled
    runtime ~27 ms apiece — round-3 measured full-grid evals 2.5x slower
    than the plan calls themselves). jnp in -> jnp math, so jitted callers
    are unaffected.
    """
    if isinstance(trajs, np.ndarray):
        box_centers = np.asarray(box_centers, np.float32)
        box_sizes = np.asarray(box_sizes, np.float32)
        if box_sizes.ndim == 1:
            box_sizes = np.repeat(box_sizes[:, None], 2, axis=-1)
        xy = trajs[:, :, None, :2]
        lower = (box_centers - box_sizes / 2)[None, None]
        upper = (box_centers + box_sizes / 2)[None, None]
        inside = np.all((xy >= lower) & (xy <= upper), axis=-1)
        return inside.any(axis=-1).astype(np.float32).mean(axis=1)
    trajs = jnp.asarray(trajs)
    box_centers = jnp.asarray(box_centers, jnp.float32)
    box_sizes = jnp.asarray(box_sizes, jnp.float32)
    if box_sizes.ndim == 1:
        box_sizes = jnp.repeat(box_sizes[:, None], 2, axis=-1)
    xy = trajs[:, :, None, :2]
    lower = (box_centers - box_sizes / 2)[None, None]
    upper = (box_centers + box_sizes / 2)[None, None]
    inside = jnp.all((xy >= lower) & (xy <= upper), axis=-1)  # [B, H, n_boxes]
    return inside.any(axis=-1).astype(jnp.float32).mean(axis=1)


def compute_path_length_3d(trajs) -> jnp.ndarray:
    """[B, H, D>=3] -> [B]; xyz arc length (3-D analog of ref :32-45).
    numpy in -> numpy math (host eval path)."""
    if isinstance(trajs, np.ndarray):
        diffs = trajs[:, 1:, :3] - trajs[:, :-1, :3]
        return np.sqrt((diffs ** 2).sum(-1)).sum(-1)
    trajs = jnp.asarray(trajs)
    diffs = trajs[:, 1:, :3] - trajs[:, :-1, :3]
    return jnp.sqrt((diffs ** 2).sum(-1)).sum(-1)


def compute_collision_intensity_3d(trajs, box_centers, box_sizes,
                                   sphere_centers=None,
                                   sphere_radii=None,
                                   invalid_mask=None) -> jnp.ndarray:
    """[B] fraction of waypoints inside any 3-D box or sphere.

    The reference 3-D harness only renders plans (`inference3d.py:158-381`,
    no metrics); this extends the 2-D box-overlap definition (ref :48-82) to
    the 3-D scene's boxes + spheres so 3-D quality is measurable.

    `invalid_mask` ([B, H] bool) marks waypoints that are invalid for a
    non-geometric reason — the harness passes waypoints that left the
    normalized workspace before the normalizer's clip-on-unnormalize
    saturated them to the boundary. Without it, a diverged sampler whose
    output clips to the (obstacle-free) workspace boundary scores a perfect
    collision intensity (this is exactly how the reference's broken dormant
    3-D DDIM path gamed the metric; see ddim_sample_chain_3d).

    numpy in -> numpy math (host eval path; see compute_collision_intensity).
    """
    if isinstance(trajs, np.ndarray):
        pos = trajs[:, :, None, :3]
        box_centers = np.asarray(box_centers, np.float32)
        box_sizes = np.asarray(box_sizes, np.float32)
        if box_sizes.ndim == 1:
            box_sizes = np.repeat(box_sizes[:, None], 3, axis=-1)
        lower = (box_centers - box_sizes / 2)[None, None]
        upper = (box_centers + box_sizes / 2)[None, None]
        inside = np.all((pos >= lower) & (pos <= upper), axis=-1).any(axis=-1)
        if sphere_centers is not None and np.size(sphere_centers):
            sc = np.asarray(sphere_centers, np.float32)[None, None]
            sr = np.asarray(sphere_radii, np.float32).reshape(-1)[None, None]
            d = np.linalg.norm(pos - sc, axis=-1)
            inside = inside | (d <= sr).any(axis=-1)
        if invalid_mask is not None:
            inside = inside | np.asarray(invalid_mask, bool)
        return inside.astype(np.float32).mean(axis=1)
    trajs = jnp.asarray(trajs)
    pos = trajs[:, :, None, :3]
    box_centers = jnp.asarray(box_centers, jnp.float32)
    box_sizes = jnp.asarray(box_sizes, jnp.float32)
    if box_sizes.ndim == 1:
        box_sizes = jnp.repeat(box_sizes[:, None], 3, axis=-1)
    lower = (box_centers - box_sizes / 2)[None, None]
    upper = (box_centers + box_sizes / 2)[None, None]
    inside = jnp.all((pos >= lower) & (pos <= upper), axis=-1).any(axis=-1)
    if sphere_centers is not None and np.size(sphere_centers):
        sc = jnp.asarray(sphere_centers, jnp.float32)[None, None]
        sr = jnp.asarray(sphere_radii, jnp.float32).reshape(-1)[None, None]
        d = jnp.linalg.norm(pos - sc, axis=-1)
        inside = inside | (d <= sr).any(axis=-1)
    if invalid_mask is not None:
        inside = inside | jnp.asarray(invalid_mask, bool)
    return inside.astype(jnp.float32).mean(axis=1)


def compute_macro_path_length(trajs, stride: int = 4,
                              pos_dim: int = 2) -> np.ndarray:
    """[B, H, D] -> [B]; arc length of the stride-decimated path.

    Decimation cancels per-waypoint jitter (APF passes displace individual
    waypoints, inflating raw arc length without changing the route) while
    preserving macroscopic excursions — a trajectory that actually wanders
    across the domain stays long under any stride.
    """
    t = np.asarray(trajs)[:, :, :pos_dim]
    dec = np.concatenate([t[:, ::stride], t[:, -1:]], axis=1)
    return np.sqrt(((dec[:, 1:] - dec[:, :-1]) ** 2).sum(-1)).sum(-1)


def path_sanity_mask(trajs, factor: float = 3.0, min_budget: float = 2.0,
                     stride: int = 4, pos_dim: int = 2) -> np.ndarray:
    """[B] bool: True where the macro path length is a sane multiple of the
    trajectory's own start->goal straight-line distance.

    Guard against the wander artifact class (round-2 post-mortems: the
    broken 3-D DDIM chain and the 3-D compose-APF run both scored
    near-perfect success with 6x-parity path lengths — collision-free
    because they hug free space, not because they plan). The reference's
    success metric (ref :84-126) has no such guard; this is a deliberate
    deviation so "success" cannot be gamed by under-denoised samplers.
    """
    t = np.asarray(trajs)[:, :, :pos_dim]
    macro = compute_macro_path_length(trajs, stride=stride, pos_dim=pos_dim)
    straight = np.linalg.norm(t[:, -1] - t[:, 0], axis=-1)
    return macro <= np.maximum(min_budget, factor * straight)


def trajectory_success_and_metrics(trajs_final, collision_intensities,
                                   threshold: float = 0.01,
                                   path_gate: bool = True,
                                   pos_dim: int = 2) -> Dict:
    """ref :84-126. Returns plain-python dict for the harness/JSON dump.

    Beyond-ref: with ``path_gate`` (default), a collision-free trajectory
    only counts toward success if it passes `path_sanity_mask` — wandering
    cannot score. ``n_wander_trajectories`` reports what the gate removed.
    ``pos_dim`` (2 or 3) selects the position slice the gate and the
    path-length metric measure — 3-D callers (serve point_dim=3,
    inference3d) must pass 3 so z-axis wander is gated and a legit plan
    with a short xy projection is not misclassified.
    """
    ci = np.asarray(collision_intensities)
    successful = ci <= threshold
    n_wander = 0
    if path_gate and successful.any():
        sane = path_sanity_mask(trajs_final, pos_dim=pos_dim)
        n_wander = int((successful & ~sane).sum())
        successful = successful & sane
    success = 1 if successful.any() else 0
    free_idx = np.where(successful)[0]
    trajs_final = np.asarray(trajs_final)
    trajs_free = trajs_final[free_idx]
    metrics = {
        "success": success,
        "collision_intensity": float(ci.mean() * 100),
        "path_length": None,
        "path_length_std": None,
        "waypoint_variance": None,
        "n_free_trajectories": int(len(trajs_free)),
        "n_wander_trajectories": n_wander,
    }
    if len(trajs_free) > 0:
        pl = np.asarray(compute_path_length_3d(trajs_free) if pos_dim == 3
                        else compute_path_length(trajs_free))
        metrics["path_length"] = float(pl.mean())
        metrics["path_length_std"] = float(pl.std(ddof=1)) if len(pl) > 1 else 0.0
        if len(trajs_free) == 1:
            metrics["waypoint_variance"] = 0.0
        else:
            var = float(compute_variance_waypoints(trajs_free))
            metrics["waypoint_variance"] = var if np.isfinite(var) else None
    return metrics


def dynamic_episode_metrics(chain_start: np.ndarray, chain_obs: np.ndarray,
                            goal_pos: np.ndarray, goal_safe_threshold: float,
                            static_collision: bool, pursuer_radius: float) -> Dict:
    """ref DynamicMetrics :131-171. chain_start: [K+1, 2] executed evader
    positions; chain_obs: [K, 2] pursuer positions per control step."""
    safety_margin = 0.02
    capture_threshold = pursuer_radius + safety_margin
    pursuer_capture = False
    for i in range(len(chain_obs)):
        evader_idx = i + 2
        if evader_idx >= len(chain_start):
            break
        if np.linalg.norm(chain_start[evader_idx] - chain_obs[i]) <= capture_threshold:
            pursuer_capture = True
            break
    captured = bool(static_collision or pursuer_capture)
    dist_goal = float(np.linalg.norm(chain_start[-1] - np.asarray(goal_pos)))
    goal_reached = (dist_goal <= goal_safe_threshold) and not captured
    path_length = float(np.sum(np.linalg.norm(np.diff(chain_start, axis=0), axis=-1)))
    return {
        "static_collision": bool(static_collision),
        "pursuer_capture": pursuer_capture,
        "captured": captured,
        "goal_reached": goal_reached,
        "path_length": path_length if not captured else None,
        "score": 0.5 * float(goal_reached) + 0.5 * float(not captured),
    }
