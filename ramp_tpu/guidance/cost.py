"""Trajectory cost / best-trajectory selection, fully on device.

Behavioral parity with `mpd/models/diffusion_models/cost.py`:
point-cloud collision check via pairwise distances (:25-54),
cost = 0.9*path_length + 0.1*smoothness over the collision-free subset with
min-max normalization (:56-88), argmin pick, and an "all collide" flag in
place of the reference's `return None`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def path_length(trajs: jax.Array) -> jax.Array:
    """Euclidean arc length over xy. ref cost.py:3-7. trajs: [B, H, D]."""
    pos = trajs[..., :2]
    return jnp.linalg.norm(jnp.diff(pos, axis=-2), axis=-1).sum(-1)


def smoothness(trajs: jax.Array) -> jax.Array:
    """Sum of velocity deltas. ref cost.py:19-24. trajs: [B, H, D>=4]."""
    vel = trajs[..., 2:]
    return jnp.linalg.norm(jnp.diff(vel, axis=-2), axis=-1).sum(-1)


def min_distance_to_pointcloud(trajs: jax.Array,
                               obstacle_points: jax.Array) -> jax.Array:
    """Per-waypoint distance to the nearest obstacle point: [B, H].

    The |q|^2 + |p|^2 - 2qp expansion rides a matmul (same shape as
    `guidance.apf.nearest_obstacle`, which additionally needs the argmin
    point); both collision predicates below derive from this one tile, so
    back-to-back calls on the same inputs fuse/CSE under jit.
    """
    pts = obstacle_points.reshape(-1, obstacle_points.shape[-1]).astype(jnp.float32)
    xy = trajs[..., :2].astype(jnp.float32)
    q = xy.reshape(-1, 2)
    d2 = (jnp.sum(q * q, -1, keepdims=True) + jnp.sum(pts * pts, -1)[None, :]
          - 2.0 * q @ pts.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0).min(axis=-1)).reshape(xy.shape[:-1])


def collision_with_pointcloud(trajs: jax.Array, obstacle_points: jax.Array,
                              collision_threshold: float = 0.0) -> jax.Array:
    """Per-trajectory collision flag vs an obstacle point cloud.

    ref cost.py:25-54. trajs: [B, H, D]; obstacle_points: [O, P, 2] (or
    [N, 2]). Returns bool [B].
    """
    min_d = min_distance_to_pointcloud(trajs, obstacle_points)
    return jnp.any(min_d < collision_threshold, axis=-1)


def collision_counts(trajs: jax.Array, obstacle_points: jax.Array,
                     collision_threshold: float = 0.0) -> jax.Array:
    """Number of colliding waypoints per trajectory (fallback ranking when
    no trajectory is collision-free). trajs: [B, H, D] -> int [B]."""
    min_d = min_distance_to_pointcloud(trajs, obstacle_points)
    return jnp.sum(min_d < collision_threshold, axis=-1)


class Selection(NamedTuple):
    best_index: jax.Array      # int; argmin cost over collision-free set
    best_cost: jax.Array       # float
    costs: jax.Array           # [B] (inf where colliding)
    collision_free: jax.Array  # bool [B]
    any_free: jax.Array        # bool scalar (reference returns None when False)


def select_best_trajectory(trajs: jax.Array, obstacle_points: jax.Array,
                           collision_threshold: float = 0.0,
                           smoothness_weight: float = 0.1,
                           path_length_weight: float = 0.9,
                           normalize: bool = True) -> Selection:
    """ref cost.py:56-88, masked instead of boolean-indexed (static shapes).

    Normalization statistics are computed over the collision-free subset, as
    in the reference. When the free subset has a single member the reference
    divides 0/0; here the normalized term collapses to 0 and the single free
    trajectory is still picked.
    """
    colliding = collision_with_pointcloud(trajs, obstacle_points, collision_threshold)
    free = ~colliding
    pl = path_length(trajs)
    sm = smoothness(trajs)
    if normalize:
        def masked_minmax(v):
            vmin = jnp.min(jnp.where(free, v, jnp.inf))
            vmax = jnp.max(jnp.where(free, v, -jnp.inf))
            rng = vmax - vmin
            return jnp.where(rng > 1e-12, (v - vmin) / jnp.where(rng > 1e-12, rng, 1.0), 0.0)
        pl = masked_minmax(pl)
        sm = masked_minmax(sm)
    costs = path_length_weight * pl + smoothness_weight * sm
    costs = jnp.where(free, costs, jnp.inf)
    best = jnp.argmin(costs)
    return Selection(best_index=best,
                     best_cost=costs[best],
                     costs=costs,
                     collision_free=free,
                     any_free=jnp.any(free))
