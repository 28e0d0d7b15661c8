"""Obstacle point-cloud generators.

Distribution parity with the reference generators:
  * box points: boundary + interior samples. Two variants exist in the
    reference — the env/dataset variant draws the boundary count from
    [P/2, 2P/3] (`env_simple2dquant.py:63-97`) and the APF variant from
    [2P/3, P] (`APFhelper_dynamic.py:41-68`); both are provided.
  * sphere points: golden-angle spiral on the circle boundary (90%) plus
    uniform interior samples (10%) (`APFhelper_dynamic.py:18-39`).

Jax versions take explicit PRNG keys (device-side, used inside the jitted
closed-loop planner for pursuer clouds); numpy versions serve host-side
dataset generation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------- numpy (host) -------------------------------

def generate_sphere_points_np(center, radius, num_points, surface_ratio=0.9,
                              rng: np.random.Generator | None = None):
    """ref APFhelper_dynamic.py:18-39 (2-D circle, golden-angle boundary)."""
    rng = rng or np.random.default_rng()
    surface_points = int(num_points * surface_ratio)
    inner_points = num_points - surface_points
    golden = np.pi * (3 - np.sqrt(5))
    theta = golden * np.arange(surface_points)
    x = radius * np.cos(theta) + center[0]
    y = radius * np.sin(theta) + center[1]
    if inner_points > 0:
        r_in = radius * np.sqrt(rng.uniform(0, 1, inner_points))
        t_in = rng.uniform(0, 2 * np.pi, inner_points)
        x = np.concatenate([x, r_in * np.cos(t_in) + center[0]])
        y = np.concatenate([y, r_in * np.sin(t_in) + center[1]])
    return np.column_stack([x, y])


def generate_box_points_np(center, size, num_points, boundary_lo_frac=0.5,
                           boundary_hi_frac=2.0 / 3.0,
                           rng: np.random.Generator | None = None,
                           elementwise_edge_weights: bool = False):
    """ref env_simple2dquant.py:63-97 (boundary count in [P/2, 2P/3]).

    The reference has TWO box-cloud implementations that disagree: the
    dataset/env variant (torch) TILES [w,h,w,h] -> [w,h,w,h,w,h,w,h] so each
    perimeter segment is weighted by its true length, while the APF variant
    (numpy, APFhelper_dynamic.py:54) repeats element-wise ->
    [w,w,h,h,w,w,h,h], skewing per-edge density for non-square boxes, and
    draws its boundary count from [2P/3, P]. Default = dataset variant;
    `elementwise_edge_weights=True` + fractions (2/3, 1.0) = APF variant.
    """
    rng = rng or np.random.default_rng()
    cx, cy = center
    w, h = size
    left, right = cx - w / 2, cx + w / 2
    top, bottom = cy + h / 2, cy - h / 2
    lo = int(num_points * boundary_lo_frac)
    hi = int(num_points * boundary_hi_frac)
    n_boundary = int(rng.integers(lo, hi + 1))
    n_inside = num_points - n_boundary

    edges = np.array([[left, top], [right, top], [right, bottom], [left, bottom]])
    base = np.array([w, h, w, h], dtype=np.float64)
    edge_lengths = base.repeat(2) if elementwise_edge_weights else np.tile(base, 2)
    edge_pts = rng.random(n_boundary) * edge_lengths.sum()
    cum = np.cumsum(edge_lengths)
    idx = np.searchsorted(cum, edge_pts)
    t = (edge_pts - np.concatenate([[0], cum[:-1]])[idx]) / edge_lengths[idx]
    start = edges[idx % 4]
    end = edges[(idx + 1) % 4]
    boundary = start + t[:, None] * (end - start)

    inside = rng.random((n_inside, 2))
    inside[:, 0] = inside[:, 0] * w + left
    inside[:, 1] = inside[:, 1] * h + bottom
    return np.concatenate([boundary, inside], axis=0)


def scene_obstacle_points_np(box_centers, box_sizes, points_per_box=64,
                             rng: np.random.Generator | None = None):
    """[O, P, 2] obstacle point tensor for a set of boxes (dataset layout)."""
    rng = rng or np.random.default_rng()
    return np.stack([
        generate_box_points_np(c, s, points_per_box, rng=rng)
        for c, s in zip(np.asarray(box_centers), np.asarray(box_sizes))
    ]).astype(np.float32)


# ------------------------------ jax (device) ------------------------------

def generate_sphere_points(key: jax.Array, center: jax.Array, radius: jax.Array,
                           num_points: int, surface_ratio: float = 0.9) -> jax.Array:
    """Device-side pursuer point cloud (used inside the jitted replanner).

    Same distribution as the numpy version; shapes are static.
    """
    surface_points = int(num_points * surface_ratio)
    inner_points = num_points - surface_points
    golden = jnp.pi * (3 - jnp.sqrt(5.0))
    theta = golden * jnp.arange(surface_points, dtype=jnp.float32)
    surf = jnp.stack([radius * jnp.cos(theta), radius * jnp.sin(theta)], axis=-1)
    if inner_points > 0:
        k1, k2 = jax.random.split(key)
        r_in = radius * jnp.sqrt(jax.random.uniform(k1, (inner_points,)))
        t_in = jax.random.uniform(k2, (inner_points,), maxval=2 * jnp.pi)
        inner = jnp.stack([r_in * jnp.cos(t_in), r_in * jnp.sin(t_in)], axis=-1)
        pts = jnp.concatenate([surf, inner], axis=0)
    else:
        pts = surf
    return pts + center[None, :]


def generate_swept_sphere_points(key: jax.Array, center: jax.Array,
                                 sweep_vec: jax.Array, radius: jax.Array,
                                 num_points: int,
                                 surface_ratio: float = 0.9) -> jax.Array:
    """Pursuer cloud distributed along the predicted sweep segment.

    The capsule [center, center + sweep_vec] (+ radius): each point of the
    ordinary sphere cloud slides along the segment by a uniform fraction, so
    the row encodes WHERE THE PURSUER IS HEADED, not just where it is.
    Same [num_points, 2] layout as `generate_sphere_points` — drop-in for
    the conditioning row. sweep_vec = 0 reduces to the plain cloud.
    """
    k_base, k_frac = jax.random.split(key)
    base = generate_sphere_points(k_base, jnp.zeros(2, jnp.float32), radius,
                                  num_points, surface_ratio)
    frac = jax.random.uniform(k_frac, (num_points, 1))
    return base + center[None, :] + frac * sweep_vec[None, :]


def generate_swept_sphere_points_np(center, sweep_vec, radius, num_points,
                                    surface_ratio=0.9,
                                    rng: np.random.Generator | None = None):
    """Host twin of `generate_swept_sphere_points` (dataset generation)."""
    rng = rng or np.random.default_rng()
    base = generate_sphere_points_np(np.zeros(2), radius, num_points,
                                     surface_ratio, rng=rng)
    frac = rng.uniform(0, 1, (num_points, 1))
    return (base + np.asarray(center)[None, :]
            + frac * np.asarray(sweep_vec)[None, :]).astype(np.float32)


def generate_box_points(key: jax.Array, center: jax.Array, size: jax.Array,
                        num_points: int, boundary_frac: float = 0.6) -> jax.Array:
    """Device-side box cloud with a fixed boundary fraction (static shapes).

    The reference randomizes the boundary/interior split; under jit the split
    must be static, so we fix it at the mean of the reference's range. Edge
    weighting follows the APF variant's element-wise repeat (see
    `generate_box_points_np` — the on-device use case is APF clouds).
    """
    n_boundary = int(num_points * boundary_frac)
    n_inside = num_points - n_boundary
    w, h = size[0], size[1]
    left, bottom = center[0] - w / 2, center[1] - h / 2
    edges = jnp.stack([
        jnp.stack([left, bottom + h]), jnp.stack([left + w, bottom + h]),
        jnp.stack([left + w, bottom]), jnp.stack([left, bottom]),
    ])
    edge_lengths = jnp.stack([w, h, w, h]).repeat(2)  # APF-variant weighting
    k1, k2 = jax.random.split(key)
    edge_pts = jax.random.uniform(k1, (n_boundary,)) * edge_lengths.sum()
    cum = jnp.cumsum(edge_lengths)
    idx = jnp.searchsorted(cum, edge_pts)
    prev_cum = jnp.concatenate([jnp.zeros(1), cum[:-1]])
    t = (edge_pts - prev_cum[idx]) / edge_lengths[idx]
    start = edges[idx % 4]
    end = edges[(idx + 1) % 4]
    boundary = start + t[:, None] * (end - start)
    inside = jax.random.uniform(k2, (n_inside, 2))
    inside = inside * jnp.stack([w, h]) + jnp.stack([left, bottom])
    return jnp.concatenate([boundary, inside], axis=0)


# ------------------------------ 3-D (host) ---------------------------------

def generate_sphere_points_3d_np(center, radius, num_points,
                                 rng: np.random.Generator | None = None,
                                 surface_ratio: float = 0.9):
    """Fibonacci-sphere surface points + uniform interior samples (3-D analog
    of the reference's 2-D golden-angle generator)."""
    rng = rng or np.random.default_rng()
    n_surf = int(num_points * surface_ratio)
    n_in = num_points - n_surf
    i = np.arange(n_surf, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    z = 1.0 - 2.0 * (i + 0.5) / n_surf
    r_xy = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    surf = np.column_stack([np.cos(phi * i) * r_xy, np.sin(phi * i) * r_xy, z]) * radius
    if n_in > 0:
        d = rng.normal(size=(n_in, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
        rr = radius * rng.uniform(0, 1, n_in) ** (1 / 3)
        surf = np.concatenate([surf, d * rr[:, None]])
    return (surf + np.asarray(center)).astype(np.float64)


def generate_box_points_3d_np(center, size, num_points,
                              rng: np.random.Generator | None = None,
                              surface_ratio: float = 0.8):
    """Axis-aligned 3-D box: face-area-weighted surface samples + interior."""
    rng = rng or np.random.default_rng()
    c = np.asarray(center, np.float64)
    s = np.asarray(size, np.float64)
    n_surf = int(num_points * surface_ratio)
    n_in = num_points - n_surf
    # 6 faces, areas: yz, yz, xz, xz, xy, xy
    areas = np.array([s[1] * s[2], s[1] * s[2], s[0] * s[2],
                      s[0] * s[2], s[0] * s[1], s[0] * s[1]])
    face = rng.choice(6, size=n_surf, p=areas / areas.sum())
    pts = rng.uniform(-0.5, 0.5, size=(n_surf, 3)) * s
    axis = face // 2
    sign = np.where(face % 2 == 0, 0.5, -0.5)
    pts[np.arange(n_surf), axis] = sign * s[axis]
    out = pts + c
    if n_in > 0:
        out = np.concatenate([out, rng.uniform(-0.5, 0.5, size=(n_in, 3)) * s + c])
    return out


def scene_obstacle_points_3d_np(box_centers, box_sizes, sphere_centers,
                                sphere_radii, points_per_obstacle=128,
                                rng: np.random.Generator | None = None):
    """[O, P, 3] obstacle point tensor: boxes then spheres (3-D dataset
    layout, ref EnvParameterized3D points_per_obstacle=128)."""
    rng = rng or np.random.default_rng()
    clouds = [generate_box_points_3d_np(c, s, points_per_obstacle, rng=rng)
              for c, s in zip(np.asarray(box_centers), np.asarray(box_sizes))]
    clouds += [generate_sphere_points_3d_np(c, r, points_per_obstacle, rng=rng)
               for c, r in zip(np.asarray(sphere_centers), np.asarray(sphere_radii))]
    return np.stack(clouds).astype(np.float32)
