"""Precomputed voxel-grid SDF with interpolated lookup.

TPU-native equivalent of `deps/torch_robotics/.../grid_map_sdf.py:9-132`:
the reference precomputes an SDF + gradient voxel grid and looks it up with a
surrogate-gradient trick; here the grid is built by vmapping the analytic
scene SDF, and the lookup is multilinear interpolation — which is natively
differentiable under `jax.grad`, so no surrogate is needed.

Used by dataset generation / planning checks; the diffusion hot path uses
point clouds, not grids.
"""
from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp

from ramp_tpu.scenes.primitives import Scene, scene_sdf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridSDF:
    values: jax.Array              # [R]*dim grid of SDF values
    lo: jax.Array                  # [dim]
    hi: jax.Array                  # [dim]
    resolution: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))


def precompute_grid_sdf(scene: Scene, lo=-1.0, hi=1.0, resolution: int = 128) -> GridSDF:
    dim = scene.dim
    axes = [jnp.linspace(lo, hi, resolution) for _ in range(dim)]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    values = scene_sdf(scene, grid.reshape(-1, dim)).reshape((resolution,) * dim)
    return GridSDF(values=values,
                   lo=jnp.full((dim,), lo), hi=jnp.full((dim,), hi),
                   resolution=resolution, dim=dim)


def grid_sdf_lookup(g: GridSDF, x: jax.Array) -> jax.Array:
    """Multilinear-interpolated SDF lookup. x: [..., dim] -> [...]."""
    u = (x - g.lo) / (g.hi - g.lo) * (g.resolution - 1)
    u = jnp.clip(u, 0.0, g.resolution - 1 - 1e-6)
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    out = jnp.zeros(x.shape[:-1])
    for corner in range(2 ** g.dim):
        offs = jnp.asarray([(corner >> k) & 1 for k in range(g.dim)])
        idx = tuple((i0[..., k] + offs[k]) for k in range(g.dim))
        w = jnp.prod(jnp.stack([
            jnp.where(offs[k] == 1, frac[..., k], 1.0 - frac[..., k])
            for k in range(g.dim)]), axis=0)
        out = out + w * g.values[idx]
    return out


# ------------------------------------------------------------ occupancy map

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OccupancyGrid:
    """Boolean occupancy grid over [lo, hi]^dim.

    Equivalent of `deps/torch_robotics/.../occupancy_map.py:62-139`
    (`OccupancyMap.get_collisions`: scale to cells, floor, clamp to bounds,
    gather). Like the reference's, it is off the diffusion hot path — the
    planners collision-check against point clouds — but is part of the scene
    toolkit for grid-based costs.
    """
    occupied: jax.Array            # [R]*dim bool
    lo: jax.Array                  # [dim]
    hi: jax.Array                  # [dim]
    resolution: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))


def precompute_occupancy(scene: Scene, lo=-1.0, hi=1.0, resolution: int = 128,
                         margin: float = 0.0) -> OccupancyGrid:
    """Occupied where the scene SDF <= margin."""
    g = precompute_grid_sdf(scene, lo=lo, hi=hi, resolution=resolution)
    return OccupancyGrid(occupied=g.values <= margin, lo=g.lo, hi=g.hi,
                         resolution=resolution, dim=scene.dim)


def occupancy_lookup(g: OccupancyGrid, x: jax.Array) -> jax.Array:
    """Nearest-cell occupancy. x: [..., dim] -> [...] float (1.0 = occupied).

    Out-of-bounds positions clamp to the boundary cell (ref
    occupancy_map.py:118-120).
    """
    u = (x - g.lo) / (g.hi - g.lo) * (g.resolution - 1)
    idx = jnp.clip(jnp.floor(u + 0.5).astype(jnp.int32), 0, g.resolution - 1)
    return g.occupied[tuple(idx[..., k] for k in range(g.dim))].astype(jnp.float32)


def occupancy_collision_cost(g: OccupancyGrid, trajs: jax.Array,
                             weight: float = 1.0) -> jax.Array:
    """Summed occupancy cost per trajectory (ref get_collisions returns the
    per-point collision values its callers sum). trajs: [B, H, dim] -> [B]."""
    return weight * occupancy_lookup(g, trajs).sum(axis=-1)
