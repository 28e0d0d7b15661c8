"""Scene geometry: primitive SDFs over pytrees.

Behavioral parity with
`deps/torch_robotics/torch_robotics/environments/primitives.py`:
MultiSphereField SDF (:217-221, min over spheres of |x-c| - r),
MultiBoxField SDF (:328-334, min over boxes of max-axis (|x-c| - half)),
rounded-box alias (:456). The reference's ObjectField / EnvBase min-combine
(`env_base.py:17-181`) becomes `scene_sdf` over a `Scene` pytree.

Everything is a pure jnp function; gradients for potential fields come from
`jax.grad` instead of the reference's precomputed voxel-grid surrogate
(`grid_map_sdf.py:34-132`) — see `ramp_tpu.scenes.grid_sdf` for the
precomputed variant used in dataset generation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def sphere_sdf(x: jax.Array, centers: jax.Array, radii: jax.Array) -> jax.Array:
    """x: [..., dim]; centers: [S, dim]; radii: [S]. ref primitives.py:217-221."""
    d = jnp.linalg.norm(x[..., None, :] - centers, axis=-1)
    return jnp.min(d - radii, axis=-1)


def box_sdf(x: jax.Array, centers: jax.Array, sizes: jax.Array) -> jax.Array:
    """x: [..., dim]; centers/sizes: [B, dim]. ref primitives.py:328-334.

    Like the reference, this is the Chebyshev-style box distance (exact
    inside and along axes; an upper-bound approximation at corners).
    """
    d = jnp.abs(x[..., None, :] - centers) - sizes / 2.0
    return jnp.min(jnp.max(d, axis=-1), axis=-1)


def rounded_box_sdf(x: jax.Array, centers: jax.Array, sizes: jax.Array,
                    radius: float = 0.0) -> jax.Array:
    """ref primitives.py:421-456 (MultiRoundedBoxField alias)."""
    return box_sdf(x, centers, sizes) - radius


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Static scene geometry (pytree). Any field may be None.

    Mirrors what EnvBase assembles from obj_fixed_list
    (`env_base.py:17-181`); the pursuer (obj_extra) is dynamic state threaded
    through the closed-loop planner instead.
    """
    box_centers: Optional[jax.Array] = None    # [B, dim]
    box_sizes: Optional[jax.Array] = None      # [B, dim]
    sphere_centers: Optional[jax.Array] = None  # [S, dim]
    sphere_radii: Optional[jax.Array] = None   # [S]

    @property
    def dim(self) -> int:
        if self.box_centers is not None:
            return self.box_centers.shape[-1]
        return self.sphere_centers.shape[-1]


def scene_sdf(scene: Scene, x: jax.Array) -> jax.Array:
    """Min-combine over all primitives (ref env_base.py compute_sdf)."""
    sdfs = []
    if scene.box_centers is not None:
        sdfs.append(box_sdf(x, scene.box_centers, scene.box_sizes))
    if scene.sphere_centers is not None:
        sdfs.append(sphere_sdf(x, scene.sphere_centers, scene.sphere_radii))
    out = sdfs[0]
    for s in sdfs[1:]:
        out = jnp.minimum(out, s)
    return out
