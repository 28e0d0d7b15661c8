"""Fused Pallas TPU kernel for the static APF guidance step.

One kernel fuses the whole per-trajectory avoidance pass that the reference
spreads across SciPy cKDTree queries and host numpy (`APFhelper.py:37-104`):

  squared-distance tile (MXU matmul shape) -> min/arg-min reduction ->
  nearest-point lookup -> repulsion force -> Gaussian time-window scatter
  (an H x H banded matmul, MXU) -> in-place trajectory update.

Everything for one trajectory fits comfortably in VMEM (H<=64 waypoints,
N<=640 obstacle points -> the distance tile is ~160 KB), so the grid is the
batch dimension and each program does one trajectory start-to-finish with no
HBM round-trips between stages.

The nearest-point lookup avoids a data-dependent gather (awkward on the TPU
vector unit) by building an arg-min one-hot mask and contracting it with the
point set on the MXU: nearest = onehot(d2 == min d2) @ pts / count. Exact
ties average the tied points; ties have measure zero for real clouds and the
result feeds a clamped guidance nudge.

`apf_static_batch_pallas` matches `ramp_tpu.guidance.apf.apf_static_batch`
(the XLA fallback used on CPU and in tests) to float tolerance; parity is
enforced in tests/test_apf_pallas.py via interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apf_kernel(traj_ref, pts_ref, out_ref, *, distance_threshold: float,
                strength: float, window: int):
    traj = traj_ref[0]                      # [H, D]
    pts = pts_ref[:]                        # [N, 2]
    h = traj.shape[0]
    xy = traj[:, :2].astype(jnp.float32)

    # squared distances [H, N] — the N-reduction rides the MXU
    d2 = (jnp.sum(xy * xy, axis=-1, keepdims=True)
          + jnp.sum(pts * pts, axis=-1)[None, :]
          - 2.0 * jnp.dot(xy, pts.T, preferred_element_type=jnp.float32))
    d2 = jnp.maximum(d2, 0.0)
    min_d2 = jnp.min(d2, axis=-1, keepdims=True)         # [H, 1]
    dist = jnp.sqrt(min_d2[:, 0])                        # [H]

    # nearest point via one-hot contraction (gather-free, MXU)
    onehot = (d2 <= min_d2).astype(jnp.float32)          # [H, N]
    count = jnp.sum(onehot, axis=-1, keepdims=True)
    nearest = jnp.dot(onehot, pts, preferred_element_type=jnp.float32) / count

    direction = (xy - nearest) / (dist[:, None] + 1e-8)
    collide = dist < distance_threshold
    magnitude = jnp.where(collide,
                          strength * jnp.exp(-dist / distance_threshold), 0.0)
    force = magnitude[:, None] * direction               # [H, 2]

    # Gaussian time-window scatter == banded [H, H] matmul
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    offs = (rows - cols).astype(jnp.float32)
    w_mat = jnp.exp(-0.5 * offs * offs / (window / 2.0) ** 2)
    w_mat = jnp.where(jnp.abs(offs) <= window, w_mat, 0.0)
    force_field = jnp.dot(w_mat, force, preferred_element_type=jnp.float32)

    # dense add of the zero-padded force (slice scatter-add does not lower
    # through Mosaic; a concat + add does, and fuses identically)
    d = traj.shape[1]
    pad = jnp.zeros((h, d - 2), jnp.float32)
    out = traj.astype(jnp.float32) + jnp.concatenate([force_field, pad], axis=-1)
    out_ref[0] = out.astype(traj_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "distance_threshold", "strength", "window", "interpret"))
def apf_static_batch_pallas(traj: jax.Array, pts: jax.Array,
                            distance_threshold: float = 0.07,
                            strength: float = 0.1,
                            window: int = 7,
                            interpret: bool = False) -> jax.Array:
    """Fused APF pass. traj: [B, H, D]; pts: [N, 2] flattened obstacle points.

    Semantics identical to `apf.apf_static_batch` (ref APFhelper.py:37-104).
    """
    b, h, d = traj.shape
    kernel = functools.partial(_apf_kernel,
                               distance_threshold=float(distance_threshold),
                               strength=float(strength), window=int(window))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pts.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(traj.shape, traj.dtype),
        interpret=interpret,
    )(traj, pts)
