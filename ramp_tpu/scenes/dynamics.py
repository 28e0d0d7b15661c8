"""Pursuer (predator) dynamics as a pure device function.

Behavioral parity with `scripts/inference/core/utils.py:81-138`
(DynamicsGenerator.create_pursuit_dynamics) +
`primitives.py:102-107` (MultiSphereFieldDynamics.update_centers):
dt = 0.1; direction = pursuit_strength * unit(evader - pursuer)
             + random_strength * (sin 2*pi*t, cos 2*pi*t);
new = clip(pursuer + direction * velocity * dt, -1, 1);
velocity = v_max / sqrt(2) per axis (ref :89).

The reference recomputes this host-side with numpy each control step and
rebuilds a cKDTree for the pursuer cloud; here it is a [2]-vector update
inside the jitted closed-loop scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PursuitParams(NamedTuple):
    velocity_max: float = 0.5
    pursuit_strength: float = 0.8
    random_strength: float = 0.2
    dt: float = 0.1
    radius: float = 0.1          # obs_radius used for the pursuer cloud
                                 # (ref diffusion_model_dynamic.py:380)


def pursuit_step(t: jax.Array, pursuer: jax.Array, evader: jax.Array,
                 params: PursuitParams = PursuitParams()) -> jax.Array:
    """One pursuer update. t: scalar step index; pursuer/evader: [2].

    Note the "random" sinusoid is DEGENERATE by reference-exact design:
    every caller (here and in the reference) passes the INTEGER control-step
    index as t (ref diffusion_model_dynamic.py:580 `forward_t=k` →
    :412 `update_dynamic(forward_t, ...)` → utils.py:108 `sin(2*pi*t)`), so
    sin(2*pi*t) ≈ 0 and cos(2*pi*t) = 1 for all ticks — the term is a
    constant +y drift of strength `random_strength`, not an oscillation.
    We reproduce that bias rather than "fix" it, because the models are
    trained and evaluated against pursuers that move this way.
    """
    delta = evader - pursuer
    dist = jnp.linalg.norm(delta)
    pursuit_dir = jnp.where(dist > 0, delta / jnp.where(dist > 0, dist, 1.0), delta)
    tt = t.astype(jnp.float32)
    random_dir = jnp.stack([jnp.sin(2 * jnp.pi * tt), jnp.cos(2 * jnp.pi * tt)])
    direction = (params.pursuit_strength * pursuit_dir
                 + params.random_strength * random_dir)
    velocity = params.velocity_max / jnp.sqrt(2.0)
    new = pursuer + direction * velocity * params.dt
    return jnp.clip(new, -1.0, 1.0)


def pursuit_sweep_vector(pursuer: jax.Array, target: jax.Array, n_steps: int,
                         params: PursuitParams = PursuitParams()) -> jax.Array:
    """Closed-form K-step rollout of `pursuit_step` under a stationary
    target: [2] total predicted displacement.

    Per step the pursuer moves (ps*unit(target-pursuer) + rs*yhat) * v/sqrt2
    * dt (the "random" term is the degenerate +y drift — see pursuit_step).
    For a stationary target the unit vector is constant until arrival, so K
    steps sweep a straight segment; the pursuit component is capped at the
    current distance so the sweep never extends past the target. This is the
    prediction the swept conditioning cloud encodes (beyond-ref: the
    reference model is blind to the pursuer entirely,
    ref diffusion_model_dynamic.py:594-598 only reacts via APF).
    """
    delta = target - pursuer
    dist = jnp.linalg.norm(delta)
    u = jnp.where(dist > 0, delta / jnp.where(dist > 0, dist, 1.0), delta)
    step_len = params.velocity_max / jnp.sqrt(2.0) * params.dt
    pursuit_len = jnp.minimum(n_steps * step_len * params.pursuit_strength,
                              dist)
    drift = (params.random_strength * n_steps * step_len
             * jnp.asarray([0.0, 1.0]))
    return u * pursuit_len + drift
