"""Robot models: state-layout conventions and configuration sampling.

Behavioral parity with `deps/torch_robotics/torch_robotics/robots/`
(`robot_base.py:12-165`, `robot_point_mass.py:13-101`): a robot defines its
configuration limits, position/velocity slicing of the trajectory state, a
uniform configuration sampler, and identity forward kinematics for the
point-mass robots the planner uses. The reference's self-collision scaffolding
(`robot_base.py:56-140`) is inert for point masses (no links) and is omitted.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RobotPointMass:
    """Planar point mass: state [x, y, vx, vy], q in [-1, 1]^2.

    ref `robot_point_mass.py:13-98` (q_limits [-1,1], identity FK :29-32).
    """
    dim: int = 2
    q_min: float = -1.0
    q_max: float = 1.0

    @property
    def state_dim(self) -> int:
        return 2 * self.dim

    def get_position(self, state: jax.Array) -> jax.Array:
        """ref robot_base.py:142-150."""
        return state[..., :self.dim]

    def get_velocity(self, state: jax.Array) -> jax.Array:
        """ref robot_base.py:152-160 (finite-difference fallback is the
        dataset generator's job; trajectories carry explicit velocities)."""
        return state[..., self.dim:2 * self.dim]

    def fk(self, q: jax.Array) -> jax.Array:
        """Identity forward kinematics (ref robot_point_mass.py:29-32)."""
        return q

    def sample_q(self, key: jax.Array, n: int) -> jax.Array:
        """Uniform configuration sampler (ref robot_base.py:133-140)."""
        return jax.random.uniform(key, (n, self.dim),
                                  minval=self.q_min, maxval=self.q_max)

    def within_limits(self, q: jax.Array) -> jax.Array:
        return jnp.all((q >= self.q_min) & (q <= self.q_max), axis=-1)


@dataclasses.dataclass(frozen=True)
class RobotPointMass3D(RobotPointMass):
    """3-D point mass: state [x, y, z, vx, vy, vz].
    ref `robot_point_mass.py:101`."""
    dim: int = 3


ROBOTS = {
    "RobotPointMass": RobotPointMass,
    "RobotPointMass3D": RobotPointMass3D,
}
