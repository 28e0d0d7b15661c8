"""Non-holonomic vehicle model + tracking controller (QCar deployment layer).

The reference's physical demos run pursuit-evasion on QCar1 1/10-scale
Ackermann cars in a 6x6 m arena "under non-holonomic motion constraints"
(ref README.md:58-76) — but the repo ships NO code for them; plans are
tracked by an off-repo low-level controller. This module is the TPU-native
equivalent of that layer: a kinematic-bicycle model and a jittable
pure-pursuit tracking controller that executes the dynamic planner's
per-tick waypoints (`DynamicPlanner.begin_episode`/`controller_step`),
closing the same loop the physical car closes.

Arena mapping: the planner frame [-1, 1]^2 is the 6x6 m workspace, so
1 unit = 3 m. QCar1 wheelbase 0.256 m = 0.0853 units; steering limit
~0.5 rad (~28 deg, the platform's physical lock).

Everything here is pure jax on static shapes: one control tick
(`track_waypoint`) is a `lax.scan` of bicycle substeps under `jit`, so
the whole tracking layer costs one dispatch per planner tick.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class QCarParams(NamedTuple):
    """Kinematic-bicycle limits in planner units (1 unit = 3 m)."""
    wheelbase: float = 0.256 / 3.0   # QCar1 wheelbase, 0.0853 units
    v_max: float = 0.5               # 1.5 m/s forward speed cap
    a_max: float = 2.0               # 6 m/s^2 accel/brake cap
    steer_max: float = 0.5           # rad, physical steering lock
    dt: float = 0.02                 # substep, 50 Hz low-level loop
    # v_des = speed_gain * distance-to-target. Pure pursuit settles into an
    # equilibrium lag of (path speed)/speed_gain; measured on dataset
    # trajectories (5 substeps/tick): gain 2.5 -> 0.12 units mean lag,
    # 5.0 -> 0.059, 7.0 -> 0.039 but the max is turn-limited either way.
    speed_gain: float = 5.0


class QCarState(NamedTuple):
    """[x, y, heading, speed] — `pose` is the planner-frame position."""
    x: jax.Array
    y: jax.Array
    theta: jax.Array
    v: jax.Array

    @property
    def pose(self) -> jax.Array:
        return jnp.stack([self.x, self.y])


def make_qcar_state(xy, theta=0.0, v=0.0) -> QCarState:
    xy = jnp.asarray(xy, jnp.float32)
    return QCarState(xy[0], xy[1], jnp.asarray(theta, jnp.float32),
                     jnp.asarray(v, jnp.float32))


def bicycle_step(state: QCarState, control: jax.Array,
                 p: QCarParams = QCarParams()) -> QCarState:
    """One kinematic-bicycle substep. control = [accel, steer_angle].

    x' = v cos(theta); y' = v sin(theta); theta' = v/L tan(delta); v' = a.
    Controls and speed are clipped to the platform limits (no reverse —
    pure pursuit brakes to rest instead of backing up). Position is
    clamped to the [-1, 1] arena: the physical room is walled, and the
    pursuer and all plan waypoints are clipped to the same square, so an
    unclamped car could sit outside the reachable set of everything else.
    """
    a = jnp.clip(control[0], -p.a_max, p.a_max)
    delta = jnp.clip(control[1], -p.steer_max, p.steer_max)
    v = jnp.clip(state.v + a * p.dt, 0.0, p.v_max)
    theta = state.theta + v / p.wheelbase * jnp.tan(delta) * p.dt
    return QCarState(x=jnp.clip(state.x + v * jnp.cos(theta) * p.dt, -1.0, 1.0),
                     y=jnp.clip(state.y + v * jnp.sin(theta) * p.dt, -1.0, 1.0),
                     theta=theta, v=v)


def pure_pursuit_control(state: QCarState, target_xy: jax.Array,
                         p: QCarParams = QCarParams()) -> jax.Array:
    """Geometric pure pursuit toward one lookahead point.

    Steering: delta = atan(2 L sin(alpha) / d) where alpha is the bearing
    of the target in the body frame and d the lookahead distance (the
    circular arc through both points). Speed: P-control toward
    v_des = speed_gain * d, capped at v_max — the car slows into the
    waypoint and saturates on long legs.

    A target BEHIND the car (cos(alpha) < 0 in the body frame — e.g. an
    evasion replan that flips the next waypoint to the other side, or
    overshoot under tracking lag) is a pure-pursuit blind spot: sin(alpha)
    ~ 0 near alpha = pi gives delta ~ 0 while v_des grows with distance,
    so the raw law accelerates straight AWAY from the target. Two cases:

    - behind and FAR (beyond the full-lock turning diameter): a U-turn
      maneuver — creep at 0.2 v_max under full-lock steering toward the
      target's side until it returns to the front half-plane (simply
      braking would deadlock a kinematic bicycle: theta' ~ v).
    - behind and NEAR (inside the turning diameter — a just-overshot
      waypoint a full-lock circle cannot re-capture): brake to rest. The
      stop distance at approach speeds (~v^2 / 2 a_max) is millimetres in
      planner units, so the car settles on the waypoint instead of
      orbiting it at creep speed forever.
    """
    dx = target_xy[0] - state.x
    dy = target_xy[1] - state.y
    d = jnp.sqrt(dx * dx + dy * dy) + 1e-8
    alpha = jnp.arctan2(dy, dx) - state.theta
    behind = jnp.cos(alpha) < 0.0
    can_uturn = d > 2.0 * p.wheelbase / jnp.tan(p.steer_max)
    uturn = jnp.logical_and(behind, can_uturn)
    delta = jnp.where(
        uturn,
        jnp.where(jnp.sin(alpha) >= 0.0, p.steer_max, -p.steer_max),
        jnp.arctan2(2.0 * p.wheelbase * jnp.sin(alpha), d))
    v_des = jnp.where(behind,
                      jnp.where(can_uturn, 0.2 * p.v_max, 0.0),
                      jnp.minimum(p.speed_gain * d, p.v_max))
    accel = (v_des - state.v) / p.dt
    return jnp.stack([accel, delta])


def track_waypoint(state: QCarState, target_xy: jax.Array,
                   p: QCarParams = QCarParams(), n_substeps: int = 5,
                   ) -> Tuple[QCarState, jax.Array]:
    """Run one planner tick of pure-pursuit substeps toward a waypoint.

    Returns (new_state, substep_positions [n_substeps, 2]). The planner
    emits waypoints ~dt_plan apart; n_substeps * QCarParams.dt spans one
    tick of the 50 Hz low-level loop per 10 Hz replan (the reference's
    physical stack splits rates the same way).
    """
    target_xy = jnp.asarray(target_xy, jnp.float32)

    def sub(s, _):
        s = bicycle_step(s, pure_pursuit_control(s, target_xy, p), p)
        return s, s.pose

    return jax.lax.scan(sub, state, None, length=n_substeps)
