"""QCar deployment layer: kinematic bicycle, pure pursuit, closed loop.

Covers the non-holonomic vehicle model (`ramp_tpu.scenes.vehicles`) and the
QCar pursuit-evasion episode (`ramp_tpu.eval.qcar`) that mirrors the
reference's physical demos (ref README.md:58-86, which ship no code).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramp_tpu.scenes.vehicles import (QCarParams, bicycle_step,
                                      make_qcar_state, pure_pursuit_control,
                                      track_waypoint)


def test_bicycle_straight_line():
    """Zero steering: the car moves along its heading, speed capped."""
    p = QCarParams()
    s = make_qcar_state([0.0, 0.0], theta=0.0, v=p.v_max)
    for _ in range(10):
        s = bicycle_step(s, jnp.asarray([10.0, 0.0]), p)  # huge accel, no steer
    assert float(s.v) == pytest.approx(p.v_max)           # speed clipped
    assert float(s.y) == pytest.approx(0.0, abs=1e-7)     # no lateral drift
    assert float(s.x) == pytest.approx(p.v_max * p.dt * 10, rel=1e-5)


def test_bicycle_limits_and_no_reverse():
    """Steering clips to the physical lock; braking can't go below zero."""
    p = QCarParams()
    s = make_qcar_state([0.0, 0.0], v=0.0)
    s2 = bicycle_step(s, jnp.asarray([-100.0, 100.0]), p)
    assert float(s2.v) == 0.0                             # no reverse
    # a stopped car cannot turn (non-holonomic: theta' ~ v)
    assert float(s2.theta) == pytest.approx(0.0)
    # at full lock and full speed the yaw rate matches v/L tan(delta_max)
    s3 = bicycle_step(make_qcar_state([0, 0], v=p.v_max),
                      jnp.asarray([0.0, 100.0]), p)
    expected = p.v_max / p.wheelbase * np.tan(p.steer_max) * p.dt
    assert float(s3.theta) == pytest.approx(expected, rel=1e-5)


def test_min_turning_radius():
    """Full-lock circle has radius L/tan(delta_max) — the car cannot spin
    in place or move sideways (the constraint the reference's demos call
    'non-holonomic motion constraints')."""
    p = QCarParams()
    s = make_qcar_state([0.0, 0.0], theta=0.0, v=p.v_max)
    xs, ys = [], []
    for _ in range(2000):
        s = bicycle_step(s, jnp.asarray([0.0, p.steer_max]), p)
        xs.append(float(s.x)); ys.append(float(s.y))
    xs, ys = np.asarray(xs), np.asarray(ys)
    r_expected = p.wheelbase / np.tan(p.steer_max)
    # fit the circle center as the mean, then check radius spread is tiny
    cx, cy = xs.mean(), ys.mean()
    radii = np.hypot(xs - cx, ys - cy)
    assert radii.mean() == pytest.approx(r_expected, rel=0.05)
    assert radii.std() < 0.05 * r_expected


def test_pure_pursuit_steers_toward_target():
    s = make_qcar_state([0.0, 0.0], theta=0.0, v=0.2)
    left = pure_pursuit_control(s, jnp.asarray([0.3, 0.3]))
    right = pure_pursuit_control(s, jnp.asarray([0.3, -0.3]))
    ahead = pure_pursuit_control(s, jnp.asarray([0.5, 0.0]))
    assert float(left[1]) > 0 > float(right[1])
    assert float(ahead[1]) == pytest.approx(0.0, abs=1e-6)
    # far target at low speed: accelerate
    assert float(ahead[0]) > 0


def test_track_waypoint_converges():
    """Repeated ticks drive the car onto a reachable waypoint; the substep
    trace has the right shape and ends at the new state."""
    target = jnp.asarray([0.25, 0.1])
    s = make_qcar_state([0.0, 0.0], theta=0.0)
    d0 = float(jnp.linalg.norm(s.pose - target))
    for _ in range(40):
        s, sub = track_waypoint(s, target, n_substeps=5)
    assert sub.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(sub[-1]), np.asarray(s.pose))
    d1 = float(jnp.linalg.norm(s.pose - target))
    assert d1 < 0.02 < d0


def test_track_waypoint_jits_once():
    """One dispatch per planner tick: the tracker is jittable end to end."""
    f = jax.jit(track_waypoint, static_argnames=("n_substeps",))
    s = make_qcar_state([0.0, 0.0])
    s, sub = f(s, jnp.asarray([0.1, 0.0]), n_substeps=3)
    assert sub.shape == (3, 2)
    assert np.isfinite(np.asarray(sub)).all()


def _tiny_dynamic_planner():
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               max_iterations=3, points_per_obstacle=8,
                               dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    return p, params, pts


@pytest.mark.slow
def test_scan_engine_matches_host_loop():
    """The one-dispatch vehicle engine reproduces the host-driven loop:
    same key -> identical chains, targets, and metrics (the RNG streams of
    begin_episode/controller_step are mirrored inside the scan)."""
    from ramp_tpu.eval.qcar import run_qcar_episode, run_qcar_episode_scan

    p, params, pts = _tiny_dynamic_planner()
    ctx = {"start": np.asarray([-0.8, -0.8, 0.0, 0.0], np.float32),
           "goal": np.asarray([0.8, 0.8, 0.0, 0.0], np.float32),
           "pursuer": np.asarray([0.0, 0.8], np.float32),
           "box_centers": np.full((1, 2), 5.0, np.float32),
           "box_sizes": np.full((1, 2), 0.1, np.float32)}
    apf = np.asarray(pts).reshape(-1, 2)
    key = jax.random.PRNGKey(7)
    host = run_qcar_episode(p, params, pts, apf, ctx, n_samples=3,
                            max_steps=3, finish_ticks=4, key=key)
    scan = run_qcar_episode_scan(p, params, pts, apf, ctx, n_samples=3,
                                 finish_ticks=4, key=key)
    assert host["chains"]["n_steps"] == scan["chains"]["n_steps"]
    np.testing.assert_allclose(scan["chains"]["chain_start"],
                               host["chains"]["chain_start"], atol=1e-6)
    np.testing.assert_allclose(scan["chains"]["chain_obs"],
                               host["chains"]["chain_obs"], atol=1e-6)
    np.testing.assert_allclose(scan["substep_path"], host["substep_path"],
                               atol=1e-6)
    for k in ("captured", "goal_reached", "score"):
        assert scan["metrics"][k] == host["metrics"][k]
    assert scan["metrics"]["tracking_error_mean"] == pytest.approx(
        host["metrics"]["tracking_error_mean"], abs=1e-6)


@pytest.mark.slow
def test_vehicle_episodes_batch():
    """vmapped vehicle episodes: one dispatch runs K contexts; entry 0
    matches the solo episode."""
    p, params, pts0 = _tiny_dynamic_planner()
    k = 2
    pts = jnp.stack([pts0, pts0 * 0.9])
    apf = pts.reshape(k, -1, 2)
    starts = jnp.tile(jnp.asarray([-0.8, -0.8, 0.0, 0.0]), (k, 1))
    goals = jnp.tile(jnp.asarray([0.8, 0.8, 0.0, 0.0]), (k, 1))
    pursuers = jnp.tile(jnp.asarray([0.0, 0.8]), (k, 1))
    keys = jax.random.split(jax.random.PRNGKey(2), k)
    res = p.run_vehicle_episodes_batch(params, keys, pts, apf, starts,
                                       goals, pursuers, n_samples=3,
                                       finish_ticks=4)
    n_ticks = 3 + 4
    assert res.car_states.shape == (k, n_ticks, 4)
    assert res.plans.shape == (k, n_ticks, 12, 4)
    assert res.substeps.shape == (k, n_ticks, 5, 2)
    assert np.isfinite(np.asarray(res.car_states)).all()
    solo = p.run_vehicle_episode(params, keys[0], pts[0], apf[0], starts[0],
                                 goals[0], pursuers[0], n_samples=3,
                                 finish_ticks=4)
    np.testing.assert_allclose(np.asarray(res.car_states[0]),
                               np.asarray(solo.car_states), rtol=2e-4,
                               atol=2e-5)
    assert int(res.n_steps[0]) == int(solo.n_steps)


@pytest.mark.slow
def test_qcar_episode_tiny():
    """Closed-loop QCar episode on a tiny planner: real tracking error feeds
    back into the loop, metrics and chains are well-formed."""
    from ramp_tpu.eval.qcar import run_qcar_episode
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig

    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               max_iterations=3, points_per_obstacle=8,
                               dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    ctx = {"start": np.asarray([-0.8, -0.8, 0.0, 0.0], np.float32),
           "goal": np.asarray([0.8, 0.8, 0.0, 0.0], np.float32),
           "pursuer": np.asarray([0.0, 0.8], np.float32),
           "box_centers": np.full((1, 2), 5.0, np.float32),  # out of the way
           "box_sizes": np.full((1, 2), 0.1, np.float32)}
    res = run_qcar_episode(p, params, pts, np.asarray(pts).reshape(-1, 2),
                           ctx, n_samples=3, max_steps=6,
                           key=jax.random.PRNGKey(2))
    m = res["metrics"]
    for k in ("captured", "goal_reached", "score", "tracking_error_mean",
              "substep_static_collision", "n_steps"):
        assert k in m
    n = res["chains"]["n_steps"]
    assert 1 <= n <= 6
    assert res["chains"]["chain_start"].shape == (n, 2)
    assert res["chains"]["chain_obs"].shape == (n, 2)
    assert res["chains"]["plans"].shape == (n, 12, 4)
    # substep trace: start row + n ticks x 5 substeps
    assert res["substep_path"].shape == (1 + 5 * n, 2)
    assert np.isfinite(res["substep_path"]).all()
    # the bicycle cannot teleport: substep-to-substep motion is bounded by
    # v_max * dt (per-substep displacement cap)
    from ramp_tpu.scenes.vehicles import QCarParams
    q = QCarParams()
    steps = np.linalg.norm(np.diff(res["substep_path"], axis=0), axis=-1)
    assert steps.max() <= q.v_max * q.dt + 1e-6
    assert m["tracking_error_mean"] >= 0.0


def test_pure_pursuit_behind_target_uturn():
    """A target behind the car commands a braking U-turn (creep speed +
    full-lock steering toward the target's side), never acceleration away
    from it — and the tracker recovers and converges."""
    p = QCarParams()
    s = make_qcar_state([0.0, 0.0], theta=0.0, v=p.v_max)
    behind = pure_pursuit_control(s, jnp.asarray([-0.5, 0.05]), p)
    assert float(behind[0]) < 0.0                      # braking, not fleeing
    assert float(behind[1]) == pytest.approx(p.steer_max)   # full lock left
    behind_r = pure_pursuit_control(s, jnp.asarray([-0.5, -0.05]), p)
    assert float(behind_r[1]) == pytest.approx(-p.steer_max)
    # the tracker turns around and converges instead of driving away
    target = jnp.asarray([-0.4, 0.0])
    for _ in range(120):
        s, _ = track_waypoint(s, target, n_substeps=5)
    assert float(jnp.linalg.norm(s.pose - target)) < 0.05


def test_bicycle_stays_in_arena():
    """The walled [-1, 1] arena: driving at the boundary clamps position
    (the pursuer and all plan waypoints are clipped to the same square)."""
    p = QCarParams()
    s = make_qcar_state([0.999, 0.0], theta=0.0, v=p.v_max)
    for _ in range(50):
        s = bicycle_step(s, jnp.asarray([p.a_max, 0.0]), p)
    assert float(s.x) <= 1.0


@pytest.mark.slow
def test_landing_phase_plans_contract_and_equivalence():
    """A goal exit with real landing ticks: the host engine emits one
    (frozen) plan row per landing tick so the chains contract holds, and
    the scan engine produces the identical episode."""
    from ramp_tpu.eval.qcar import run_qcar_episode, run_qcar_episode_scan

    p, params, pts = _tiny_dynamic_planner()
    # goal inside safe_threshold (0.2) of the start: the goal exit fires on
    # the first tick and the car spends several ticks landing
    ctx = {"start": np.asarray([-0.8, -0.8, 0.0, 0.0], np.float32),
           "goal": np.asarray([-0.65, -0.8, 0.0, 0.0], np.float32),
           "pursuer": np.asarray([0.8, 0.8], np.float32),
           "box_centers": np.full((1, 2), 5.0, np.float32),
           "box_sizes": np.full((1, 2), 0.1, np.float32)}
    apf = np.asarray(pts).reshape(-1, 2)
    key = jax.random.PRNGKey(3)
    host = run_qcar_episode(p, params, pts, apf, ctx, n_samples=3,
                            max_steps=3, finish_ticks=4,
                            goal_safe_threshold=0.02, key=key)
    n = host["chains"]["n_steps"]
    assert n > 1                               # at least one landing tick ran
    assert host["chains"]["plans"].shape == (n, 12, 4)
    scan = run_qcar_episode_scan(p, params, pts, apf, ctx, n_samples=3,
                                 finish_ticks=4, goal_safe_threshold=0.02,
                                 key=key)
    assert scan["chains"]["n_steps"] == n
    np.testing.assert_allclose(scan["chains"]["plans"],
                               host["chains"]["plans"], atol=1e-6)
    np.testing.assert_allclose(scan["chains"]["chain_start"],
                               host["chains"]["chain_start"], atol=1e-6)
