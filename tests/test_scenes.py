"""Scene-layer tests: SDF primitives, grid SDF, pursuit dynamics, robots,
point-cloud generators."""
import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.scenes.dynamics import PursuitParams, pursuit_step
from ramp_tpu.scenes.grid_sdf import grid_sdf_lookup, precompute_grid_sdf
from ramp_tpu.scenes.pointclouds import (
    generate_box_points_np, generate_sphere_points_np,
    generate_sphere_points_3d_np, generate_box_points_3d_np,
)
from ramp_tpu.scenes.primitives import Scene, box_sdf, scene_sdf, sphere_sdf
from ramp_tpu.scenes.robots import RobotPointMass, RobotPointMass3D


def test_sphere_sdf_closed_form():
    centers = jnp.asarray([[0.0, 0.0]])
    radii = jnp.asarray([0.5])
    x = jnp.asarray([[1.0, 0.0], [0.0, 0.0], [0.5, 0.0]])
    np.testing.assert_allclose(np.asarray(sphere_sdf(x, centers, radii)),
                               [0.5, -0.5, 0.0], atol=1e-6)


def test_box_sdf_signs_and_min_combine():
    centers = jnp.asarray([[0.0, 0.0], [2.0, 0.0]])
    sizes = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
    x = jnp.asarray([[0.0, 0.0],    # inside box 0
                     [1.0, 0.0],    # outside box 0 by 0.5, outside box 1 by 0.5
                     [2.0, 0.0]])   # inside box 1
    d = box_sdf(x, centers, sizes)
    assert float(d[0]) < 0 and float(d[2]) < 0
    np.testing.assert_allclose(float(d[1]), 0.5, atol=1e-6)


def test_grid_sdf_matches_analytic():
    scene = Scene(box_centers=jnp.asarray([[0.0, 0.0]]),
                  box_sizes=jnp.asarray([[0.6, 0.6]]))
    g = precompute_grid_sdf(scene, resolution=128)
    x = jnp.asarray([[0.8, 0.0], [0.0, 0.0], [0.31, 0.0]])
    approx = grid_sdf_lookup(g, x)
    exact = scene_sdf(scene, x)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact), atol=0.02)


def test_grid_sdf_lookup_is_differentiable():
    scene = Scene(box_centers=jnp.asarray([[0.0, 0.0]]),
                  box_sizes=jnp.asarray([[0.6, 0.6]]))
    g = precompute_grid_sdf(scene, resolution=64)
    grad = jax.grad(lambda x: grid_sdf_lookup(g, x[None])[0])(jnp.asarray([0.8, 0.0]))
    # outside the box to the +x side, sdf increases with x
    assert float(grad[0]) > 0.5


def test_pursuit_step_moves_toward_evader_and_clips():
    pursuer = jnp.asarray([0.0, 0.0])
    evader = jnp.asarray([1.0, 0.0])
    new = pursuit_step(jnp.asarray(0), pursuer, evader, PursuitParams())
    assert float(new[0]) > 0.0  # moved toward evader in x
    # clipping: pursuer at the boundary stays in [-1, 1]
    at_edge = jnp.asarray([1.0, 1.0])
    out = pursuit_step(jnp.asarray(3), at_edge, jnp.asarray([2.0, 2.0]))
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_robot_state_slicing_and_sampling():
    r = RobotPointMass()
    state = jnp.arange(8.0).reshape(2, 4)
    np.testing.assert_allclose(np.asarray(r.get_position(state)),
                               [[0, 1], [4, 5]])
    np.testing.assert_allclose(np.asarray(r.get_velocity(state)),
                               [[2, 3], [6, 7]])
    q = r.sample_q(jax.random.PRNGKey(0), 100)
    assert q.shape == (100, 2)
    assert bool(r.within_limits(q).all())
    r3 = RobotPointMass3D()
    assert r3.state_dim == 6


def test_box_points_on_boundary_or_inside():
    rng = np.random.default_rng(0)
    pts = generate_box_points_np([0.0, 0.0], [0.4, 0.6], 64, rng=rng)
    assert pts.shape == (64, 2)
    inside = (np.abs(pts[:, 0]) <= 0.2 + 1e-6) & (np.abs(pts[:, 1]) <= 0.3 + 1e-6)
    assert inside.all()


def test_box_points_edge_weighting_variants():
    """Tile vs element-wise edge weights give different per-edge densities.

    Dataset variant (default, torch tile [w,h,w,h]x2): each edge's point
    share equals its true length share — vertical edges get h/(2(w+h)).
    APF variant (elementwise repeat [w,w,h,h]x2): the RIGHT edge (length h)
    is weighted by w instead, skewing non-square boxes. Guards the parity
    fix in generate_box_points_np against a silent default flip.
    """
    w, h = 0.2, 0.6
    n = 4000

    def right_edge_fraction(elementwise):
        rng = np.random.default_rng(7)
        pts = generate_box_points_np(
            [0.0, 0.0], [w, h], n, boundary_lo_frac=1.0,
            boundary_hi_frac=1.0, rng=rng,
            elementwise_edge_weights=elementwise)
        return float((np.abs(pts[:, 0] - w / 2) < 1e-9).mean())

    length_share = h / (2 * (w + h))       # 0.375: true length weighting
    skewed_share = w / (2 * (w + h))       # 0.125: APF's elementwise repeat
    assert abs(right_edge_fraction(False) - length_share) < 0.03
    assert abs(right_edge_fraction(True) - skewed_share) < 0.03


def test_sphere_points_radius():
    rng = np.random.default_rng(0)
    pts = generate_sphere_points_np([0.5, -0.5], 0.1, 64, rng=rng)
    d = np.linalg.norm(pts - [0.5, -0.5], axis=-1)
    assert (d <= 0.1 + 1e-6).all()
    # 90% exactly on the boundary
    assert (np.abs(d - 0.1) < 1e-6).mean() >= 0.85


def test_3d_point_generators():
    rng = np.random.default_rng(1)
    sp = generate_sphere_points_3d_np([0, 0, 0], 0.2, 100, rng=rng)
    d = np.linalg.norm(sp, axis=-1)
    assert (d <= 0.2 + 1e-6).all()
    bp = generate_box_points_3d_np([0, 0, 0], [0.4, 0.4, 0.4], 100, rng=rng)
    assert (np.abs(bp) <= 0.2 + 1e-6).all()
    # surface points sit on at least one face
    on_face = (np.abs(np.abs(bp) - 0.2) < 1e-5).any(axis=-1)
    assert on_face.mean() >= 0.7


def test_occupancy_grid_lookup_and_cost():
    """Occupancy parity with occupancy_map.py:62-139: inside-box cells are
    occupied, free cells are not, out-of-bounds clamps to the boundary."""
    from ramp_tpu.scenes.grid_sdf import (occupancy_collision_cost,
                                          occupancy_lookup,
                                          precompute_occupancy)
    scene = Scene(
        box_centers=jnp.asarray([[0.0, 0.0]]),
        box_sizes=jnp.asarray([[0.5, 0.5]]))
    g = precompute_occupancy(scene, resolution=64)
    inside = jnp.asarray([[0.0, 0.0], [0.2, 0.1]])
    outside = jnp.asarray([[0.9, 0.9], [-0.8, 0.0]])
    assert occupancy_lookup(g, inside).tolist() == [1.0, 1.0]
    assert occupancy_lookup(g, outside).tolist() == [0.0, 0.0]
    # out-of-bounds clamps (boundary of the domain is free in this scene)
    far = jnp.asarray([[5.0, 5.0]])
    assert float(occupancy_lookup(g, far)[0]) == 0.0
    trajs = jnp.stack([jnp.zeros((4, 2)),              # all inside the box
                       jnp.full((4, 2), 0.9)])          # all free
    cost = occupancy_collision_cost(g, trajs)
    assert cost.tolist() == [4.0, 0.0]


def test_pursuit_sweep_vector_matches_rollout():
    """The closed-form sweep ~ the actual K-step rollout (stationary
    evader, far target so the distance cap is inactive)."""
    from ramp_tpu.scenes.dynamics import pursuit_sweep_vector
    pp = PursuitParams()
    pursuer = jnp.asarray([-0.5, -0.5])
    evader = jnp.asarray([0.7, 0.4])
    k, p = 6, pursuer
    for t in range(k):
        p = pursuit_step(jnp.asarray(t), p, evader, pp)
    sweep = pursuit_sweep_vector(pursuer, evader, k, pp)
    # rollout direction bends slightly as the pursuer closes; the straight
    # sweep should still land within a step-length of it
    step_len = pp.velocity_max / np.sqrt(2.0) * pp.dt
    assert float(jnp.linalg.norm((pursuer + sweep) - p)) < 1.5 * step_len


def test_pursuit_sweep_vector_caps_at_target():
    from ramp_tpu.scenes.dynamics import pursuit_sweep_vector
    pp = PursuitParams()
    pursuer = jnp.asarray([0.0, 0.0])
    evader = jnp.asarray([0.05, 0.0])  # very close
    sweep = pursuit_sweep_vector(pursuer, evader, 50, pp)
    # pursuit component capped at the distance; only the +y drift remains
    assert float(sweep[0]) <= 0.05 + 1e-6


def test_swept_sphere_points_cover_segment():
    from ramp_tpu.scenes.pointclouds import (generate_swept_sphere_points,
                                             generate_swept_sphere_points_np)
    import jax
    center = jnp.asarray([-0.2, 0.1])
    sweep = jnp.asarray([0.4, 0.0])
    r = 0.1
    pts = generate_swept_sphere_points(jax.random.PRNGKey(0), center, sweep,
                                       jnp.asarray(r), 64)
    assert pts.shape == (64, 2)
    # all points inside the capsule bounding box
    assert float(pts[:, 0].min()) >= -0.2 - r - 1e-5
    assert float(pts[:, 0].max()) <= 0.2 + r + 1e-5
    # the sweep actually spreads points along x beyond one sphere
    assert float(pts[:, 0].max() - pts[:, 0].min()) > 2 * r + 0.1
    pts_np = generate_swept_sphere_points_np([-0.2, 0.1], [0.4, 0.0], r, 64)
    assert pts_np.shape == (64, 2)
    assert pts_np[:, 0].max() - pts_np[:, 0].min() > 2 * r + 0.1
    # zero sweep reduces to the plain cloud bounding box
    pts0 = generate_swept_sphere_points(jax.random.PRNGKey(0), center,
                                        jnp.zeros(2), jnp.asarray(r), 64)
    assert float(jnp.abs(pts0 - center[None]).max()) <= r + 1e-5
