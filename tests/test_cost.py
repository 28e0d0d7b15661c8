import numpy as np
import jax.numpy as jnp

from ramp_tpu.guidance.cost import (
    collision_with_pointcloud, path_length, smoothness, select_best_trajectory,
)


def test_path_length_straight_line():
    traj = np.zeros((1, 11, 4), np.float32)
    traj[0, :, 0] = np.linspace(0, 1, 11)
    assert float(path_length(jnp.asarray(traj))[0]) == np.testing.assert_allclose(
        float(path_length(jnp.asarray(traj))[0]), 1.0, rtol=1e-5) or True
    np.testing.assert_allclose(float(path_length(jnp.asarray(traj))[0]), 1.0, rtol=1e-5)


def test_smoothness_constant_velocity():
    traj = np.zeros((1, 8, 4), np.float32)
    traj[0, :, 2] = 0.5  # constant vx
    assert float(smoothness(jnp.asarray(traj))[0]) == 0.0


def test_collision_detection():
    trajs = np.zeros((2, 8, 4), np.float32)
    trajs[0, :, 0] = np.linspace(-1, 1, 8)   # passes through origin
    trajs[1, :, 1] = np.linspace(2, 3, 8)    # far away
    pts = np.zeros((1, 4, 2), np.float32)    # obstacle at origin
    mask = np.asarray(collision_with_pointcloud(jnp.asarray(trajs), jnp.asarray(pts),
                                                collision_threshold=0.2))
    assert mask[0] and not mask[1]


def test_select_best_prefers_short_free_trajectory():
    rng = np.random.default_rng(0)
    H = 16
    trajs = np.zeros((3, H, 4), np.float32)
    # traj 0: collides (passes through origin)
    trajs[0, :, 0] = np.linspace(-1, 1, H)
    # traj 1: free, long detour
    trajs[1, :, 0] = np.linspace(-1, 1, H)
    trajs[1, :, 1] = 0.8 + 0.3 * np.sin(np.linspace(0, 3 * np.pi, H))
    # traj 2: free, gentle arc
    trajs[2, :, 0] = np.linspace(-1, 1, H)
    trajs[2, :, 1] = 0.8
    pts = np.zeros((1, 8, 2), np.float32)
    sel = select_best_trajectory(jnp.asarray(trajs), jnp.asarray(pts),
                                 collision_threshold=0.1)
    assert bool(sel.any_free)
    assert int(sel.best_index) == 2
    assert not bool(sel.collision_free[0])


def test_select_best_all_collide_flag():
    trajs = np.zeros((2, 8, 4), np.float32)
    pts = np.zeros((1, 4, 2), np.float32)
    sel = select_best_trajectory(jnp.asarray(trajs), jnp.asarray(pts),
                                 collision_threshold=0.5)
    assert not bool(sel.any_free)


def test_select_best_single_free_trajectory():
    trajs = np.zeros((2, 8, 4), np.float32)
    trajs[1, :, 1] = 2.0
    pts = np.zeros((1, 4, 2), np.float32)
    sel = select_best_trajectory(jnp.asarray(trajs), jnp.asarray(pts),
                                 collision_threshold=0.3)
    assert bool(sel.any_free)
    assert int(sel.best_index) == 1
