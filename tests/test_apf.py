"""APF guidance: golden-value parity with a NumPy/SciPy re-statement of the
reference semantics (APFhelper.py / APFhelper_dynamic.py)."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from ramp_tpu.guidance.apf import (
    apf_static_batch, apf_windowed, apf_pursuer, nearest_obstacle,
)


def _reference_static_avoidance(traj, pts, threshold, strength, window):
    """Independent NumPy restatement of APFhelper.py:37-104 semantics."""
    traj = traj.copy()
    B, H, _ = traj.shape
    weights = np.exp(-0.5 * np.arange(-window, window + 1) ** 2 / (window / 2) ** 2)
    tree = cKDTree(pts)
    dist, idx = tree.query(traj[..., :2].reshape(-1, 2), distance_upper_bound=threshold)
    dist = dist.reshape(B, H)
    idx = idx.reshape(B, H)
    if dist.min() > threshold:
        return traj
    force_field = np.zeros((B, H, 2))
    for b in range(B):
        for t in range(H):
            if dist[b, t] >= threshold or idx[b, t] >= len(pts):
                continue
            nearest = pts[idx[b, t]]
            direction = traj[b, t, :2] - nearest
            direction = direction / (np.linalg.norm(direction) + 1e-8)
            mag = strength * np.exp(-dist[b, t] / threshold)
            for k, off in enumerate(range(-window, window + 1)):
                j = t + off
                if 0 <= j < H:
                    force_field[b, j] += mag * direction * weights[k]
    traj[..., :2] += force_field
    return traj


def test_nearest_obstacle_exact():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(37, 2)).astype(np.float32)
    q = rng.uniform(-1, 1, size=(5, 9, 2)).astype(np.float32)
    dist, nearest = nearest_obstacle(jnp.asarray(q), jnp.asarray(pts))
    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(q.reshape(-1, 2))
    np.testing.assert_allclose(np.asarray(dist).ravel(), d_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nearest).reshape(-1, 2), pts[i_ref], atol=1e-6)


def test_apf_static_matches_reference_semantics():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.5, 0.5, size=(64, 2)).astype(np.float32)
    traj = rng.uniform(-1, 1, size=(4, 16, 4)).astype(np.float32)
    got = np.asarray(apf_static_batch(jnp.asarray(traj), jnp.asarray(pts),
                                      distance_threshold=0.2, strength=0.1, window=3))
    expected = _reference_static_avoidance(traj, pts, 0.2, 0.1, 3)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_apf_static_noop_when_far():
    traj = np.zeros((2, 8, 4), np.float32)
    pts = np.full((10, 2), 5.0, np.float32)
    got = np.asarray(apf_static_batch(jnp.asarray(traj), jnp.asarray(pts)))
    np.testing.assert_array_equal(got, traj)


def test_apf_windowed_pushes_away():
    # trajectory passing through an obstacle point cluster at the origin
    H = 16
    traj = np.zeros((H, 4), np.float32)
    traj[:, 0] = np.linspace(-1, 1, H)
    pts = np.zeros((8, 2), np.float32)
    out = np.asarray(apf_windowed(jnp.asarray(traj), jnp.asarray(pts),
                                  distance_threshold=0.3, strength=0.15, window=4))
    mid = H // 2
    moved = np.linalg.norm(out[:, :2] - traj[:, :2], axis=-1)
    assert moved[mid] > 0 or moved[mid - 1] > 0
    # last row is never updated (exclusive end capped at H-1)
    assert moved[-1] == 0


def test_apf_pursuer_goal_blend_direction():
    H = 8
    traj = np.zeros((H, 4), np.float32)
    pursuer_pts = np.full((16, 2), 0.05, np.float32)
    goal = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    out = np.asarray(apf_pursuer(jnp.asarray(traj), jnp.asarray(pursuer_pts),
                                 distance_threshold=0.5, strength=0.15, goal=goal))
    # pushed away from pursuer (negative direction) with a pull toward goal x+
    delta = out[:, :2] - traj[:, :2]
    assert np.all(np.linalg.norm(delta, axis=-1) > 0)


def test_apf_pursuer_decay_uses_static_threshold():
    """The reference masks pursuer hits with the pred threshold but decays
    the force with the obstacle field's STATIC threshold
    (APFhelper_dynamic.py:141: exp(-d / obstacle_field.distance_threshold))."""
    from ramp_tpu.guidance.apf import apf_pursuer

    traj = jnp.zeros((4, 4)).at[:, 0].set(jnp.asarray([0.0, 0.1, 0.2, 0.9]))
    pts = jnp.asarray([[-0.3, 0.0]])
    goal = jnp.asarray([2.0, 0.0, 0.0, 0.0])
    thr_pred, thr_static, strength = 0.5, 0.2, 0.15

    out = apf_pursuer(traj, pts, thr_pred, strength, goal,
                      goal_blend=0.0, decay_threshold=thr_static)
    # row 0: d = 0.3 < thr_pred -> pushed along +x with exp(-d/thr_static)
    d0 = 0.3
    expected = strength * np.exp(-d0 / thr_static)
    np.testing.assert_allclose(float(out[0, 0] - traj[0, 0]), expected,
                               rtol=1e-5)
    # row 3: d = 1.2 > thr_pred -> untouched
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(traj[3]),
                               atol=1e-7)
    # default decay falls back to the mask threshold (legacy behavior)
    legacy = apf_pursuer(traj, pts, thr_pred, strength, goal, goal_blend=0.0)
    np.testing.assert_allclose(float(legacy[0, 0] - traj[0, 0]),
                               strength * np.exp(-d0 / thr_pred), rtol=1e-5)


def test_apf_static_batch_3d_extension():
    """The force math is dimension-generic: a [N, 3] cloud applies forces
    to the first three state dims (beyond-parity — the reference has no
    3-D APF)."""
    import jax.numpy as jnp

    from ramp_tpu.guidance.apf import apf_static_batch

    h = 8
    # trajectory passing straight through a point at the origin, in 3-D
    xyz = jnp.stack([jnp.linspace(-0.1, 0.1, h),
                     jnp.zeros(h), jnp.zeros(h)], axis=-1)
    traj = jnp.concatenate([xyz, jnp.zeros((h, 3))], axis=-1)[None]  # [1,8,6]
    pts = jnp.asarray([[0.0, 0.001, 0.0]])
    out = apf_static_batch(traj, pts, distance_threshold=0.07,
                          strength=0.1, window=3)
    # pushed away from the obstacle along -y (the obstacle sits at +y)
    assert float(out[0, h // 2, 1]) < float(traj[0, h // 2, 1])
    # velocity dims (3:6) untouched
    assert jnp.allclose(out[0, :, 3:], traj[0, :, 3:])
    # a trajectory entirely far from the cloud is untouched
    far = traj + jnp.asarray([0.0, 0.8, 0.0, 0.0, 0.0, 0.0])
    out_far = apf_static_batch(far, pts, distance_threshold=0.07,
                               strength=0.1, window=3)
    assert jnp.allclose(out_far, far)
