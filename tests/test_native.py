"""Native (C++) planning core vs the pure-Python reference pipeline."""
import numpy as np
import pytest

from ramp_tpu.data import native
from ramp_tpu.data.generator import _occupancy_grid, plan_trajectory

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

CENTERS = np.array([[0.0, 0.0], [0.5, 0.5]], np.float32)
SIZES = np.array([[0.4, 0.4], [0.2, 0.3]], np.float32)


def test_occupancy_grid_exact_parity():
    occ_py = _occupancy_grid(CENTERS, SIZES, 64, 0.05)
    occ_c = native.occupancy_grid_native(CENTERS, SIZES, 64, 0.05)
    np.testing.assert_array_equal(occ_py, occ_c.astype(bool))


def test_native_plan_is_collision_free_and_pinned():
    rng = np.random.default_rng(0)
    tr = plan_trajectory(CENTERS, SIZES, [-0.8, -0.8], [0.8, -0.6], 48, rng,
                         use_native=True)
    assert tr is not None and tr.shape == (48, 4)
    for c, s in zip(CENTERS, SIZES):
        inside = np.all(np.abs(tr[:, :2] - c) <= s / 2, axis=-1)
        assert not inside.any()
    np.testing.assert_allclose(tr[0, :2], [-0.8, -0.8], atol=1e-6)
    np.testing.assert_allclose(tr[-1, :2], [0.8, -0.6], atol=1e-6)
    np.testing.assert_allclose(tr[0, 2:], 0.0)
    np.testing.assert_allclose(tr[-1, 2:], 0.0)


def test_native_unreachable_returns_none():
    # goal sealed inside a box
    occ = native.occupancy_grid_native(CENTERS, SIZES, 64, 0.05)
    out = native.plan_trajectory_native(occ, [-0.8, -0.8], [0.0, 0.0], 32,
                                        seed=1)
    assert out is None


def test_native_and_python_same_quality():
    """Both pipelines must produce comparable path lengths (same algorithm)."""
    rng = np.random.default_rng(2)
    lengths = {}
    for use_native in (True, False):
        tr = plan_trajectory(CENTERS, SIZES, [-0.8, -0.8], [0.8, 0.8], 64,
                             np.random.default_rng(2), use_native=use_native)
        assert tr is not None
        lengths[use_native] = float(
            np.linalg.norm(np.diff(tr[:, :2], axis=0), axis=-1).sum())
    assert abs(lengths[True] - lengths[False]) / lengths[False] < 0.25
