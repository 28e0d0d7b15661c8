"""End-to-end eval-harness tests on a tiny model (CPU, fast compile)."""
import json
import os

import jax
import numpy as np
import pytest

from ramp_tpu.data.generator import generate_dataset
from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.eval.harness import ContextManager, StaticEvalHarness, sample_context
from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("ds_eval")
    generate_dataset(str(out), n_tasks=2, n_trajs_per_task=3, horizon=16,
                     points_per_obstacle=8, seed=11)
    dataset = TrajectoryDataset(str(out))
    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              dtype="float32")
    planner = StaticPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = planner.init_params(jax.random.PRNGKey(0), n_obs, n_pts)
    return dataset, planner, params


@pytest.mark.slow
def test_static_full_evaluation_json(tiny_setup, tmp_path):
    dataset, planner, params = tiny_setup
    harness = StaticEvalHarness(planner, params, normalizer=dataset.normalizer)
    results_path = str(tmp_path / "eval_results_static.json")
    results = harness.run_full_evaluation(
        dataset, n_contexts=2, n_samples=4, seed=0, results_path=results_path)
    agg = results["aggregate"]
    assert agg["n_envs"] == 2 and agg["n_contexts"] == 2
    assert 0.0 <= agg["success_rate"] <= 1.0
    assert agg["collision_intensity"] >= 0.0
    assert agg["t_sampling_mean_s"] > 0
    with open(results_path) as f:
        loaded = json.load(f)
    assert loaded["aggregate"]["n_envs"] == 2


def test_context_manager_roundtrip(tmp_path):
    mgr = ContextManager(str(tmp_path / "ctx"))
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0]], np.float32)
    sizes = np.array([[0.3, 0.3]], np.float32)
    ctx = mgr.get_or_create(0, rng, centers, sizes)
    ctx2 = mgr.load(0)
    np.testing.assert_allclose(ctx["start"], ctx2["start"])
    # second get returns the saved one, not a new draw
    ctx3 = mgr.get_or_create(0, rng, centers, sizes)
    np.testing.assert_allclose(ctx["goal"], ctx3["goal"])


def test_sample_context_free_and_separated():
    rng = np.random.default_rng(2)
    centers = np.array([[0.0, 0.0]], np.float32)
    sizes = np.array([[0.5, 0.5]], np.float32)
    ctx = sample_context(rng, centers, sizes, min_separation=1.0)
    assert np.linalg.norm(ctx["goal"][:2] - ctx["start"][:2]) >= 1.0
    np.testing.assert_allclose(ctx["start"][2:], 0.0)


def test_endpoints_pinned_in_plans(tiny_setup):
    dataset, planner, params = tiny_setup
    harness = StaticEvalHarness(planner, params, normalizer=dataset.normalizer)
    rng = np.random.default_rng(5)
    idx = 0
    ctx = sample_context(rng, dataset.box_centers[idx], dataset.box_sizes[idx])
    out = harness.run_context(jax.random.PRNGKey(0),
                              dataset.obstacle_points[idx],
                              dataset.box_centers[idx],
                              dataset.box_sizes[idx], ctx, n_samples=4)
    trajs = out["trajs"]
    # the planner pins in normalized space; a context outside the dataset's
    # fit range clips on unnormalize (reference LimitsNormalizer semantics),
    # so compare against the round-tripped endpoints
    norm = dataset.normalizer
    start_rt = np.asarray(norm.unnormalize(norm.normalize(ctx["start"])))[:2]
    goal_rt = np.asarray(norm.unnormalize(norm.normalize(ctx["goal"])))[:2]
    np.testing.assert_allclose(trajs[:, 0, :2], np.tile(start_rt, (4, 1)), atol=5e-3)
    np.testing.assert_allclose(trajs[:, -1, :2], np.tile(goal_rt, (4, 1)), atol=5e-3)


def test_compose_split_shapes():
    import numpy as np
    from ramp_tpu.eval.harness import compose_split
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(10, 64, 2)).astype(np.float32)
    out = compose_split(pts, rng)
    assert out.shape == (2, 6, 64, 2)
    np.testing.assert_allclose(out[0], pts[:6])
    np.testing.assert_allclose(out[1][:4], pts[6:])
    # duplicates come from the remaining four
    for dup in out[1][4:]:
        assert any(np.allclose(dup, p) for p in pts[6:])


def test_collision_intensity_3d():
    from ramp_tpu.eval.metrics import (compute_collision_intensity_3d,
                                       compute_path_length_3d)
    import numpy as np
    # straight line through a unit box at the origin; sphere far away
    H = 8
    traj = np.zeros((1, H, 6), np.float32)
    traj[0, :, 0] = np.linspace(-2, 2, H)  # x sweep, y=z=0
    ci = compute_collision_intensity_3d(
        traj, np.zeros((1, 3)), np.ones((1, 3)),
        sphere_centers=np.array([[5.0, 5.0, 5.0]]),
        sphere_radii=np.array([0.5]))
    inside = np.abs(np.linspace(-2, 2, H)) <= 0.5
    assert float(ci[0]) == pytest.approx(inside.mean())
    # sphere hit: waypoint at its center
    traj2 = np.full((1, 2, 6), 5.0, np.float32)
    ci2 = compute_collision_intensity_3d(
        traj2, np.zeros((1, 3)), np.ones((1, 3)),
        sphere_centers=np.array([[5.0, 5.0, 5.0]]),
        sphere_radii=np.array([0.5]))
    assert float(ci2[0]) == 1.0
    # no spheres given
    ci3 = compute_collision_intensity_3d(traj, np.zeros((1, 3)),
                                         np.ones((1, 3)))
    assert float(ci3[0]) == pytest.approx(inside.mean())
    # xyz arc length of the sweep is 4
    assert float(compute_path_length_3d(traj)[0]) == pytest.approx(4.0, rel=1e-5)
