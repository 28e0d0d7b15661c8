"""Executable quality claim: the committed static flagship weights must keep
scoring on a small fixed grid (VERDICT r3 item 9).

RESULTS.md records simple2d_v4_300k at 0.985 success / 5.08 % collision on
the full 96x20x20 chip grid. This test runs the same weights through the
same harness on a 4-env x 3-context x 20-sample CPU subgrid and pins loose
aggregate bands, so a sampler/normalizer/encoder regression that would
silently invalidate the headline numbers fails the suite instead. CPU
proxies historically track the chip within ~2 points (RESULTS.md "Chip
rerun" sections); the bands below leave ~15 points of slack on a 12-cell
grid — loose enough for platform noise, tight enough that a real break
(wrong weights, broken CFG fold, unnormalized contexts) lands far outside.
"""
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "artifacts", "weights", "simple2d_v4_300k.npz")
DATASET = os.path.join(REPO, "dataset", "EnvSimple2dquant_v2")


@pytest.mark.slow
def test_static_flagship_subgrid_aggregates(tmp_path):
    if not (os.path.exists(WEIGHTS) and os.path.isdir(DATASET)):
        pytest.skip("flagship weights/dataset not present")
    from ramp_tpu.data.dataset import TrajectoryDataset
    from ramp_tpu.eval.harness import StaticEvalHarness
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
    from ramp_tpu.utils.checkpoints import load_planner_params

    dataset = TrajectoryDataset(DATASET, include_velocity=True)
    cfg = StaticPlannerConfig(horizon=dataset.horizon,
                              state_dim=dataset.state_dim,
                              unet_input_dim=32, unet_dim_mults_option=1)
    planner = StaticPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = load_planner_params(planner, WEIGHTS, n_obs, n_pts, seed=0)
    harness = StaticEvalHarness(planner, params,
                                normalizer=dataset.normalizer)
    results = harness.run_full_evaluation(
        dataset, n_contexts=3, n_samples=20, seed=0,
        results_path=str(tmp_path / "eval.json"), max_tasks=4)
    agg = results["aggregate"]
    # flagship full-grid: success 0.985, collision 5.08 %, wander 0
    assert agg["success_rate"] >= 0.80, agg
    assert agg["collision_intensity"] <= 12.0, agg
