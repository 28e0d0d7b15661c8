"""Dataset generator + loader tests (synthetic MPD-layout round-trip)."""
import numpy as np
import pytest

from ramp_tpu.data.dataset import TrajectoryDataset, batch_iterator
from ramp_tpu.data.generator import (
    generate_dataset, plan_trajectory, sample_free_point,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ds")
    return generate_dataset(str(out), n_tasks=3, n_trajs_per_task=4,
                            horizon=32, points_per_obstacle=16, seed=7)


def test_generated_trajectories_are_collision_free():
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0]], np.float32)
    sizes = np.array([[0.4, 0.4]], np.float32)
    start = np.array([-0.8, -0.8], np.float32)
    goal = np.array([0.8, 0.8], np.float32)
    traj = plan_trajectory(centers, sizes, start, goal, horizon=48, rng=rng)
    assert traj is not None and traj.shape == (48, 4)
    # no waypoint inside the (uninflated) box
    inside = np.all(np.abs(traj[:, :2] - centers[0]) <= sizes[0] / 2, axis=-1)
    assert not inside.any()
    np.testing.assert_allclose(traj[0, :2], start, atol=1e-6)
    np.testing.assert_allclose(traj[-1, :2], goal, atol=1e-6)
    np.testing.assert_allclose(traj[0, 2:], 0.0, atol=1e-6)


def test_sample_free_point_avoids_boxes():
    rng = np.random.default_rng(1)
    centers = np.array([[0.0, 0.0]], np.float32)
    sizes = np.array([[0.8, 0.8]], np.float32)
    for _ in range(20):
        p = sample_free_point(centers, sizes, rng)
        assert not np.all(np.abs(p) <= 0.4 + 0.08)


def test_dataset_loads_and_normalizes(dataset_dir):
    ds = TrajectoryDataset(dataset_dir, include_velocity=True)
    assert ds.n_trajs == 12
    assert ds.horizon == 32 and ds.state_dim == 4
    assert ds.trajs_normalized.min() >= -1.0 - 1e-5
    assert ds.trajs_normalized.max() <= 1.0 + 1e-5
    item = ds[0]
    assert item["traj"].shape == (32, 4)
    assert item["obstacle_points"].shape[-1] == 2
    # round-trip through the normalizer
    rt = np.asarray(ds.normalizer.unnormalize(ds.trajs_normalized[0]))
    np.testing.assert_allclose(rt, ds.trajs[0], atol=1e-4)


def test_dataset_single_task_selection(dataset_dir):
    full = TrajectoryDataset(dataset_dir)
    one = TrajectoryDataset(dataset_dir, task_ids=[1])
    assert one.n_trajs == 4
    sel = full.map_task_id_to_trajectories_id[1]
    np.testing.assert_allclose(one.trajs, full.trajs[sel])


def test_hard_conds_zero_velocity(dataset_dir):
    ds = TrajectoryDataset(dataset_dir)
    hc = ds.hard_conds(0)
    np.testing.assert_allclose(hc["start"][2:], 0.0)
    np.testing.assert_allclose(hc["goal"][2:], 0.0)
    np.testing.assert_allclose(hc["start"][:2], ds.trajs_normalized[0, 0, :2])


def test_batch_iterator_shapes_and_reshuffle(dataset_dir):
    ds = TrajectoryDataset(dataset_dir)
    it = batch_iterator(ds, batch_size=4, seed=3, process_sharded=False)
    b1 = next(it)
    assert b1["traj"].shape == (4, 32, 4)
    assert b1["obstacle_points"].shape[0] == 4
    # drain the epoch; next epoch should reshuffle
    epoch1 = [next(it) for _ in range(2)]
    b_next_epoch = next(it)
    assert b_next_epoch["traj"].shape == (4, 32, 4)


def test_multi_root_concat(tmp_path):
    """Comma-separated dataset roots concatenate tasks (scene augmentation)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_dataset(a, n_tasks=2, n_trajs_per_task=3, horizon=16,
                     points_per_obstacle=8, seed=0)
    generate_dataset(b, n_tasks=3, n_trajs_per_task=3, horizon=16,
                     points_per_obstacle=8, seed=1)
    da = TrajectoryDataset(a)
    dab = TrajectoryDataset(f"{a},{b}")
    assert len(dab) == 5 * 3
    assert len(dab.task_dirs) == 5
    # first root's trajectories come first, in the same order
    np.testing.assert_allclose(dab.trajs[:len(da)], da.trajs)
    # normalizer fits the union -> normalized trajs stay in [-1, 1]
    assert np.all(np.abs(dab.trajs_normalized) <= 1.0 + 1e-6)


def test_normalizer_from_reference_root(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_dataset(a, n_tasks=2, n_trajs_per_task=3, horizon=16,
                     points_per_obstacle=8, seed=0)
    generate_dataset(b, n_tasks=2, n_trajs_per_task=3, horizon=16,
                     points_per_obstacle=8, seed=1)
    da = TrajectoryDataset(a)
    dab = TrajectoryDataset(f"{a},{b}", normalizer_from=a)
    np.testing.assert_allclose(dab.normalizer.mins, da.normalizer.mins)
    np.testing.assert_allclose(dab.normalizer.maxs, da.normalizer.maxs)
    # multi-root task identity is unambiguous
    assert len(set(dab.task_dirs)) == len(dab.task_dirs)


def test_task_metadata_is_per_task(tmp_path):
    """Sphere geometry varies per task dir; dataset.task_metadata must keep
    each task's own metadata (regression: a single dataset-level dict held
    only the LAST task's spheres, so 3-D collision metrics checked task 0's
    boxes against task N's spheres)."""
    from ramp_tpu.data.generator import generate_dataset_3d
    from ramp_tpu.data.dataset import TrajectoryDataset
    out = str(tmp_path / "ds3d2")
    generate_dataset_3d(out, n_tasks=2, n_trajs_per_task=2, horizon=16,
                        points_per_obstacle=8, n_boxes=3, n_spheres=2, seed=0)
    ds = TrajectoryDataset(out, include_velocity=True)
    assert len(ds.task_metadata) == 2
    c0 = np.asarray(ds.task_metadata[0]["sphere_centers"])
    c1 = np.asarray(ds.task_metadata[1]["sphere_centers"])
    assert c0.shape == c1.shape and not np.allclose(c0, c1)
    # legacy aggregate view keeps the last task's metadata
    np.testing.assert_allclose(
        np.asarray(ds.metadata["sphere_centers"]), c1)


def test_cluttered_scene_padding_cycles_planned_trajectories():
    """Padding a short plan set must cycle ALL planned trajectories, not
    repeat a single one (a len % (len-1) expression always resolved to 1)."""
    from ramp_tpu.data.generator import plan_trajectories_for_scene
    import numpy as np

    # monkeypatch-free check of the cycling arithmetic on the real function
    # is awkward (planning is stochastic), so check the invariant directly:
    trajs = [np.full((4, 2), i, np.float32) for i in range(3)]
    n_planned = len(trajs)
    while len(trajs) < 10:
        trajs.append(trajs[len(trajs) % n_planned])
    firsts = [int(t[0, 0]) for t in trajs]
    assert firsts == [0, 1, 2, 0, 1, 2, 0, 1, 2, 0]


def test_pursuer_aware_predator_dataset(tmp_path):
    """generate_dataset_predator: [n_boxes+1]-row clouds whose last row is
    the pursuer sphere cloud, and demonstrations that clear the inflated
    pursuer disc (the pursuer-conditioning training signal)."""
    import yaml

    from ramp_tpu.data.generator import generate_dataset_predator

    out = str(tmp_path / "pred")
    generate_dataset_predator(out, n_tasks=2, n_trajs_per_task=4,
                              horizon=24, points_per_obstacle=16, seed=11,
                              n_boxes=4, pursuer_radius=0.1,
                              pursuer_margin=0.15)
    for task in ("0", "1"):
        pts = np.load(f"{out}/{task}/obstacle_points.npy")
        trajs = np.load(f"{out}/{task}/trajs-free.npy")
        meta = yaml.safe_load(open(f"{out}/{task}/metadata.yaml"))
        assert pts.shape == (5, 16, 2)
        assert trajs.shape == (4, 24, 4)
        pc = np.asarray(meta["pursuer_center"], np.float32)
        # last cloud row is centered on the pursuer at its radius
        rad = np.linalg.norm(pts[-1] - pc, axis=-1)
        assert rad.max() <= meta["pursuer_radius"] + 1e-5
        # every demo waypoint clears the inflated disc (r + margin)
        d = np.linalg.norm(trajs[:, :, :2] - pc, axis=-1)
        assert d.min() > 0.1 + 0.15 - 0.03  # small slack: grid resolution

    # the standard loader reads the layout unchanged (per-item clouds:
    # 2 tasks x 4 trajs)
    ds = TrajectoryDataset(out, include_velocity=True)
    assert ds.obstacle_points.shape == (8, 5, 16, 2)
    assert ds.horizon == 24


def test_pursuer_aware_obstacle_rich_variant(tmp_path):
    """EnvPredatorObstacles (ref deps/.../EnvPredatorExtra.py:13): 8 boxes
    + the pursuer row."""
    from ramp_tpu.data.generator import generate_dataset_predator

    out = str(tmp_path / "predobs")
    generate_dataset_predator(out, n_tasks=1, n_trajs_per_task=3,
                              horizon=24, points_per_obstacle=16, seed=3,
                              n_boxes=8, env_id="EnvPredatorObstacles")
    pts = np.load(f"{out}/0/obstacle_points.npy")
    assert pts.shape == (9, 16, 2)
    import yaml
    meta = yaml.safe_load(open(f"{out}/0/metadata.yaml"))
    assert meta["env_id"] == "EnvPredatorObstacles"
    assert len(meta["box_centers"]) == 8
