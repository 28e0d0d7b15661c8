"""Eval-side helpers that had no direct tests: the dynamic harness's chain
unpacking and static-collision check, the mid-training sampling summary, the
host-side visualizers, and the timing/profiling utilities."""
import collections
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramp_tpu.eval.dynamic_harness import (
    DynamicEvalHarness, episode_chains, static_collision_of_path,
)
from ramp_tpu.eval.summaries import make_sampling_summary
from ramp_tpu.planners.dynamic import EpisodeResult


def _fake_episode_result(k_total=4, n_valid=2, horizon=6, d=4):
    return EpisodeResult(
        plans=jnp.arange(k_total * horizon * d, dtype=jnp.float32)
            .reshape(k_total, horizon, d),
        pursuer_centers=jnp.ones((k_total, 2)) * 0.5,
        evader_states=jnp.arange(k_total * d, dtype=jnp.float32)
            .reshape(k_total, d),
        valid=jnp.asarray([True] * n_valid + [False] * (k_total - n_valid)),
        n_steps=jnp.asarray(n_valid),
        high_plan=jnp.zeros((horizon, d)),
    )


def test_episode_chains_valid_prefix():
    chains = episode_chains(_fake_episode_result(k_total=4, n_valid=2))
    assert chains["n_steps"] == 2
    assert chains["chain_start"].shape == (2, 2)   # xy slice of evader states
    assert chains["chain_obs"].shape == (2, 2)
    assert chains["plans"].shape[0] == 2
    # xy slice really is the first two state components
    np.testing.assert_allclose(chains["chain_start"][1], [4.0, 5.0])


def test_static_collision_of_path():
    centers = np.asarray([[0.0, 0.0]])
    sizes = np.asarray([[0.4, 0.4]])
    inside = np.asarray([[0.1, 0.1]])
    outside = np.asarray([[0.9, 0.9], [-0.9, 0.3]])
    assert static_collision_of_path(inside, centers, sizes) is True
    assert static_collision_of_path(outside, centers, sizes) is False
    assert static_collision_of_path(np.zeros((0, 2)), centers, sizes) is False
    # scalar per-box sizes broadcast like the square-box dataset layout
    assert static_collision_of_path(inside, centers, np.asarray([0.4])) is True


class _FakePlanner:
    """Stands in for StaticPlanner in the summary test: returns one free
    trajectory hugging the left edge and one driven through the box."""

    def __init__(self, horizon=8):
        h = self.horizon = horizon

    def plan(self, params, key, obstacle_points, start, goal, n_samples,
             return_chain):
        t = jnp.linspace(-0.9, 0.9, self.horizon)
        free = jnp.stack([jnp.full_like(t, -0.9), t,
                          jnp.zeros_like(t), jnp.zeros_like(t)], axis=-1)
        hit = free.at[:, 0].set(0.0)  # x=0 column passes through the box
        trajs = jnp.stack([free, hit] + [free] * (n_samples - 2))
        return trajs, None


def test_make_sampling_summary_reports_success_and_fraction_free():
    State = collections.namedtuple("State", "ema_params")
    summary_fn = make_sampling_summary(
        _FakePlanner(), obstacle_points=np.zeros((1, 4, 2), np.float32),
        box_centers=np.asarray([[0.0, 0.0]]), box_sizes=np.asarray([[0.3, 0.3]]),
        start=np.asarray([-0.9, -0.9, 0, 0], np.float32),
        goal=np.asarray([-0.9, 0.9, 0, 0], np.float32), n_samples=4)
    m = summary_fn(State(ema_params=None), step=10)
    assert m["summary/success"] == 1
    assert m["summary/fraction_free"] == pytest.approx(3 / 4)
    assert m["summary/collision_intensity"] > 0
    assert m["summary/path_length"] is not None


def test_visualizers_write_files(tmp_path):
    from ramp_tpu.eval import visualization as viz
    trajs = np.stack([np.linspace([-0.9, -0.9], [0.9, 0.9], 10),
                      np.linspace([-0.9, 0.9], [0.9, -0.9], 10)])
    centers, sizes = np.asarray([[0.0, 0.5]]), np.asarray([[0.3, 0.3]])

    png = tmp_path / "static.png"
    viz.save_static_plot(str(png), trajs, centers, sizes,
                         obstacle_points=np.random.rand(1, 8, 2) - 0.5,
                         start=[-0.9, -0.9], goal=[0.9, 0.9],
                         collision_free=np.asarray([True, False]))
    assert png.stat().st_size > 0

    gif = tmp_path / "ep.gif"
    chains = {"chain_start": np.asarray([[-0.9, -0.9], [-0.5, -0.5]]),
              "chain_obs": np.asarray([[0.5, 0.5], [0.4, 0.4]]),
              "plans": np.zeros((2, 6, 4))}
    viz.save_dynamic_gif(str(gif), chains, centers, sizes, goal=[0.9, 0.9])
    assert gif.stat().st_size > 0

    p3d = tmp_path / "scene3d.png"
    t3 = np.stack([np.linspace([-0.9] * 3, [0.9] * 3, 8)])
    viz.save_3d_plot(str(p3d), t3, np.asarray([[0.0, 0.0, 0.0]]),
                     np.asarray([[0.3, 0.3, 0.3]]),
                     sphere_centers=np.asarray([[0.5, 0.5, 0.5]]),
                     sphere_radii=np.asarray([0.2]),
                     start=np.asarray([-0.9] * 3), goal=np.asarray([0.9] * 3))
    assert p3d.stat().st_size > 0

    g3d = tmp_path / "scene3d.gif"
    viz.save_3d_gif(str(g3d), t3, np.asarray([[0.0, 0.0, 0.0]]),
                    np.asarray([[0.3, 0.3, 0.3]]),
                    sphere_centers=np.asarray([[0.5, 0.5, 0.5]]),
                    sphere_radii=np.asarray([0.2]),
                    start=np.asarray([-0.9] * 3), goal=np.asarray([0.9] * 3),
                    n_frames=3, fps=3)
    assert g3d.stat().st_size > 0


def test_timer_and_timed():
    from ramp_tpu.utils.timer import Timer, timed
    x = jnp.arange(16.0)
    with Timer() as t:
        t.sync(x * 2)
    assert t.elapsed > 0
    out, secs = timed(jnp.sum, x)
    assert float(out) == float(x.sum())
    assert secs > 0


def test_profiling_annotate_and_trace(tmp_path):
    from ramp_tpu.utils.profiling import annotate, trace
    with trace(str(tmp_path / "prof")):
        with annotate("region"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert os.listdir(tmp_path / "prof")  # a trace directory was written


@pytest.mark.slow
def test_dynamic_eval_harness_end_to_end(tmp_path):
    """Tiny closed-loop grid through the full harness: context draw/persist,
    episode run, metric aggregation, JSON dump."""
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               max_iterations=4, points_per_obstacle=8,
                               dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                                        minval=-0.8, maxval=0.8))
    centers = np.asarray([[-0.5, 0.5], [0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]],
                         np.float32)
    sizes = np.full((4, 2), 0.25, np.float32)

    harness = DynamicEvalHarness(p, params, points_per_obstacle=8)
    out = harness.run_multiple_experiments(
        pts, centers, sizes, n_contexts=1, n_experiments=1, n_samples=3,
        seed=0, results_path=str(tmp_path / "res.json"),
        context_dir=str(tmp_path / "ctx"))
    agg = out["aggregate"]
    assert 0.0 <= agg["score"] <= 1.0
    assert agg["capture_rate"] in (0.0, 1.0)
    assert len(out["episodes"]) == 1
    assert (tmp_path / "res.json").exists()
    # context was persisted and reloads identically
    from ramp_tpu.eval.harness import ContextManager
    ctx = ContextManager(str(tmp_path / "ctx")).load(0)
    assert ctx is not None and "pursuer" in ctx


def test_sample_free_point_3d_avoids_geometry():
    from ramp_tpu.eval.harness import sample_free_scene_point_3d

    rng = np.random.default_rng(0)
    boxes_c = np.asarray([[0.0, 0.0, 0.0]])
    boxes_s = np.asarray([[1.0, 1.0, 1.0]])
    sph_c = np.asarray([[0.7, 0.7, 0.7]])
    sph_r = np.asarray([0.25])
    for _ in range(200):
        pt = sample_free_scene_point_3d(rng, boxes_c, boxes_s, sph_c, sph_r)
        assert not np.all(np.abs(pt - boxes_c[0]) <= 0.5 + 0.05)
        assert np.linalg.norm(pt - sph_c[0]) > 0.25 + 0.05
        assert np.abs(pt).max() <= 0.9

    # an all-blocking scene must raise, not loop forever
    with pytest.raises(RuntimeError):
        sample_free_scene_point_3d(rng, np.asarray([[0.0, 0.0, 0.0]]),
                             np.asarray([[4.0, 4.0, 4.0]]), max_tries=50)


# ---------------------------------------------------- path-sanity gate (r3)

def _traj(points, h=64):
    """Piecewise-linear [h, 2] trajectory through the given xy points."""
    pts = np.asarray(points, np.float32)
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=-1)
    cum = np.concatenate([[0], np.cumsum(seg)])
    s = np.linspace(0, cum[-1], h)
    out = np.stack([np.interp(s, cum, pts[:, i]) for i in range(2)], axis=-1)
    return out


def test_path_sanity_direct_and_jittered_pass():
    from ramp_tpu.eval.metrics import path_sanity_mask
    direct = _traj([[-0.8, -0.8], [0.8, 0.8]])
    rng = np.random.default_rng(0)
    jittered = direct + rng.normal(scale=0.04, size=direct.shape)
    # per-waypoint jitter inflates raw arc length (~64 * 0.04 extra) but the
    # decimated macro length stays near the route length -> must pass
    trajs = np.stack([direct, jittered])
    assert path_sanity_mask(trajs).all()


def test_path_sanity_wander_fails():
    from ramp_tpu.eval.metrics import path_sanity_mask, \
        trajectory_success_and_metrics
    # a wandering sweep across the domain: collision-free but 6x+ the
    # straight-line distance even after decimation (the compose-APF /
    # broken-DDIM artifact shape)
    wander = _traj([[-0.8, -0.8], [0.8, -0.6], [-0.8, -0.2], [0.8, 0.2],
                    [-0.8, 0.6], [0.8, 0.8]])
    direct = _traj([[-0.8, -0.8], [0.8, 0.8]])
    mask = path_sanity_mask(np.stack([wander, direct]))
    assert not mask[0] and mask[1]
    # success must be gated: all-wander population scores 0
    m = trajectory_success_and_metrics(wander[None], np.zeros(1))
    assert m["success"] == 0 and m["n_wander_trajectories"] == 1
    # with the gate off (reference-parity mode) it scores 1
    m = trajectory_success_and_metrics(wander[None], np.zeros(1),
                                       path_gate=False)
    assert m["success"] == 1
