"""Planner integration tests on tiny models (CPU; compile-bounded sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig
from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig


def test_static_planner_ddim_steps_override():
    # parity defaults: 5 plain, 8 compose+APF (ref diffusion_model_static.py:40)
    assert StaticPlannerConfig().ddim_steps == 5
    assert StaticPlannerConfig(compose=True, use_apf=True).ddim_steps == 8
    # tuning override wins in either mode
    assert StaticPlannerConfig(ddim_steps_override=10).ddim_steps == 10
    assert StaticPlannerConfig(compose=True, use_apf=True,
                               ddim_steps_override=4).ddim_steps == 4


@pytest.mark.slow
def test_static_planner_override_chain_length():
    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              ddim_steps_override=4, dtype="float32")
    p = StaticPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    x, chain = p.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                      n_samples=2)
    assert x.shape == (2, 16, 4)
    assert chain.shape[0] == 4 + 1
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_static_planner_compose_mode():
    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              compose=True, use_apf=True, dtype="float32")
    assert cfg.ddim_steps == 8  # compose+APF -> 8 (ref diffusion_model_static.py:40)
    p = StaticPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 8, 2),
                             minval=-0.8, maxval=0.8)  # two obstacle sets
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    x, chain = p.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                      n_samples=3)
    assert x.shape == (3, 16, 4)
    assert chain.shape[0] == cfg.ddim_steps + 1
    np.testing.assert_allclose(np.asarray(x[:, 0]), np.tile(start, (3, 1)),
                               atol=1e-5)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_static_planner_ddpm_with_apf():
    """DDPM ancestral path + APF (ref p_sample_loop w/ APF constants
    apply_from_step=20, window=5). Regression: the APFParams override used
    dataclasses.replace on a NamedTuple and raised TypeError at trace time."""
    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              use_ddim=False, use_apf=True,
                              n_diffusion_steps_without_noise=2,
                              dtype="float32")
    p = StaticPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    x, chain = p.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                      n_samples=2)
    assert x.shape == (2, 16, 4)
    np.testing.assert_allclose(np.asarray(x[:, -1]), np.tile(goal, (2, 1)),
                               atol=1e-5)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_planner3d_shapes_and_pinning():
    cfg = Planner3DConfig(horizon=16, n_diffusion_steps=8, unet_input_dim=8,
                          unet_dim_mults_option=0, dtype="float32")
    p = Planner3D(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=5, n_points=16)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 16, 3),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, -0.8, 0.0, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.8, 0.0, 0.0, 0.0])
    x, chain = p.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                      n_samples=2)
    assert x.shape == (2, 16, 6)
    np.testing.assert_allclose(np.asarray(x[:, -1]), np.tile(goal, (2, 1)),
                               atol=1e-5)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_planner3d_ddim_and_resampling():
    """Optional 3-D paths: the model's own DDIM variant (ref
    diffusion_model_3d.py:220-287 — truncated-linspace grid with -1 sentinel,
    final pair returns x0; x0 clipped by default as a repair of the ref's
    broken dormant path) and the resampling loop (ref :199-210, re-noise
    between repeats)."""
    base = dict(horizon=16, n_diffusion_steps=10, unet_input_dim=8,
                unet_dim_mults_option=0, dtype="float32")
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 16, 3),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, -0.8, 0.0, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.8, 0.0, 0.0, 0.0])

    from ramp_tpu.sampler.ddim import ddim_times_3d

    # exact reference grid for the shipped T=25: 6 model calls at these t
    np.testing.assert_array_equal(np.asarray(ddim_times_3d(25)),
                                  [24, 19, 14, 9, 4, 0, -1])

    cfg = Planner3DConfig(use_ddim=True, **base)
    p = Planner3D(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=5, n_points=16)
    x, chain = p.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                      n_samples=2)
    assert x.shape == (2, 16, 6)
    # chain = initial noise + one entry per (t, t_next) pair of the grid
    assert chain.shape[0] == len(ddim_times_3d(10)) - 1 + 1
    np.testing.assert_allclose(np.asarray(x[:, 0]), np.tile(start, (2, 1)),
                               atol=1e-5)
    assert np.isfinite(np.asarray(x)).all()

    p2 = Planner3D(Planner3DConfig(resample_steps=2, **base))
    x2, _ = p2.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                    n_samples=2)
    assert x2.shape == (2, 16, 6)
    np.testing.assert_allclose(np.asarray(x2[:, -1]), np.tile(goal, (2, 1)),
                               atol=1e-5)
    assert np.isfinite(np.asarray(x2)).all()


@pytest.mark.slow
def test_dynamic_planner_episode():
    """Closed-loop episode end-to-end under jit (tiny everything)."""
    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               max_iterations=4, points_per_obstacle=8,
                               dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    apf_pts = pts.reshape(-1, 2)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    pursuer = jnp.asarray([0.0, 0.8])
    result = p.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                           start, goal, pursuer, n_samples=3)
    assert result.plans.shape == (4, 12, 4)
    assert result.pursuer_centers.shape == (4, 2)
    assert int(result.n_steps) >= 1
    assert np.isfinite(np.asarray(result.plans)).all()
    # pursuer stays in bounds (clipped dynamics)
    assert np.abs(np.asarray(result.pursuer_centers)).max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_dynamic_planner_pursuer_conditioned():
    """pursuer_conditioned appends the live pursuer cloud as an extra
    encoder row per control step (beyond-parity; trained on
    generate_dataset_predator's [O+1]-row clouds)."""
    kwargs = dict(horizon=12, n_diffusion_steps=10, unet_input_dim=8,
                  unet_dim_mults_option=0, ddim_steps_high=5,
                  ddim_steps_low=2, max_iterations=3, points_per_obstacle=8,
                  dtype="float32")
    p = DynamicPlanner(DynamicPlannerConfig(pursuer_conditioned=True,
                                            **kwargs))
    # encoder params are set-size independent: init with the [O+1] layout.
    # Jitter every weight: the cross-attention proj_out is zero-initialized,
    # so at exact init the scene latent (and hence the pursuer row) has no
    # effect on the U-Net output.
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=5, n_points=8)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, ks)])
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    apf_pts = pts.reshape(-1, 2)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    pursuer = jnp.asarray([0.0, 0.8])
    result = p.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                           start, goal, pursuer, n_samples=3)
    assert result.plans.shape == (3, 12, 4)
    assert np.isfinite(np.asarray(result.plans)).all()

    # the conditioning must actually depend on the pursuer position: the
    # same key with a different pursuer start must change the STAGE-I plan
    # (with conditioning OFF it cannot — STAGE I never sees the pursuer)
    far = jnp.asarray([-0.8, 0.8])
    r2 = p.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                       start, goal, far, n_samples=3)
    assert not np.allclose(np.asarray(result.high_plan),
                           np.asarray(r2.high_plan))

    p_off = DynamicPlanner(DynamicPlannerConfig(**kwargs))
    params_off = p_off.init_params(jax.random.PRNGKey(0), n_obstacles=4,
                                   n_points=8)
    leaves, treedef = jax.tree_util.tree_flatten(params_off)
    ks = jax.random.split(jax.random.PRNGKey(43), len(leaves))
    params_off = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, ks)])
    a = p_off.run_episode(params_off, jax.random.PRNGKey(2), pts, apf_pts,
                          start, goal, pursuer, n_samples=3)
    b = p_off.run_episode(params_off, jax.random.PRNGKey(2), pts, apf_pts,
                          start, goal, far, n_samples=3)
    assert np.allclose(np.asarray(a.high_plan), np.asarray(b.high_plan))


@pytest.mark.slow
def test_dynamic_planner_ddpm_variant():
    """DDPM p_sample_loop closed loop (ref diffusion_model_dynamic.py:216-331)
    end-to-end under jit (tiny everything)."""
    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               use_ddim=False,
                               ddpm_predator_start=3, ddpm_high_refine=2,
                               ddpm_replan_step=3, ddpm_max_iterations=4,
                               ddpm_smooth_window_inner=3,
                               points_per_obstacle=8, dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    apf_pts = pts.reshape(-1, 2)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    pursuer = jnp.asarray([0.0, 0.8])
    result = p.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                           start, goal, pursuer, n_samples=3)
    assert result.plans.shape == (cfg.ddpm_max_iterations, 12, 4)
    assert int(result.n_steps) >= 1
    assert np.isfinite(np.asarray(result.plans)).all()
    # endpoint pinning survives the DDPM loop: goal row intact on valid steps
    valid = np.asarray(result.valid)
    goals = np.asarray(result.plans)[valid, -1, :2]
    np.testing.assert_allclose(goals, np.tile(goal[:2], (valid.sum(), 1)),
                               atol=1e-4)


@pytest.mark.slow
def test_static_planner_sharded_population():
    """Inference-time data parallelism: the trajectory population shards over
    the mesh's data axis and matches the single-device result bitwise (JAX
    RNG is value-deterministic regardless of sharding)."""
    from ramp_tpu.parallel.mesh import make_mesh

    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              dtype="float32")
    p = StaticPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    mesh = make_mesh()
    assert mesh.devices.size == 8
    fn = p.plan_fn_sharded(16, mesh)
    x, _ = fn(params, jax.random.PRNGKey(2), pts, start, goal)
    assert x.shape == (16, 16, 4)
    # the population really is sharded across devices
    assert len(x.sharding.device_set) == 8
    x_ref, _ = p.plan(params, jax.random.PRNGKey(2), pts, start, goal,
                      n_samples=16, return_chain=False)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_planner3d_sharded_population():
    from ramp_tpu.parallel.mesh import make_mesh

    cfg = Planner3DConfig(horizon=16, n_diffusion_steps=8, unet_input_dim=8,
                          unet_dim_mults_option=0, dtype="float32")
    p = Planner3D(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=5, n_points=16)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 16, 3),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, -0.8, 0.0, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.8, 0.0, 0.0, 0.0])
    mesh = make_mesh()
    fn = p.plan_fn_sharded(8, mesh)
    x, _ = fn(params, jax.random.PRNGKey(2), pts, start, goal)
    assert x.shape == (8, 16, 6)
    assert len(x.sharding.device_set) == 8
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_dynamic_planner_batched_episodes():
    """vmapped closed-loop episodes: one dispatch runs K contexts and matches
    the per-episode path."""
    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               max_iterations=3, points_per_obstacle=8,
                               dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    k = 2
    pts = jax.random.uniform(jax.random.PRNGKey(1), (k, 4, 8, 2),
                             minval=-0.8, maxval=0.8)
    apf_pts = pts.reshape(k, -1, 2)
    starts = jnp.tile(jnp.asarray([-0.8, -0.8, 0.0, 0.0]), (k, 1))
    goals = jnp.tile(jnp.asarray([0.8, 0.8, 0.0, 0.0]), (k, 1))
    pursuers = jnp.tile(jnp.asarray([0.0, 0.8]), (k, 1))
    keys = jax.random.split(jax.random.PRNGKey(2), k)
    res = p.run_episodes_batch(params, keys, pts, apf_pts, starts, goals,
                               pursuers, n_samples=3)
    assert res.plans.shape == (k, 3, 12, 4)
    assert np.isfinite(np.asarray(res.plans)).all()
    # batched episode 0 == solo episode with the same key/scene
    solo = p.run_episode(params, keys[0], pts[0], apf_pts[0], starts[0],
                         goals[0], pursuers[0], n_samples=3)
    np.testing.assert_allclose(np.asarray(res.plans[0]),
                               np.asarray(solo.plans), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_static_planner_guide_weight_traced():
    """Different CFG weights change the output through the SAME jitted
    callable — the weight is a traced argument, not a baked constant."""
    base = dict(horizon=16, n_diffusion_steps=10, unet_input_dim=8,
                unet_dim_mults_option=0, dtype="float32")
    pA = StaticPlanner(StaticPlannerConfig(cfg_weight=2.0, **base))
    pB = StaticPlanner(StaticPlannerConfig(cfg_weight=6.0, **base))
    params = pA.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    # at random init the cross-attn out-projections are zero-initialized, so
    # cond == uncond and any CFG weight cancels; nudge zeros so the scene
    # conditioning (and hence the weight) has an effect
    params = jax.tree_util.tree_map(
        lambda a: jnp.where(a == 0, 0.01, a) if hasattr(a, "ndim") else a,
        params)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    key = jax.random.PRNGKey(2)
    xA, _ = pA.plan(params, key, pts, start, goal, n_samples=2)
    xB, _ = pB.plan(params, key, pts, start, goal, n_samples=2)
    assert not np.allclose(np.asarray(xA), np.asarray(xB))
    assert len(pA._plan_jit) == 1 and len(pB._plan_jit) == 1
    # the teeth: push BOTH weights through pA's one cached jit entry — a
    # baked-constant implementation has no weight argument and fails here,
    # and identical outputs mean the argument isn't reaching the fold
    jitted = pA._plan_jit[(2, True)]
    x2, _ = jitted(params, key, pts, start, goal, jnp.float32(2.0))
    x6, _ = jitted(params, key, pts, start, goal, jnp.float32(6.0))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xA), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x6), np.asarray(xB), atol=1e-6)


@pytest.mark.slow
def test_controller_api_replays_episode():
    """begin_episode + controller_step (the deployment surface: observed
    pursuer per tick) reproduces the jitted episode scan when fed the same
    pursuer trajectory."""
    from ramp_tpu.scenes.dynamics import pursuit_step

    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               max_iterations=3, points_per_obstacle=8,
                               dtype="float32")
    p = DynamicPlanner(cfg)
    params = p.init_params(jax.random.PRNGKey(0), n_obstacles=4, n_points=8)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    apf_pts = pts.reshape(-1, 2)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    pursuer = jnp.asarray([0.0, 0.8])

    result = p.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                           start, goal, pursuer, n_samples=3)

    state, high_plan = p.begin_episode(params, jax.random.PRNGKey(2), pts,
                                       start, goal, n_samples=3)
    np.testing.assert_allclose(np.asarray(high_plan),
                               np.asarray(result.high_plan), atol=1e-5)
    h = cfg.horizon
    for k in range(int(result.n_steps)):
        # reproduce the eval harness's simulated pursuer as the "observation"
        row = min(k, h - 1)
        evader_now = state.x_best[row, :2]
        pursuer = pursuit_step(jnp.asarray(k), pursuer, evader_now,
                               cfg.pursuit)
        state, plan, next_state, reached = p.controller_step(
            params, state, pursuer, pts, apf_pts, goal, n_samples=3)
        np.testing.assert_allclose(np.asarray(pursuer),
                                   np.asarray(result.pursuer_centers[k]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(plan),
                                   np.asarray(result.plans[k]), atol=2e-4)
        if bool(reached):
            break
    assert np.isfinite(np.asarray(state.x_best)).all()


@pytest.mark.slow
def test_dynamic_planner_pursuer_sweep_conditioned():
    """pursuer_sweep_steps > 0: the conditioning row is swept along the
    predicted pursuit path (round 3). The episode must run end-to-end, and
    the swept fold must differ from the unswept one (same weights/key)."""
    kwargs = dict(horizon=12, n_diffusion_steps=10, unet_input_dim=8,
                  unet_dim_mults_option=0, ddim_steps_high=5,
                  ddim_steps_low=2, max_iterations=3, points_per_obstacle=8,
                  dtype="float32")
    p_sw = DynamicPlanner(DynamicPlannerConfig(
        pursuer_conditioned=True, pursuer_sweep_steps=8, **kwargs))
    p_pc = DynamicPlanner(DynamicPlannerConfig(
        pursuer_conditioned=True, **kwargs))
    params = p_sw.init_params(jax.random.PRNGKey(0), n_obstacles=5,
                              n_points=8)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, ks)])
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 2),
                             minval=-0.8, maxval=0.8)
    apf_pts = pts.reshape(-1, 2)
    start = jnp.asarray([-0.8, -0.8, 0.0, 0.0])
    goal = jnp.asarray([0.8, 0.8, 0.0, 0.0])
    pursuer = jnp.asarray([0.0, 0.8])
    res = p_sw.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                           start, goal, pursuer, n_samples=3)
    assert res.plans.shape == (3, 12, 4)
    assert np.isfinite(np.asarray(res.plans)).all()
    base = p_pc.run_episode(params, jax.random.PRNGKey(2), pts, apf_pts,
                            start, goal, pursuer, n_samples=3)
    assert not np.allclose(np.asarray(res.high_plan),
                           np.asarray(base.high_plan))
