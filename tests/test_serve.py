"""Serving layer: PlanningService request handling + the HTTP surface.

One tiny planner compile is shared by the whole module via a session fixture.
"""
import base64
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from ramp_tpu.core.normalization import LimitsNormalizer
from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
from ramp_tpu.serve import PlanningService, make_http_server

N_OBS, N_PTS, SD = 4, 8, 4


@pytest.fixture(scope="module")
def service():
    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              dtype="float32")
    planner = StaticPlanner(cfg)
    params = planner.init_params(jax.random.PRNGKey(0), N_OBS, N_PTS)
    svc = PlanningService(planner, params, LimitsNormalizer.fixed(SD),
                          default_n_samples=3)
    svc.warm(N_OBS, N_PTS)
    return svc


def _pts():
    return np.random.default_rng(0).uniform(-0.8, 0.8, (N_OBS, N_PTS, 2))


def test_plan_shapes_and_determinism(service):
    out = service.plan(_pts(), [-0.9, -0.9, 0, 0], [0.9, 0.9, 0, 0], seed=7)
    trajs = np.asarray(out["trajectories"])
    assert trajs.shape == (3, 16, SD)
    assert np.isfinite(trajs).all()
    assert out["t_plan_ms"] > 0
    # phase decomposition of the single-round-trip path (serve fix r5):
    # t_plan = dispatch + fetch, and the planner output arrives as a host
    # array (already unnormalized on device by the fused plan)
    assert out["t_dispatch_ms"] >= 0 and out["t_fetch_ms"] >= 0
    assert isinstance(out["trajectories"], np.ndarray)
    # endpoints pinned (unnormalized world coords)
    np.testing.assert_allclose(trajs[:, 0, :2], [[-0.9, -0.9]] * 3, atol=1e-5)
    np.testing.assert_allclose(trajs[:, -1, :2], [[0.9, 0.9]] * 3, atol=1e-5)
    # same seed -> identical plan; different seed -> different plan
    out2 = service.plan(_pts(), [-0.9, -0.9, 0, 0], [0.9, 0.9, 0, 0], seed=7)
    np.testing.assert_array_equal(trajs, np.asarray(out2["trajectories"]))
    out3 = service.plan(_pts(), [-0.9, -0.9, 0, 0], [0.9, 0.9, 0, 0], seed=8)
    assert not np.array_equal(trajs, np.asarray(out3["trajectories"]))


def test_plan_with_geometry_scores(service):
    out = service.plan(_pts(), [-0.9, -0.9, 0, 0], [0.9, 0.9, 0, 0], seed=1,
                       box_centers=[[0.0, 0.0]], box_sizes=[[0.3, 0.3]])
    assert out["success"] in (0, 1)
    assert 0 <= out["best"] < 3
    assert out["collision_intensity"] >= 0


def test_plan_validates_shapes(service):
    with pytest.raises(ValueError, match="start/goal"):
        service.plan(_pts(), [0.0, 0.0], [0.9, 0.9, 0, 0])
    with pytest.raises(ValueError, match="obstacle_points"):
        service.plan(np.zeros((N_OBS, N_PTS, 3)), [0] * SD, [0] * SD)


def test_http_server_end_to_end(service):
    server = make_http_server(service, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert [N_OBS, N_PTS, 3] in [list(s) for s in health["warm_shapes"]]

        req = {"obstacle_points": _pts().tolist(),
               "start": [-0.9, -0.9, 0, 0], "goal": [0.9, 0.9, 0, 0],
               "seed": 3, "box_centers": [[0.0, 0.0]],
               "box_sizes": [[0.3, 0.3]]}
        data = json.dumps(req).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/plan", data=data,
                headers={"Content-Type": "application/json"}),
                timeout=120) as r:
            out = json.loads(r.read())
        assert np.asarray(out["trajectories"]).shape == (3, 16, SD)
        assert "best" in out and "t_plan_ms" in out

        # b64 response format: raw float32 bytes round-trip to the same
        # trajectories the JSON body carries (same seed -> deterministic)
        data_b64 = json.dumps(dict(req, response_format="b64")).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/plan", data=data_b64,
                headers={"Content-Type": "application/json"}),
                timeout=120) as r:
            out_b = json.loads(r.read())
        assert "trajectories" not in out_b
        raw = base64.b64decode(out_b["trajectories_b64"])
        trajs_b = np.frombuffer(raw, np.float32).reshape(
            out_b["trajectories_shape"])
        np.testing.assert_allclose(
            trajs_b, np.asarray(out["trajectories"], np.float32), atol=1e-6)

        # error paths: missing field -> 400; bad path -> 404; bad JSON -> 400
        for body, path, code in ((b"{}", "/plan", 400),
                                 (data, "/nope", 404),
                                 (b"{not json", "/plan", 400)):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}", data=body), timeout=30)
            assert ei.value.code == code
    finally:
        server.shutdown()
        server.server_close()


def test_plan_service_3d_family():
    """`point_dim=3` serves the 3-D planner: [O][P][3] clouds, sphere-aware
    on-server scoring (scripts/serve.py --family 3d)."""
    from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig

    cfg = Planner3DConfig(horizon=16, n_diffusion_steps=8, unet_input_dim=8,
                          unet_dim_mults_option=0, dtype="float32")
    planner = Planner3D(cfg)
    params = planner.init_params(jax.random.PRNGKey(0), 3, 8)
    svc = PlanningService(planner, params, LimitsNormalizer.fixed(6),
                          default_n_samples=2, point_dim=3)

    pts = np.random.default_rng(1).uniform(-0.8, 0.8, (3, 8, 3))
    out = svc.plan(pts, [-0.8, -0.8, -0.8, 0, 0, 0], [0.8, 0.8, 0.8, 0, 0, 0],
                   seed=2, box_centers=[[0.0, 0.0, 0.0]],
                   box_sizes=[[0.3, 0.3, 0.3]],
                   sphere_centers=[[0.5, 0.5, 0.5]], sphere_radii=[0.2])
    trajs = np.asarray(out["trajectories"])
    assert trajs.shape == (2, 16, 6)
    assert np.isfinite(trajs).all()
    assert out["success"] in (0, 1) and 0 <= out["best"] < 2

    # a 2-D cloud must be rejected by the 3-D service
    with pytest.raises(ValueError, match="obstacle_points"):
        svc.plan(np.zeros((3, 8, 2)), [0] * 6, [0] * 6)


@pytest.mark.slow
def test_controller_service_episode_http():
    """Closed-loop episode sessions over HTTP: /episode/begin -> N x
    /episode/step with an observed pursuer -> /episode/end."""
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
    from ramp_tpu.serve import ControllerService

    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               points_per_obstacle=8, dtype="float32")
    planner = DynamicPlanner(cfg)
    params = planner.init_params(jax.random.PRNGKey(0), n_obstacles=4,
                                 n_points=8)
    ctrl = ControllerService(planner, params, LimitsNormalizer.fixed(4),
                             default_n_samples=2)

    server = make_http_server(None, "127.0.0.1", 0, controller=ctrl)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def post(path, payload, timeout=600):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                     data=json.dumps(payload).encode())
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    try:
        pts = np.random.default_rng(2).uniform(-0.8, 0.8, (4, 8, 2)).tolist()
        out = post("/episode/begin", {"obstacle_points": pts,
                                      "start": [-0.8, -0.8, 0, 0],
                                      "goal": [0.8, 0.8, 0, 0], "seed": 4})
        eid = out["episode_id"]
        assert np.asarray(out["high_plan"]).shape == (12, 4)

        for k in range(2):
            s = post("/episode/step", {"episode_id": eid,
                                       "pursuer": [0.0, 0.8]})
            assert np.asarray(s["plan"]).shape == (12, 4)
            assert len(s["next_state"]) == 4
            assert s["step"] == k + 1
            assert s["reached"] in (0, 1)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["open_episodes"] == 1

        assert post("/episode/end", {"episode_id": eid}) == {"ended": True}

        # unknown episode -> 404; missing field -> 400
        for payload, code in (({"episode_id": eid, "pursuer": [0, 0]}, 404),
                              ({"pursuer": [0, 0]}, 400)):
            with pytest.raises(urllib.error.HTTPError) as ei:
                post("/episode/step", payload)
            assert ei.value.code == code
    finally:
        server.shutdown()
        server.server_close()


def test_plan_service_compose():
    """compose=True services take two stacked obstacle sets [2, O, P, 2]
    (scripts/serve.py --compose) and reject single-set clouds."""
    cfg = StaticPlannerConfig(horizon=16, n_diffusion_steps=10,
                              unet_input_dim=8, unet_dim_mults_option=0,
                              compose=True, dtype="float32")
    planner = StaticPlanner(cfg)
    params = planner.init_params(jax.random.PRNGKey(0), N_OBS, N_PTS)
    svc = PlanningService(planner, params, LimitsNormalizer.fixed(SD),
                          default_n_samples=2)
    assert svc.compose

    pts2 = np.stack([_pts(), _pts() + 0.05])
    out = svc.plan(pts2, [-0.9, -0.9, 0, 0], [0.9, 0.9, 0, 0], seed=3)
    assert np.asarray(out["trajectories"]).shape == (2, 16, SD)
    assert (N_OBS, N_PTS, 2) not in svc._warm_shapes  # compose shape recorded
    assert (2, N_OBS, N_PTS, 2) in svc._warm_shapes

    with pytest.raises(ValueError, match="two stacked obstacle sets"):
        svc.plan(_pts(), [0] * SD, [0] * SD)


@pytest.mark.slow
def test_controller_service_pursuer_conditioned():
    """Pursuer-conditioned episode sessions: /episode/begin requires an
    initial pursuer, the hoisted scene-latent cache is disabled, and
    steps re-encode with the observed pursuer row."""
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
    from ramp_tpu.serve import ControllerService

    cfg = DynamicPlannerConfig(horizon=12, n_diffusion_steps=10,
                               unet_input_dim=8, unet_dim_mults_option=0,
                               ddim_steps_high=5, ddim_steps_low=2,
                               points_per_obstacle=8, dtype="float32",
                               pursuer_conditioned=True)
    planner = DynamicPlanner(cfg)
    params = planner.init_params(jax.random.PRNGKey(0), n_obstacles=5,
                                 n_points=8)
    ctrl = ControllerService(planner, params, LimitsNormalizer.fixed(4),
                             default_n_samples=2)

    pts = np.random.default_rng(2).uniform(-0.8, 0.8, (4, 8, 2))
    with pytest.raises(ValueError, match="pursuer"):
        ctrl.begin(pts, [-0.8, -0.8, 0, 0], [0.8, 0.8, 0, 0], seed=1)

    out = ctrl.begin(pts, [-0.8, -0.8, 0, 0], [0.8, 0.8, 0, 0], seed=1,
                     pursuer=[0.0, 0.8])
    eid = out["episode_id"]
    assert np.asarray(out["high_plan"]).shape == (12, 4)
    # conditioned sessions carry no hoisted latent
    assert ctrl._sessions[eid]["latents"] is None

    s = ctrl.step(eid, [0.1, 0.7])
    assert np.asarray(s["plan"]).shape == (12, 4)
    assert s["step"] == 1
    assert ctrl.end(eid) == {"ended": True}
