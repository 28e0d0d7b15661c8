"""Planning service — the deployment/serving surface over the static planner.

The reference has no serving layer (its closest artifact is the vendored,
never-imported ZMQ robot interface, `deps/storm/.../zmq_robot_interface.py`);
its planners only run inside offline eval scripts. For a TPU-hosted planner
the natural production shape is one warm process per chip: compile once at
startup, keep parameters resident in HBM, serialize device calls behind a
lock (one chip = one executor), and serve JSON over HTTP from host threads.

Request/response contract (POST /plan):
    {"obstacle_points": [O][P][d],      # world coords, same layout as training
     "start": [state_dim], "goal": [state_dim],   # world coords
     "n_samples": int?,                 # default from the service
     "seed": int?,                      # per-request determinism
     "box_centers": [[..]]?, "box_sizes": [[..]]?,  # optional: adds metrics
     "sphere_centers": [[..]]?, "sphere_radii": [..]?}  # 3-D family only

The point/workspace dimensionality d is fixed per service (2 for the static
2-D planner, 3 for the 3-D planner — `scripts/serve.py --family`).
->  {"trajectories": [N][H][state_dim], # world coords
     "t_plan_ms": float,   # dispatch+compute+fetch (excludes lock wait)
     "t_queue_ms": float,  # time spent queued behind other requests
     "t_dispatch_ms"/"t_fetch_ms"/"t_serialize_ms": float,  # decomposition
     "n_samples": N,
     "success": 0/1?, "collision_intensity": %?, "best": int?}  # if geometry

Pass "response_format": "b64" to receive the trajectories as raw
little-endian float32 (`trajectories_b64` + `trajectories_shape`) instead
of a JSON float list — ~3x smaller body, no float formatting cost.

GET /healthz -> {"status": "ok", "device": ..., "warm_shapes": [...]}.

Shapes (n_obstacles, n_points, n_samples) are jit specializations: the first
request at a new shape pays a compile; `warm()` pre-pays the expected one.
"""
from __future__ import annotations

import base64
import json
import threading
import time
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.eval.metrics import (
    compute_collision_intensity, compute_collision_intensity_3d,
    path_sanity_mask, trajectory_success_and_metrics,
)


class PlanningService:
    """Thread-safe wrapper: normalize -> jitted plan -> unnormalize (+score)."""

    def __init__(self, planner, params, normalizer,
                 default_n_samples: int = 20, point_dim: int = 2):
        self.planner = planner
        self.point_dim = int(point_dim)  # 2 (static 2-D) or 3 (Planner3D)
        # energy composition: requests carry TWO stacked obstacle sets
        # [2][O][P][d] (ref diffusion_model_static.py:188-216)
        self.compose = bool(getattr(planner.config, "compose", False))
        self.params = params
        self.normalizer = normalizer
        self.default_n_samples = default_n_samples
        self._device_lock = threading.Lock()
        self._counter = 0
        self._warm_shapes: set = set()
        self._world_jit: Dict[int, object] = {}

    def _world_plan_fn(self, n_samples: int):
        """Jitted plan with the trajectory unnormalization FUSED on device.

        The round-4 serving bench measured /plan at 140.9 ms p50 against an
        in-process 51.4 ms single call: the old path paid the ~24 ms tunnel
        round-trip three times per request — `block_until_ready` (sync), a
        separate jnp `unnormalize` dispatch, then `np.asarray` (fetch).
        Fusing unnormalize into the jitted computation makes a request
        exactly one dispatch + one fetch; the fetch itself blocks, so no
        separate sync is needed."""
        if n_samples not in self._world_jit:
            inner = partial(self.planner._plan, n_samples=n_samples,
                            return_chain=False)
            norm = self.normalizer

            def f(params, key, pts, start_n, goal_n, w):
                trajs_n, _ = inner(params, key, pts, start_n, goal_n, w)
                return norm.unnormalize(trajs_n)

            self._world_jit[n_samples] = jax.jit(f)
        jitted = self._world_jit[n_samples]
        w = self.planner._guide_w()
        return lambda params, key, pts, s, g: jitted(params, key, pts, s, g, w)

    def warm(self, n_obstacles: int, n_points: int,
             n_samples: Optional[int] = None) -> float:
        """Pre-compile for an expected request shape; returns seconds spent."""
        n_samples = n_samples or self.default_n_samples
        shape = ((2, n_obstacles, n_points, self.point_dim) if self.compose
                 else (n_obstacles, n_points, self.point_dim))
        pts = np.zeros(shape, np.float32)
        sd = self.planner.config.state_dim
        t0 = time.perf_counter()
        self.plan(pts, np.zeros(sd, np.float32), np.zeros(sd, np.float32),
                  n_samples=n_samples, seed=0)
        return time.perf_counter() - t0

    def plan(self, obstacle_points, start, goal,
             n_samples: Optional[int] = None, seed: Optional[int] = None,
             box_centers=None, box_sizes=None,
             sphere_centers=None, sphere_radii=None) -> Dict:
        n_samples = int(n_samples or self.default_n_samples)
        pts = np.asarray(obstacle_points, np.float32)
        sd = self.planner.config.state_dim
        start = np.asarray(start, np.float32)
        goal = np.asarray(goal, np.float32)
        if start.shape != (sd,) or goal.shape != (sd,):
            raise ValueError(f"start/goal must have shape ({sd},), got "
                             f"{start.shape}/{goal.shape}")
        if self.compose:
            if pts.ndim != 4 or pts.shape[0] != 2 or pts.shape[-1] != self.point_dim:
                raise ValueError(
                    f"compose service expects two stacked obstacle sets "
                    f"[2, O, P, {self.point_dim}], got {pts.shape}")
        elif pts.ndim != 3 or pts.shape[-1] != self.point_dim:
            raise ValueError(f"obstacle_points must be [O, P, "
                             f"{self.point_dim}], got {pts.shape}")

        start_n = np.asarray(self.normalizer.normalize(start), np.float32)
        goal_n = np.asarray(self.normalizer.normalize(goal), np.float32)
        plan_fn = self._world_plan_fn(n_samples)

        # Dispatch under the lock (one chip executes in enqueue order), but
        # FETCH OUTSIDE it: the host round-trip of request k then overlaps
        # request k+1's dispatch, so concurrent callers see marginal-latency
        # throughput (~25 ms/replan) instead of serializing the ~27 ms
        # tunnel RTT into every call (measured: scripts/bench_serve.py).
        # t_plan_ms = dispatch+compute+fetch (the fetch blocks, so this is
        # comparable to the old dispatch+compute+sync definition);
        # t_queue_ms = time spent waiting for the device lock.
        t0 = time.perf_counter()
        with self._device_lock:
            t1 = time.perf_counter()
            if seed is None:
                seed = self._counter
            self._counter += 1
            key = jax.random.PRNGKey(int(seed))
            trajs_dev = plan_fn(self.params, key, jnp.asarray(pts),
                                jnp.asarray(start_n), jnp.asarray(goal_n))
        t2 = time.perf_counter()
        # single host<->device round trip: np.asarray on the async device
        # value blocks until done AND copies out — world-coord trajectories,
        # unnormalized on device by the fused plan (see _world_plan_fn)
        trajs = np.asarray(trajs_dev)
        t3 = time.perf_counter()
        self._warm_shapes.add(tuple(pts.shape[:-1]) + (n_samples,))

        out = {"trajectories": trajs,
               "t_plan_ms": round((t3 - t1) * 1e3, 3),
               "t_queue_ms": round((t1 - t0) * 1e3, 3),
               "t_dispatch_ms": round((t2 - t1) * 1e3, 3),
               "t_fetch_ms": round((t3 - t2) * 1e3, 3),
               "n_samples": n_samples}
        if box_centers is not None and box_sizes is not None:
            if self.point_dim == 3:
                ci = np.asarray(compute_collision_intensity_3d(
                    trajs, np.asarray(box_centers), np.asarray(box_sizes),
                    sphere_centers, sphere_radii))
            else:
                ci = np.asarray(compute_collision_intensity(
                    trajs, np.asarray(box_centers), np.asarray(box_sizes)))
            m = trajectory_success_and_metrics(trajs, ci,
                                               pos_dim=self.point_dim)
            out["success"] = m["success"]
            out["collision_intensity"] = m["collision_intensity"]
            # best = shortest sane collision-free trajectory, consistent with
            # the gated success field; else least-colliding of all samples
            sane = path_sanity_mask(trajs, pos_dim=self.point_dim)
            free = np.where((ci <= 0.01) & sane)[0]
            if len(free):
                lens = np.linalg.norm(
                    np.diff(trajs[free, :, :self.point_dim], axis=1),
                    axis=-1).sum(axis=1)
                out["best"] = int(free[np.argmin(lens)])
            else:
                out["best"] = int(np.argmin(ci))
        return out

    def health(self) -> Dict:
        return {"status": "ok",
                "device": str(jax.devices()[0]),
                "warm_shapes": sorted(self._warm_shapes),
                "requests_served": self._counter}


class UnknownEpisode(KeyError):
    """Raised for an episode_id with no live session (HTTP 404)."""


class ControllerService:
    """Closed-loop pursuit-evasion episodes over HTTP — the deployment
    surface for `DynamicPlanner.begin_episode`/`controller_step` (one
    STAGE-II replan per observed pursuer position).

    Contract — start/goal in world coordinates (normalized like training
    hard-conditions); obstacle/APF points and the observed pursuer position
    in the dataset frame, exactly as the closed-loop engine and the
    reference consume them (they are never normalized there; for the
    predator dataset the frames coincide, limits ~[-1,1]):
      POST /episode/begin {"obstacle_points": [O][P][2],
                           "start": [D], "goal": [D],
                           "apf_points": [M][2]?,   # default: flattened clouds
                           "seed": int?, "n_samples": int?,
                           "pursuer": [2]?}  # REQUIRED if pursuer-conditioned
        -> {"episode_id", "high_plan": [H][D]}
      POST /episode/step  {"episode_id", "pursuer": [2]}  # observed position
        -> {"plan": [H][D], "next_state": [D], "reached": 0/1, "step": k}
      POST /episode/end   {"episode_id"} -> {"ended": true}

    Scene latents are encoded once per episode at begin() and reused each
    tick. The device lock serializes chip work AND guards the session map:
    concurrent steps on one episode execute in order, each from the
    previous step's state.
    """

    MAX_SESSIONS = 64

    def __init__(self, planner, params, normalizer,
                 default_n_samples: int = 35):
        self.planner = planner
        self.params = params
        self.normalizer = normalizer
        self.default_n_samples = default_n_samples
        self._device_lock = threading.Lock()
        self._sessions: Dict[str, Dict] = {}
        self._counter = 0
        # unnormalization fused into single jitted postprocess calls so each
        # HTTP tick pays one dispatch + one fetch instead of a sync plus a
        # separate unnormalize dispatch/fetch per returned array (the round-4
        # bench measured that at 152 ms/step vs ~25 ms in-process)
        self._post_step = jax.jit(lambda plan, ns: (
            normalizer.unnormalize(plan), normalizer.unnormalize(ns)))
        self._post_plan = jax.jit(normalizer.unnormalize)

    def begin(self, obstacle_points, start, goal, apf_points=None,
              seed: Optional[int] = None,
              n_samples: Optional[int] = None, pursuer=None) -> Dict:
        n_samples = int(n_samples or self.default_n_samples)
        pts = np.asarray(obstacle_points, np.float32)
        if pts.ndim != 3 or pts.shape[-1] != 2:
            raise ValueError(f"obstacle_points must be [O, P, 2], got {pts.shape}")
        sd = self.planner.config.state_dim
        start = np.asarray(start, np.float32)
        goal = np.asarray(goal, np.float32)
        if start.shape != (sd,) or goal.shape != (sd,):
            raise ValueError(f"start/goal must have shape ({sd},), got "
                             f"{start.shape}/{goal.shape}")
        start_n = jnp.asarray(self.normalizer.normalize(start), jnp.float32)
        goal_n = jnp.asarray(self.normalizer.normalize(goal), jnp.float32)
        apf = (np.asarray(apf_points, np.float32).reshape(-1, 2)
               if apf_points is not None else pts.reshape(-1, 2))

        with self._device_lock:
            eid = f"ep{self._counter}"
            if seed is None:
                seed = self._counter
            self._counter += 1
            key = jax.random.PRNGKey(int(seed))
            pts_dev = jnp.asarray(pts)
            conditioned = self.planner.config.pursuer_conditioned
            if conditioned and pursuer is None:
                raise ValueError(
                    "this server runs a pursuer-conditioned planner: "
                    "/episode/begin requires an initial 'pursuer' [2]")
            p_init = (jnp.asarray(np.asarray(pursuer, np.float32))
                      if pursuer is not None else None)
            state, high_plan = self.planner.begin_episode(
                self.params, key, pts_dev, start_n, goal_n,
                n_samples=n_samples, pursuer_init=p_init)
            # the conditioning cloud changes with the observed pursuer every
            # tick, so the hoisted scene latent only applies unconditioned
            latents = (None if conditioned
                       else self.planner.encode_scene(self.params, pts_dev))
            high_plan_w = self._post_plan(high_plan)
            # evict finished sessions first, then the oldest, to stay bounded
            if len(self._sessions) >= self.MAX_SESSIONS:
                done = [k for k, s in self._sessions.items()
                        if bool(s["state"].done)]
                victim = done[0] if done else next(iter(self._sessions))
                del self._sessions[victim]
            self._sessions[eid] = {
                "state": state, "obstacle_pts": pts_dev,
                "latents": latents,
                "apf_pts": jnp.asarray(apf), "goal": goal_n,
                "n_samples": n_samples,
            }
        # fetch outside the lock: blocks until the episode-begin computation
        # (and the fused unnormalize) finishes, one round trip
        return {"episode_id": eid,
                "high_plan": np.asarray(high_plan_w).tolist()}

    def step(self, episode_id: str, pursuer) -> Dict:
        pursuer = jnp.asarray(np.asarray(pursuer, np.float32))
        with self._device_lock:
            sess = self._sessions.get(episode_id)
            if sess is None:
                raise UnknownEpisode(episode_id)
            prev_state = sess["state"]
            state, plan, next_state, reached = self.planner.controller_step(
                self.params, prev_state, pursuer, sess["obstacle_pts"],
                sess["apf_pts"], sess["goal"], n_samples=sess["n_samples"],
                scene_latents=sess["latents"])
            # the new state is an ASYNC value: storing it un-synced keeps the
            # device busy; the next step's dispatch chains on it in HBM, and
            # only this response's fetch below pays the host round-trip
            sess["state"] = state
            # fused world-coord postprocess dispatched while still async
            plan_w, next_w = self._post_step(plan, next_state)
        try:
            # one fetch for everything the response needs (incl. the scalar
            # `reached`/`step` — int() on a device scalar would be its own
            # round trip): blocks until the whole step and the fused
            # unnormalize finish — no separate sync round trip
            plan_np, next_np, reached, step_no = jax.device_get(
                (plan_w, next_w, reached, state.step))
        except Exception:
            # the async computation failed on device: roll the session back
            # to the pre-step state so a transient failure doesn't wedge the
            # episode — unless a concurrent step already advanced past us
            with self._device_lock:
                cur = self._sessions.get(episode_id)
                if cur is not None and cur["state"] is state:
                    cur["state"] = prev_state
            raise
        return {"plan": np.asarray(plan_np).tolist(),
                "next_state": np.asarray(next_np).tolist(),
                "reached": int(bool(reached)),
                "step": int(step_no)}

    def end(self, episode_id: str) -> Dict:
        with self._device_lock:
            if self._sessions.pop(episode_id, None) is None:
                raise UnknownEpisode(episode_id)
        return {"ended": True}

    def health(self) -> Dict:
        return {"status": "ok", "device": str(jax.devices()[0]),
                "open_episodes": len(self._sessions),
                "episodes_started": self._counter}


def _make_handler(service, controller: Optional[ControllerService] = None):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet; service logs are JSONL
            pass

        def do_GET(self):
            if self.path == "/healthz":
                h = (service or controller).health()
                if service is not None and controller is not None:
                    h.update(controller.health())
                self._send(200, h)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": f"bad JSON: {e}"})
                return
            try:
                if self.path == "/plan" and service is not None:
                    out = service.plan(
                        req["obstacle_points"], req["start"], req["goal"],
                        n_samples=req.get("n_samples"), seed=req.get("seed"),
                        box_centers=req.get("box_centers"),
                        box_sizes=req.get("box_sizes"),
                        sphere_centers=req.get("sphere_centers"),
                        sphere_radii=req.get("sphere_radii"))
                    ts = time.perf_counter()
                    arr = np.asarray(out["trajectories"], np.float32)
                    if req.get("response_format") == "b64":
                        # raw little-endian float32 — ~1/3 the bytes of the
                        # JSON float list and no number formatting on either
                        # side; decode with np.frombuffer(...).reshape(shape)
                        out["trajectories_b64"] = base64.b64encode(
                            arr.tobytes()).decode("ascii")
                        out["trajectories_shape"] = list(arr.shape)
                        out["trajectories_dtype"] = "float32"
                        del out["trajectories"]
                    else:
                        out["trajectories"] = arr.tolist()
                    out["t_serialize_ms"] = round(
                        (time.perf_counter() - ts) * 1e3, 3)
                elif self.path == "/episode/begin" and controller is not None:
                    out = controller.begin(
                        req["obstacle_points"], req["start"], req["goal"],
                        apf_points=req.get("apf_points"),
                        seed=req.get("seed"), n_samples=req.get("n_samples"),
                        pursuer=req.get("pursuer"))
                elif self.path == "/episode/step" and controller is not None:
                    out = controller.step(req["episode_id"], req["pursuer"])
                elif self.path == "/episode/end" and controller is not None:
                    out = controller.end(req["episode_id"])
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
            except UnknownEpisode as e:
                self._send(404, {"error": f"unknown episode {e}"})
                return
            except KeyError as e:
                self._send(400, {"error": f"missing field {e}"})
                return
            except ValueError as e:
                self._send(400, {"error": str(e)})
                return
            self._send(200, out)

    return Handler


def make_http_server(service, host: str = "127.0.0.1",
                     port: int = 8000,
                     controller: Optional[ControllerService] = None
                     ) -> ThreadingHTTPServer:
    """Threaded HTTP server; device calls serialize on the service locks.
    `service` handles /plan (may be None); `controller` handles /episode/*."""
    return ThreadingHTTPServer((host, port), _make_handler(service, controller))
