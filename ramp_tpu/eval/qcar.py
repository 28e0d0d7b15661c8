"""QCar pursuit-evasion episode: non-holonomic closed loop on real controls.

Reproduces the reference's PHYSICAL demo structure (ref README.md:58-86 —
the repo has no code for it): a non-holonomic evader car executes the
dynamic planner's replans through a low-level tracking controller while a
pursuer hunts its ACTUAL position. Unlike the eval harness's point-mass
episodes (where the evader teleports to the next plan row), the car here
is a kinematic bicycle (`ramp_tpu.scenes.vehicles`) — tracking error is
real and feeds back into capture/goal outcomes.

Loop per control tick, exactly the deployment contract of
`DynamicPlanner.begin_episode`/`controller_step`:
  1. observe the pursuer -> one STAGE-II replan -> next waypoint
  2. pure-pursuit substeps drive the bicycle toward the waypoint
  3. the pursuer pursues the car's actual position (dataset dynamics)
Scoring reuses `dynamic_episode_metrics` verbatim on the executed chains,
plus tracking-error diagnostics unique to the non-holonomic layer.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.eval.dynamic_harness import static_collision_of_path
from ramp_tpu.eval.metrics import dynamic_episode_metrics
from ramp_tpu.scenes.dynamics import PursuitParams, pursuit_step
from ramp_tpu.scenes.vehicles import (QCarParams, make_qcar_state,
                                      track_waypoint)


def _episode_summary(chain_exec, chain_obs, plans, sub_xy, tracking_err,
                     high_plan, context, goal, goal_safe_threshold,
                     pursuer_radius) -> Dict:
    """Shared scoring/packaging for both engines (host loop and scan)."""
    start = np.asarray(context["start"], np.float32)
    chain_start = np.concatenate([start[None, :2], chain_exec])
    metrics = dynamic_episode_metrics(
        chain_start, chain_obs, np.asarray(goal)[:2], goal_safe_threshold,
        static_collision_of_path(chain_exec, context["box_centers"],
                                 context["box_sizes"]),
        pursuer_radius)
    metrics["n_steps"] = len(chain_exec)
    metrics["tracking_error_mean"] = float(np.mean(tracking_err))
    metrics["tracking_error_max"] = float(np.max(tracking_err))
    # the fine-grained path can clip corners the tick-level chain misses
    metrics["substep_static_collision"] = bool(static_collision_of_path(
        sub_xy, context["box_centers"], context["box_sizes"]))
    return {
        "metrics": metrics,
        "chains": {"chain_start": chain_start[1:], "chain_obs": chain_obs,
                   "plans": plans, "n_steps": len(chain_exec)},
        "substep_path": sub_xy,
        "high_plan": np.asarray(high_plan),
        "context": context,
    }


def run_qcar_episode_scan(planner, params, obstacle_pts, static_apf_pts,
                          context: Dict, n_samples: int = 35,
                          qcar: QCarParams = QCarParams(),
                          n_substeps: int = 5, finish_ticks: int = 15,
                          goal_safe_threshold: float = 0.25,
                          key: Optional[jax.Array] = None) -> Dict:
    """One closed-loop QCar episode in ONE device dispatch.

    Same episode as `run_qcar_episode` (identical RNG stream, tested
    equivalent) but the whole loop — replans, bicycle substeps, pursuer,
    exits — runs inside `DynamicPlanner.run_vehicle_episode`'s jitted scan,
    so a chip pays one dispatch per EPISODE instead of per tick. The number
    of planner ticks is the config's `max_iterations` (the host engine's
    `max_steps` analog).
    """
    key = jax.random.PRNGKey(0) if key is None else key
    start = jnp.asarray(context["start"], jnp.float32)
    goal = jnp.asarray(context["goal"], jnp.float32)
    res = planner.run_vehicle_episode(
        params, key, jnp.asarray(obstacle_pts, jnp.float32),
        jnp.asarray(static_apf_pts, jnp.float32), start, goal,
        jnp.asarray(context["pursuer"], jnp.float32), n_samples=n_samples,
        qcar=qcar, n_substeps=n_substeps, finish_ticks=finish_ticks,
        goal_safe_threshold=goal_safe_threshold)
    n = max(int(res.n_steps), 1)
    chain_exec = np.asarray(res.car_states)[:n, :2]
    chain_obs = np.asarray(res.pursuer_centers)[:n]
    sub_xy = np.concatenate([
        np.asarray(start)[None, :2],
        np.asarray(res.substeps)[:n].reshape(-1, 2)])
    tracking_err = np.linalg.norm(
        chain_exec - np.asarray(res.targets)[:n], axis=-1)
    return _episode_summary(chain_exec, chain_obs, np.asarray(res.plans)[:n],
                            sub_xy, tracking_err, res.high_plan, context,
                            np.asarray(goal), goal_safe_threshold,
                            planner.config.pursuer_radius)


@lru_cache(maxsize=None)
def _jit_tracker(qcar: QCarParams, n_substeps: int):
    """Per-(params, substeps) jitted tracking tick, shared across episodes
    (a fresh `jax.jit(partial(...))` per episode would re-trace every
    time)."""
    return jax.jit(partial(track_waypoint, p=qcar, n_substeps=n_substeps))


@lru_cache(maxsize=None)
def _jit_chaser(pursuit: PursuitParams):
    return jax.jit(partial(pursuit_step, params=pursuit))


def run_qcar_episode(planner, params, obstacle_pts, static_apf_pts,
                     context: Dict, n_samples: int = 35,
                     qcar: QCarParams = QCarParams(), n_substeps: int = 5,
                     max_steps: int = 60, finish_ticks: int = 15,
                     goal_safe_threshold: float = 0.25,
                     pursuit: Optional[PursuitParams] = None,
                     key: Optional[jax.Array] = None) -> Dict:
    """One closed-loop QCar episode. Returns chains + metrics.

    obstacle_pts: [O, P, 2] encoder clouds; static_apf_pts: [M, 2] APF
    surface points (may cover MORE boxes than the encoder saw — that is
    scenario 2's unseen-obstacle mechanism); context: start/goal ([4])
    and pursuer ([2]) in planner frame. `pursuit` defaults to the
    planner config's dynamics (what the scan engine always uses), so the
    two engines stay episode-equivalent for the same key.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    obstacle_pts = jnp.asarray(obstacle_pts, jnp.float32)
    static_apf_pts = jnp.asarray(static_apf_pts, jnp.float32)
    start = jnp.asarray(context["start"], jnp.float32)
    goal = jnp.asarray(context["goal"], jnp.float32)
    cfg = planner.config

    conditioned = cfg.pursuer_conditioned
    state, high_plan = planner.begin_episode(
        params, key, obstacle_pts, start, goal, n_samples=n_samples,
        pursuer_init=(jnp.asarray(context["pursuer"], jnp.float32)
                      if conditioned else None))
    # the conditioning cloud tracks the pursuer per tick in conditioned
    # mode, so the hoisted latent only applies unconditioned
    scene_latents = (None if conditioned
                     else planner.encode_scene(params, obstacle_pts))

    # face the first leg of the plan, standing still — a real run starts
    # the same way (the car is placed at the start pose by hand)
    first_leg = np.asarray(high_plan)[1, :2] - np.asarray(start)[:2]
    car = make_qcar_state(np.asarray(start)[:2],
                          theta=float(np.arctan2(first_leg[1], first_leg[0])))
    track = _jit_tracker(qcar, n_substeps)
    chase = _jit_chaser(cfg.pursuit if pursuit is None else pursuit)

    pursuer = jnp.asarray(context["pursuer"], jnp.float32)
    capture_threshold = cfg.pursuer_radius + 0.02
    evader_path = []          # car pose per tick (the metric chain)
    pursuer_path = []         # pursuer per tick
    substep_path = [np.asarray(start)[None, :2]]
    plans = []
    tracking_err = []
    for tick in range(max_steps):
        state, plan, next_wp, reached = planner.controller_step(
            params, state, pursuer, obstacle_pts, static_apf_pts, goal,
            n_samples=n_samples, scene_latents=scene_latents)
        car, subpath = track(car, next_wp[:2])
        prev_pursuer = np.asarray(pursuer)
        pursuer = chase(jnp.asarray(tick, jnp.float32), pursuer, car.pose)

        pose = np.asarray(car.pose)
        evader_path.append(pose)
        pursuer_path.append(np.asarray(pursuer))
        substep_path.append(np.asarray(subpath))
        plans.append(np.asarray(plan))
        tracking_err.append(float(np.linalg.norm(
            pose - np.asarray(next_wp)[:2])))

        # capture exit == the METRIC's capture condition (pose at tick t vs
        # pursuer at t-1, first checked at t=2 — `dynamic_episode_metrics`
        # ref DynamicMetrics :140-148), so termination and scoring agree
        if tick >= 1 and float(np.linalg.norm(
                pose - prev_pursuer)) <= capture_threshold:
            break                                    # caught — stop driving
        if bool(reached) or (float(np.linalg.norm(
                pose - np.asarray(goal)[:2])) <= cfg.safe_threshold):
            # Planner done (ref :620-621 goal exit) — but unlike the
            # point-mass harness the car LAGS its plan, so finish the
            # approach: pure pursuit straight at the goal, pursuer still
            # live and capture still possible (the physical run's landing
            # phase).
            goal_xy = jnp.asarray(np.asarray(goal)[:2])
            for extra in range(finish_ticks):
                if float(np.linalg.norm(np.asarray(car.pose) -
                                        np.asarray(goal)[:2])) \
                        <= 0.8 * goal_safe_threshold:
                    break
                car, subpath = track(car, goal_xy)
                prev_pursuer = np.asarray(pursuer)
                pursuer = chase(jnp.asarray(tick + 1 + extra, jnp.float32),
                                pursuer, car.pose)
                pose = np.asarray(car.pose)
                evader_path.append(pose)
                pursuer_path.append(np.asarray(pursuer))
                substep_path.append(np.asarray(subpath))
                # the plan is frozen while landing — emit it per tick so the
                # chains contract (one plan row per executed tick) holds,
                # exactly as the scan engine does
                plans.append(plans[-1])
                tracking_err.append(float(np.linalg.norm(
                    pose - np.asarray(goal)[:2])))
                if float(np.linalg.norm(pose - prev_pursuer)) \
                        <= capture_threshold:
                    break
            break

    return _episode_summary(np.stack(evader_path), np.stack(pursuer_path),
                            np.stack(plans), np.concatenate(substep_path),
                            tracking_err, high_plan, context,
                            np.asarray(goal), goal_safe_threshold,
                            cfg.pursuer_radius)
