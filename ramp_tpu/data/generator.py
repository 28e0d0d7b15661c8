"""Synthetic dataset generator (MPD directory layout).

The reference repo ships NO dataset — training expects pre-generated
directories of collision-free demonstration trajectories (SURVEY.md §2,
`trajectories.py:114-175`). This module generates compatible data from
scratch so the full train -> eval loop runs end-to-end:

  * scenes drawn from the environment samplers (`ramp_tpu.scenes.envs`,
    matched to EnvSimple2dquant / EnvHard2dquant / EnvPredator / EnvSmall3D
    layouts)
  * obstacle point clouds with the reference generators' distributions
    (`ramp_tpu.scenes.pointclouds`)
  * collision-free trajectories from a classical pipeline: grid A* over the
    box occupancy (with a safety margin), shortcutting, Chaikin smoothing,
    arc-length resampling to H waypoints, finite-difference velocities —
    the same role the (absent) expert planner data plays for the reference.

Files are written as `.npy` twins of the reference names plus metadata.yaml,
which `ramp_tpu.data.dataset` reads directly (and which mirrors what the
reference's torch loader expects structurally).
"""
from __future__ import annotations

import heapq
import os
from typing import Dict, Optional

import numpy as np

from ramp_tpu.scenes.envs import ENV_SAMPLERS
from ramp_tpu.scenes.pointclouds import scene_obstacle_points_np

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


# ------------------------------------------------------------ classical plan

def _occupancy_grid(box_centers, box_sizes, n_cells: int = 64,
                    margin: float = 0.05) -> np.ndarray:
    """Boolean [n, n] occupancy of inflated boxes over [-1, 1]^2."""
    xs = np.linspace(-1, 1, n_cells)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    occ = np.zeros((n_cells, n_cells), bool)
    for c, s in zip(box_centers, box_sizes):
        half = np.asarray(s) / 2 + margin
        occ |= (np.abs(gx - c[0]) <= half[0]) & (np.abs(gy - c[1]) <= half[1])
    return occ


def _astar(occ: np.ndarray, start_cell, goal_cell) -> Optional[np.ndarray]:
    """8-connected A* over the occupancy grid; returns cell path or None."""
    n = occ.shape[0]
    start_cell, goal_cell = tuple(start_cell), tuple(goal_cell)
    if occ[start_cell] or occ[goal_cell]:
        return None
    moves = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if dx or dy]
    heur = lambda c: np.hypot(c[0] - goal_cell[0], c[1] - goal_cell[1])
    open_q = [(heur(start_cell), 0.0, start_cell)]
    came: Dict = {start_cell: None}
    g = {start_cell: 0.0}
    while open_q:
        _, gc, cur = heapq.heappop(open_q)
        if cur == goal_cell:
            path = []
            while cur is not None:
                path.append(cur)
                cur = came[cur]
            return np.asarray(path[::-1])
        if gc > g.get(cur, np.inf):
            continue
        for dx, dy in moves:
            nxt = (cur[0] + dx, cur[1] + dy)
            if not (0 <= nxt[0] < n and 0 <= nxt[1] < n) or occ[nxt]:
                continue
            ng = gc + np.hypot(dx, dy)
            if ng < g.get(nxt, np.inf):
                g[nxt] = ng
                came[nxt] = cur
                heapq.heappush(open_q, (ng + heur(nxt), ng, nxt))
    return None


def _segment_free(occ: np.ndarray, a: np.ndarray, b: np.ndarray) -> bool:
    n = occ.shape[0]
    steps = max(2, int(np.linalg.norm(b - a) * n))
    pts = a[None] + np.linspace(0, 1, steps)[:, None] * (b - a)[None]
    cells = np.clip(((pts + 1) / 2 * (n - 1)).round().astype(int), 0, n - 1)
    return not occ[cells[:, 0], cells[:, 1]].any()


def _shortcut(path_xy: np.ndarray, occ: np.ndarray,
              rng: np.random.Generator, iters: int = 60) -> np.ndarray:
    path = list(path_xy)
    for _ in range(iters):
        if len(path) <= 2:
            break
        i, j = sorted(rng.integers(0, len(path), 2))
        if j - i < 2:
            continue
        if _segment_free(occ, path[i], path[j]):
            path = path[:i + 1] + path[j:]
    return np.asarray(path)


def _chaikin(path: np.ndarray, iters: int = 3) -> np.ndarray:
    for _ in range(iters):
        if len(path) < 3:
            break
        q = 0.75 * path[:-1] + 0.25 * path[1:]
        r = 0.25 * path[:-1] + 0.75 * path[1:]
        mid = np.empty((2 * (len(path) - 1), path.shape[1]))
        mid[0::2], mid[1::2] = q, r
        path = np.concatenate([path[:1], mid, path[-1:]])
    return path


def _resample(path: np.ndarray, horizon: int) -> np.ndarray:
    """Uniform arc-length resampling to `horizon` waypoints."""
    seg = np.linalg.norm(np.diff(path, axis=0), axis=-1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = max(s[-1], 1e-9)
    targets = np.linspace(0, total, horizon)
    out = np.empty((horizon, path.shape[1]))
    for k in range(path.shape[1]):
        out[:, k] = np.interp(targets, s, path[:, k])
    return out


def plan_trajectory(box_centers, box_sizes, start_xy, goal_xy, horizon: int,
                    rng: np.random.Generator, dt: float = 0.1,
                    grid: int = 64, margin: float = 0.05,
                    use_native: bool = True) -> Optional[np.ndarray]:
    """One collision-free [H, 4] trajectory (xy + finite-difference vel).

    Uses the C++ core (`native/astar.cpp`, ~100x faster A*) when the shared
    library builds/loads; this Python pipeline is the reference fallback.
    """
    if use_native:
        from ramp_tpu.data import native
        if native.available():
            occ8 = native.occupancy_grid_native(box_centers, box_sizes, grid,
                                                margin)
            return native.plan_trajectory_native(
                occ8, np.asarray(start_xy), np.asarray(goal_xy), horizon,
                seed=int(rng.integers(0, 2**63 - 1)), dt=dt)
    occ = _occupancy_grid(box_centers, box_sizes, grid, margin)
    to_cell = lambda p: tuple(np.clip(((np.asarray(p) + 1) / 2 * (grid - 1)).round().astype(int), 0, grid - 1))
    cells = _astar(occ, to_cell(start_xy), to_cell(goal_xy))
    if cells is None:
        return None
    xy = cells / (grid - 1) * 2 - 1
    xy[0], xy[-1] = start_xy, goal_xy
    xy = _shortcut(xy, occ, rng)
    xy = _chaikin(xy)
    xy = _resample(xy, horizon)
    xy[0], xy[-1] = start_xy, goal_xy
    vel = np.gradient(xy, dt, axis=0)
    vel[0] = vel[-1] = 0.0  # endpoint rest, matching hard conds
    return np.concatenate([xy, vel], axis=-1).astype(np.float32)


def sample_free_point(box_centers, box_sizes, rng: np.random.Generator,
                      margin: float = 0.08, limit: float = 0.92) -> np.ndarray:
    for _ in range(500):
        p = rng.uniform(-limit, limit, size=2)
        half = np.asarray(box_sizes) / 2 + margin
        inside = np.all(np.abs(p - np.asarray(box_centers)) <= half, axis=-1)
        if not inside.any():
            return p.astype(np.float32)
    raise RuntimeError("no free space found")


def plan_trajectory_via(box_centers, box_sizes, start_xy, goal_xy,
                        horizon: int, rng: np.random.Generator,
                        dt: float = 0.1) -> Optional[np.ndarray]:
    """Plan through a random free via-point off the straight line.

    Shortest-path data is unimodal per (start, goal): A* always picks the
    same homotopy class, which trains the diffusion model into deterministic
    low-diversity sampling. Routing half the demonstrations through a random
    detour point restores the route multimodality the score model needs.
    """
    for _ in range(20):
        via = sample_free_point(box_centers, box_sizes, rng)
        seg = np.asarray(goal_xy) - np.asarray(start_xy)
        seg_len = np.linalg.norm(seg)
        # perpendicular distance from the straight line; want a real detour
        t = np.clip(np.dot(via - start_xy, seg) / (seg_len ** 2 + 1e-9), 0, 1)
        off_line = np.linalg.norm(via - (start_xy + t * seg))
        if 0.25 < off_line < 0.8 and 0.2 < t < 0.8:
            break
    else:
        return None
    half1 = plan_trajectory(box_centers, box_sizes, start_xy, via, horizon, rng, dt)
    half2 = plan_trajectory(box_centers, box_sizes, via, goal_xy, horizon, rng, dt)
    if half1 is None or half2 is None:
        return None
    xy = np.concatenate([half1[:, :2], half2[1:, :2]])
    xy = _chaikin(xy, iters=1)
    xy = _resample(xy, horizon)
    xy[0], xy[-1] = start_xy, goal_xy
    vel = np.gradient(xy, dt, axis=0)
    vel[0] = vel[-1] = 0.0
    return np.concatenate([xy, vel], axis=-1).astype(np.float32)


def plan_trajectories_for_scene(box_centers, box_sizes, n_trajs: int,
                                horizon: int, rng: np.random.Generator,
                                max_attempts_factor: int = 8,
                                via_fraction: float = 0.5) -> np.ndarray:
    trajs = []
    attempts = 0
    while len(trajs) < n_trajs and attempts < n_trajs * max_attempts_factor:
        attempts += 1
        start = sample_free_point(box_centers, box_sizes, rng)
        goal = sample_free_point(box_centers, box_sizes, rng)
        if np.linalg.norm(goal - start) < 0.7:
            continue
        if rng.uniform() < via_fraction:
            traj = plan_trajectory_via(box_centers, box_sizes, start, goal,
                                       horizon, rng)
            if traj is None:
                traj = plan_trajectory(box_centers, box_sizes, start, goal,
                                       horizon, rng)
        else:
            traj = plan_trajectory(box_centers, box_sizes, start, goal,
                                   horizon, rng)
        if traj is not None:
            trajs.append(traj)
    if not trajs:
        raise RuntimeError("could not plan any trajectory for the scene")
    n_planned = len(trajs)
    while len(trajs) < n_trajs:  # pad by cycling the planned set (cluttered scene)
        trajs.append(trajs[len(trajs) % n_planned])
    return np.stack(trajs[:n_trajs])


# ---------------------------------------------------------------- generator

def generate_dataset(out_dir: str, env_id: str = "EnvSimple2dquant",
                     n_tasks: int = 8, n_trajs_per_task: int = 16,
                     horizon: int = 64, points_per_obstacle: int = 64,
                     seed: int = 0, static: bool = True) -> str:
    """Write an MPD-layout dataset; returns out_dir."""
    rng = np.random.default_rng(seed)
    sampler = ENV_SAMPLERS[env_id]
    os.makedirs(out_dir, exist_ok=True)
    for task_id in range(n_tasks):
        task_dir = os.path.join(out_dir, str(task_id))
        os.makedirs(task_dir, exist_ok=True)
        centers, sizes = sampler(rng)
        trajs = plan_trajectories_for_scene(centers, sizes, n_trajs_per_task,
                                            horizon, rng)
        points = scene_obstacle_points_np(centers, sizes, points_per_obstacle,
                                          rng=rng)
        np.save(os.path.join(task_dir, "trajs-free.npy"), trajs)
        if static:
            np.save(os.path.join(task_dir, "obstacle_points.npy"), points)
            np.save(os.path.join(task_dir, "box_centers.npy"), centers)
        else:
            np.save(os.path.join(task_dir, "obstacle_pointsORG.npy"), points)
            config = np.asarray(
                [{"type": "box", "center": c, "size": s}
                 for c, s in zip(centers, sizes)], dtype=object)
            np.save(os.path.join(task_dir, "obstacle_config.npy"), config,
                    allow_pickle=True)
        metadata = {
            "env_id": env_id,
            "robot_id": "RobotPointMass",
            "box_sizes": np.asarray(sizes).tolist(),
            "box_centers": np.asarray(centers).tolist(),
            "horizon": horizon,
            "n_trajectories": int(trajs.shape[0]),
        }
        with open(os.path.join(task_dir, "metadata.yaml"), "w") as f:
            yaml.safe_dump(metadata, f)
    return out_dir


# ------------------------------------------ pursuer-aware predator variant

def _sample_pursuer_position(box_centers, box_sizes, rng: np.random.Generator,
                             inflate: float, central_bias: float = 0.6,
                             limit: float = 0.85) -> Optional[np.ndarray]:
    """A free-space pursuer position, biased toward the scene center.

    Central positions intersect more start->goal routes, so more of the
    demonstrations actually have to detour around the pursuer — that
    detour is the training signal for pursuer conditioning."""
    for _ in range(300):
        if rng.uniform() < central_bias:
            p = rng.normal(scale=0.35, size=2)
            if np.abs(p).max() > limit:
                continue
        else:
            p = rng.uniform(-limit, limit, size=2)
        half = np.asarray(box_sizes) / 2 + inflate
        if np.all(np.abs(p - np.asarray(box_centers)) <= half,
                  axis=-1).any():
            continue
        return p.astype(np.float32)
    return None


def generate_dataset_predator(out_dir: str, n_tasks: int = 384,
                              n_trajs_per_task: int = 16, horizon: int = 48,
                              points_per_obstacle: int = 64, seed: int = 0,
                              n_boxes: int = 4, pursuer_radius: float = 0.1,
                              pursuer_margin: float = 0.15,
                              env_id: str = "EnvPredator",
                              sweep_steps: int = 0,
                              sweep_jitter: bool = False) -> str:
    """Pursuer-aware EnvPredator dataset (static MPD layout + 1 extra row).

    The round-1 dynamic model was trained on A*-planned paths around the
    static boxes only — it never saw a pursuer, so every evasive behavior
    had to come from the closed-loop APF. Here each task is (boxes +
    one pursuer position); the demonstrations are planned around the boxes
    AND a pursuer disc inflated by `pursuer_margin` (the margin stands in
    for the pursuer's future motion), and the obstacle cloud gets one
    extra row: the pursuer sphere cloud (`generate_sphere_points_np`, the
    same golden-angle distribution the jitted replanner regenerates at the
    live pursuer position each control step). Training on [n_boxes+1]-row
    clouds teaches the score model to route around the last row — at
    inference that row tracks the real pursuer (DynamicPlannerConfig
    .pursuer_conditioned).

    `n_boxes=8` + env_id="EnvPredatorObstacles" produces the obstacle-rich
    pursuit variant (ref deps/.../EnvPredatorExtra.py:13).

    `sweep_steps=K` (round 3, predictive conditioning): each task's pursuer
    additionally carries a random threat direction; the conditioning row
    becomes a cloud SWEPT K pursuit-steps along that direction
    (`generate_swept_sphere_points_np` — the inference twin sweeps toward
    the live evader, `DynamicPlannerConfig.pursuer_sweep_steps`), and the
    demonstrations are planned around the whole swept capsule. Training on
    oriented capsules teaches the model to avoid where the pursuer is
    HEADED, not just where it is.

    Known train/inference distribution mismatch: training capsules here are
    always full K-step length, while the inference twin
    (`pursuit_sweep_vector`) caps the pursuit component at the live
    pursuer-evader distance — so close-range inference capsules are shorter
    than anything in the training distribution. `sweep_jitter=True`
    randomizes each scene's sweep magnitude uniformly over [0, K] steps so
    the model also sees short capsules (off by default to preserve the
    round-3 flagship recipe exactly).
    """
    from ramp_tpu.scenes.pointclouds import (generate_sphere_points_np,
                                             generate_swept_sphere_points_np)
    from ramp_tpu.scenes.dynamics import PursuitParams

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    inflate = pursuer_radius + pursuer_margin
    box_range = (0.2, 0.35) if n_boxes <= 4 else (0.15, 0.3)
    pp = PursuitParams()
    step_len = pp.velocity_max / np.sqrt(2.0) * pp.dt
    from ramp_tpu.scenes.envs import _sample_boxes
    for task_id in range(n_tasks):
        task_dir = os.path.join(out_dir, str(task_id))
        os.makedirs(task_dir, exist_ok=True)
        while True:
            centers, sizes = _sample_boxes(rng, n_boxes, box_range)
            pursuer = _sample_pursuer_position(centers, sizes, rng, inflate)
            if pursuer is not None:
                break
        sweep_vec = np.zeros(2, np.float32)
        eff_steps = 0.0
        if sweep_steps > 0:
            theta = rng.uniform(0, 2 * np.pi)
            u = np.array([np.cos(theta), np.sin(theta)], np.float32)
            eff_steps = (rng.uniform(0.0, sweep_steps) if sweep_jitter
                         else float(sweep_steps))
            # same closed form as pursuit_sweep_vector: jitter shortens only
            # the PURSUIT component (the inference twin caps that component
            # at the live pursuer-evader distance, dynamics.py:75-80, while
            # its +y drift always keeps the full K steps — so must ours, or
            # short training capsules differ in composition from close-range
            # inference capsules)
            sweep_vec = (pp.pursuit_strength * u * eff_steps
                         + pp.random_strength * np.array([0.0, 1.0])
                         * float(sweep_steps)) * step_len
        # plan around boxes + the inflated pursuer treated as a square box
        # (with sweep: a chain of squares covering the swept capsule)
        n_sweep_boxes = 1 if sweep_steps <= 0 else 3
        fracs = np.linspace(0.0, 1.0, n_sweep_boxes)
        centers_aug = np.concatenate(
            [centers] + [pursuer[None] + f * sweep_vec[None] for f in fracs],
            axis=0)
        sizes_aug = np.concatenate(
            [sizes, np.full((n_sweep_boxes, 2), 2 * inflate, np.float32)],
            axis=0)
        trajs = []
        attempts = 0
        while len(trajs) < n_trajs_per_task and \
                attempts < n_trajs_per_task * 10:
            attempts += 1
            try:
                start = sample_free_point(centers_aug, sizes_aug, rng)
                goal = sample_free_point(centers_aug, sizes_aug, rng)
            except RuntimeError:
                break
            if np.linalg.norm(goal - start) < 0.7:
                continue
            if rng.uniform() < 0.5:
                traj = plan_trajectory_via(centers_aug, sizes_aug, start,
                                           goal, horizon, rng)
                if traj is None:
                    traj = plan_trajectory(centers_aug, sizes_aug, start,
                                           goal, horizon, rng)
            else:
                traj = plan_trajectory(centers_aug, sizes_aug, start, goal,
                                       horizon, rng)
            if traj is not None:
                trajs.append(traj)
        if not trajs:
            raise RuntimeError(f"predator scene {task_id} unplannable")
        n_planned = len(trajs)
        while len(trajs) < n_trajs_per_task:
            trajs.append(trajs[len(trajs) % n_planned])
        trajs = np.stack(trajs[:n_trajs_per_task])

        box_points = scene_obstacle_points_np(centers, sizes,
                                              points_per_obstacle, rng=rng)
        if sweep_steps > 0:
            pursuer_points = generate_swept_sphere_points_np(
                pursuer, sweep_vec, pursuer_radius, points_per_obstacle,
                rng=rng)
        else:
            pursuer_points = generate_sphere_points_np(
                pursuer, pursuer_radius, points_per_obstacle, rng=rng)
        points = np.concatenate(
            [box_points, np.asarray(pursuer_points)[None].astype(np.float32)],
            axis=0)
        np.save(os.path.join(task_dir, "trajs-free.npy"), trajs)
        np.save(os.path.join(task_dir, "obstacle_points.npy"),
                points.astype(np.float32))
        np.save(os.path.join(task_dir, "box_centers.npy"), centers)
        metadata = {
            "env_id": env_id,
            "robot_id": "RobotPointMass",
            "box_sizes": np.asarray(sizes).tolist(),
            "box_centers": np.asarray(centers).tolist(),
            "pursuer_center": pursuer.tolist(),
            "pursuer_radius": float(pursuer_radius),
            "pursuer_sweep": np.asarray(sweep_vec).tolist(),
            "pursuer_sweep_steps": int(sweep_steps),
            # the effective (possibly jittered) pursuit length actually used
            # for this scene — reconstructing the capsule from the nominal
            # steps alone would be wrong whenever jitter shrank it
            "pursuer_sweep_steps_effective": float(eff_steps),
            "pursuer_sweep_jitter": bool(sweep_jitter),
            "horizon": horizon,
            "n_trajectories": int(trajs.shape[0]),
        }
        with open(os.path.join(task_dir, "metadata.yaml"), "w") as f:
            yaml.safe_dump(metadata, f)
    return out_dir


# ------------------------------------------------------------- 3-D variant

def _occupancy_grid_3d(box_centers, box_sizes, sphere_centers, sphere_radii,
                       n_cells: int = 32, margin: float = 0.05) -> np.ndarray:
    xs = np.linspace(-1, 1, n_cells)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    g = np.stack([gx, gy, gz], axis=-1)
    occ = np.zeros((n_cells,) * 3, bool)
    for c, s in zip(np.asarray(box_centers), np.asarray(box_sizes)):
        half = s / 2 + margin
        occ |= np.all(np.abs(g - c) <= half, axis=-1)
    for c, r in zip(np.asarray(sphere_centers), np.asarray(sphere_radii)):
        occ |= np.linalg.norm(g - c, axis=-1) <= (r + margin)
    return occ


def _astar_3d(occ: np.ndarray, start_cell, goal_cell) -> Optional[np.ndarray]:
    """26-connected A* over a 3-D occupancy grid."""
    n = occ.shape[0]
    start_cell, goal_cell = tuple(start_cell), tuple(goal_cell)
    if occ[start_cell] or occ[goal_cell]:
        return None
    moves = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1) if dx or dy or dz]
    heur = lambda c: np.linalg.norm(np.subtract(c, goal_cell))
    open_q = [(heur(start_cell), 0.0, start_cell)]
    came: Dict = {start_cell: None}
    g = {start_cell: 0.0}
    while open_q:
        _, gc, cur = heapq.heappop(open_q)
        if cur == goal_cell:
            path = []
            while cur is not None:
                path.append(cur)
                cur = came[cur]
            return np.asarray(path[::-1])
        if gc > g.get(cur, np.inf):
            continue
        for m in moves:
            nxt = (cur[0] + m[0], cur[1] + m[1], cur[2] + m[2])
            if not all(0 <= v < n for v in nxt) or occ[nxt]:
                continue
            ng = gc + np.linalg.norm(m)
            if ng < g.get(nxt, np.inf):
                g[nxt] = ng
                came[nxt] = cur
                heapq.heappush(open_q, (ng + heur(nxt), ng, nxt))
    return None


def sample_free_point_3d(occ: np.ndarray, rng: np.random.Generator,
                         limit: float = 0.9) -> np.ndarray:
    n = occ.shape[0]
    for _ in range(1000):
        p = rng.uniform(-limit, limit, size=3)
        cell = tuple(np.clip(((p + 1) / 2 * (n - 1)).round().astype(int), 0, n - 1))
        if not occ[cell]:
            return p.astype(np.float32)
    raise RuntimeError("no free space found in 3-D scene")


def plan_trajectory_3d(occ: np.ndarray, start, goal, horizon: int,
                       dt: float = 0.1) -> Optional[np.ndarray]:
    """[H, 6] collision-free 3-D trajectory (xyz + finite-difference vel)."""
    n = occ.shape[0]
    to_cell = lambda p: tuple(np.clip(((np.asarray(p) + 1) / 2 * (n - 1)).round().astype(int), 0, n - 1))
    cells = _astar_3d(occ, to_cell(start), to_cell(goal))
    if cells is None:
        return None
    xyz = cells / (n - 1) * 2 - 1
    xyz[0], xyz[-1] = start, goal
    xyz = _chaikin(xyz)
    xyz = _resample(xyz, horizon)
    xyz[0], xyz[-1] = start, goal
    vel = np.gradient(xyz, dt, axis=0)
    vel[0] = vel[-1] = 0.0
    return np.concatenate([xyz, vel], axis=-1).astype(np.float32)


def generate_dataset_3d(out_dir: str, n_tasks: int = 4,
                        n_trajs_per_task: int = 8, horizon: int = 64,
                        points_per_obstacle: int = 128, n_boxes: int = 12,
                        n_spheres: int = 8, seed: int = 0) -> str:
    """EnvSmall3D-layout dataset: boxes + spheres in [-1,1]^3
    (ref EnvParameterized3D, env_3d.py:7; 20+ obstacles)."""
    from ramp_tpu.scenes.envs import sample_env_3d
    from ramp_tpu.scenes.pointclouds import scene_obstacle_points_3d_np

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for task_id in range(n_tasks):
        task_dir = os.path.join(out_dir, str(task_id))
        os.makedirs(task_dir, exist_ok=True)
        while True:
            bc, bs, sc, sr = sample_env_3d(rng, n_boxes=n_boxes,
                                           n_spheres=n_spheres)
            occ = _occupancy_grid_3d(bc, bs, sc, sr)
            if occ.mean() < 0.6:  # keep scenes navigable
                break
        trajs = []
        attempts = 0
        while len(trajs) < n_trajs_per_task and attempts < n_trajs_per_task * 10:
            attempts += 1
            start = sample_free_point_3d(occ, rng)
            goal = sample_free_point_3d(occ, rng)
            if np.linalg.norm(goal - start) < 1.0:
                continue
            tr = plan_trajectory_3d(occ, start, goal, horizon)
            if tr is not None:
                trajs.append(tr)
        if not trajs:
            raise RuntimeError(f"3-D scene {task_id} unplannable")
        n_planned = len(trajs)
        while len(trajs) < n_trajs_per_task:  # pad by cycling the planned set
            trajs.append(trajs[len(trajs) % n_planned])
        trajs = np.stack(trajs[:n_trajs_per_task])
        points = scene_obstacle_points_3d_np(bc, bs, sc, sr,
                                             points_per_obstacle, rng=rng)
        np.save(os.path.join(task_dir, "trajs-free.npy"), trajs)
        np.save(os.path.join(task_dir, "obstacle_points.npy"), points)
        np.save(os.path.join(task_dir, "box_centers.npy"), bc)
        metadata = {
            "env_id": "EnvSmall3D",
            "robot_id": "RobotPointMass3D",
            "box_sizes": bs.tolist(),
            "box_centers": bc.tolist(),
            "sphere_centers": sc.tolist(),
            "sphere_radii": sr.tolist(),
            "horizon": horizon,
            "n_trajectories": int(trajs.shape[0]),
        }
        with open(os.path.join(task_dir, "metadata.yaml"), "w") as f:
            yaml.safe_dump(metadata, f)
    return out_dir
