"""Static evaluation harness — metric/JSON parity with
`scripts/inference/inference_static.py` (StaticInference :21,
run_full_evaluation :186) and `scripts/inference/core/utils.py`
(StateGenerator :6, ContextManager :28).

Key TPU-native difference: ONE jit compilation serves every environment and
context — scene point clouds and start/goal are traced arguments — where the
reference rebuilds the dataset+model and re-`torch.compile`s per environment
(`inference_static.py:42-121`). The per-context loop is therefore pure data
movement around a single compiled function.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.core.normalization import LimitsNormalizer
from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.eval.metrics import (
    compute_collision_intensity, trajectory_success_and_metrics,
)
from ramp_tpu.planners.static import StaticPlanner


def sample_context(rng: np.random.Generator, box_centers, box_sizes,
                   min_separation: float = 1.0, margin: float = 0.08) -> Dict:
    """Random free start/goal pair (StateGenerator parity, core/utils.py:6-26):
    positions in free space, velocities zero."""
    from ramp_tpu.data.generator import sample_free_point
    for _ in range(200):
        start = sample_free_point(box_centers, box_sizes, rng, margin=margin)
        goal = sample_free_point(box_centers, box_sizes, rng, margin=margin)
        if np.linalg.norm(goal - start) >= min_separation:
            break
    return {"start": np.concatenate([start, np.zeros(2, np.float32)]),
            "goal": np.concatenate([goal, np.zeros(2, np.float32)])}


def sample_free_scene_point_3d(rng: np.random.Generator, box_centers, box_sizes,
                         sphere_centers=None, sphere_radii=None,
                         margin: float = 0.05, bound: float = 0.9,
                         max_tries: int = 2000) -> np.ndarray:
    """Rejection-sample a point outside every box and sphere (3-D analog of
    `sample_context`; used by the 3-D grid eval's extra contexts). Named
    apart from `data.generator.sample_free_point_3d`, which samples on an
    occupancy GRID with a different signature."""
    box_centers = np.asarray(box_centers)
    for _ in range(max_tries):
        pt = rng.uniform(-bound, bound, 3)
        in_box = np.all(np.abs(pt - box_centers) <= np.asarray(box_sizes) / 2
                        + margin, axis=-1).any() if len(box_centers) else False
        in_sph = False
        if sphere_centers is not None and len(np.asarray(sphere_centers)):
            in_sph = (np.linalg.norm(pt - np.asarray(sphere_centers), axis=-1)
                      <= np.asarray(sphere_radii).reshape(-1) + margin).any()
        if not in_box and not in_sph:
            return pt
    raise RuntimeError(f"no free point found in {max_tries} draws")


def compose_split(obstacle_points: np.ndarray,
                  rng: np.random.Generator) -> np.ndarray:
    """Split a 10-obstacle cloud into two equal 6-obstacle sets for energy
    composition: first 6 vs remaining 4 padded with 2 random duplicates
    (ref inference_static.py:68-73)."""
    first = obstacle_points[:6]
    remaining = obstacle_points[6:]
    dup = remaining[rng.permutation(len(remaining))[:6 - len(remaining)]]
    second = np.concatenate([remaining, dup], axis=0)
    return np.stack([first, second])


class ContextManager:
    """Save/load eval contexts as npz (ref core/utils.py:28-79 uses .pt)."""

    def __init__(self, context_dir: str):
        self.context_dir = context_dir
        os.makedirs(context_dir, exist_ok=True)

    def path(self, index: int) -> str:
        return os.path.join(self.context_dir, f"context_{index:03d}.npz")

    def save(self, index: int, context: Dict) -> None:
        np.savez(self.path(index), **context)

    def load(self, index: int) -> Optional[Dict]:
        p = self.path(index)
        if not os.path.exists(p):
            return None
        with np.load(p) as z:
            return {k: z[k] for k in z.files}

    def get_or_create(self, index: int, rng, box_centers, box_sizes) -> Dict:
        ctx = self.load(index)
        if ctx is None:
            ctx = sample_context(rng, box_centers, box_sizes)
            self.save(index, ctx)
        return ctx


class StaticEvalHarness:
    """Evaluate a static planner over envs x contexts; JSON-dump results."""

    def __init__(self, planner: StaticPlanner, params,
                 normalizer: Optional[LimitsNormalizer] = None):
        self.planner = planner
        self.params = params
        # identity in normalized space when no dataset normalizer is supplied
        self.normalizer = normalizer or LimitsNormalizer.fixed(
            planner.config.state_dim)

    def run_context(self, key, obstacle_points: np.ndarray,
                    box_centers: np.ndarray, box_sizes: np.ndarray,
                    context: Dict, n_samples: int = 20) -> Dict:
        """One (env, context) cell: sample, time, score.

        obstacle_points: [O, P, 2] ([2, O, P, 2] when compose=True).
        """
        start_n = np.asarray(self.normalizer.normalize(context["start"]), np.float32)
        goal_n = np.asarray(self.normalizer.normalize(context["goal"]), np.float32)
        plan = self.planner.plan_fn(n_samples, return_chain=False)

        t0 = time.perf_counter()
        trajs_n, _ = plan(self.params, key, jnp.asarray(obstacle_points),
                          jnp.asarray(start_n), jnp.asarray(goal_n))
        trajs_n = jax.block_until_ready(trajs_n)
        t_sampling = time.perf_counter() - t0

        trajs = np.asarray(self.normalizer.unnormalize(trajs_n))
        ci = np.asarray(compute_collision_intensity(trajs, box_centers, box_sizes))
        metrics = trajectory_success_and_metrics(trajs, ci)
        metrics["t_sampling_s"] = t_sampling
        return {"metrics": metrics, "trajs": trajs}

    def run_full_evaluation(self, dataset: TrajectoryDataset,
                            n_contexts: int = 20, n_samples: int = 20,
                            seed: int = 0, results_path: Optional[str] = None,
                            context_dir: Optional[str] = None,
                            max_tasks: Optional[int] = None) -> Dict:
        """Nested env -> context aggregation (ref inference_static.py:186-344)."""
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        ctx_mgr = ContextManager(context_dir) if context_dir else None

        results: Dict = {"per_env": {}, "aggregate": {}}
        all_success, all_ci, all_pl, all_wv, all_t = [], [], [], [], []
        task_ids = list(dataset.map_task_id_to_trajectories_id.keys())
        if max_tasks is not None:
            task_ids = task_ids[:max_tasks]
        # compile outside the timed region (ref inference_static.py:114-121
        # warms up after torch.compile; here ONE compilation serves all envs).
        # In compose mode the planner sees the 6-obstacle split sets, not the
        # raw dataset cloud — warm up with the real call shape.
        n_obs, n_pts = dataset.obstacle_points.shape[-3:-1]
        if self.planner.config.compose:
            n_obs = 6  # compose_split output (ref inference_static.py:68-73)
        self.planner.warmup(self.params, n_obs, n_pts, n_samples=n_samples,
                            return_chain=False)
        for tid in task_ids:
            idx = int(dataset.map_task_id_to_trajectories_id[tid][0])
            obstacle_points = dataset.obstacle_points[idx]
            if self.planner.config.compose:
                obstacle_points = compose_split(obstacle_points, rng)
            box_centers = dataset.box_centers[idx]
            box_sizes = dataset.box_sizes[idx]
            env_rows: List[Dict] = []
            for c in range(n_contexts):
                if ctx_mgr is not None:
                    context = ctx_mgr.get_or_create(
                        tid * n_contexts + c, rng, box_centers, box_sizes)
                else:
                    context = sample_context(rng, box_centers, box_sizes)
                key, k = jax.random.split(key)
                out = self.run_context(k, obstacle_points, box_centers,
                                       box_sizes, context, n_samples)
                m = out["metrics"]
                env_rows.append(m)
                all_success.append(m["success"])
                all_ci.append(m["collision_intensity"])
                all_t.append(m["t_sampling_s"])
                if m["path_length"] is not None:
                    all_pl.append(m["path_length"])
                if m["waypoint_variance"] is not None:
                    all_wv.append(m["waypoint_variance"])
            results["per_env"][str(tid)] = {
                "success_rate": float(np.mean([r["success"] for r in env_rows])),
                "collision_intensity": float(np.mean([r["collision_intensity"] for r in env_rows])),
                "contexts": env_rows,
            }
        from ramp_tpu.eval.stats import ci_fields, wilson_ci
        results["aggregate"] = {
            "success_rate": float(np.mean(all_success)) if all_success else None,
            **ci_fields("success_rate",
                        wilson_ci(int(np.sum(all_success)), len(all_success))),
            "collision_intensity": float(np.mean(all_ci)) if all_ci else None,
            "path_length_mean": float(np.mean(all_pl)) if all_pl else None,
            "path_length_std": float(np.std(all_pl)) if all_pl else None,
            "waypoint_variance_mean": float(np.mean(all_wv)) if all_wv else None,
            "t_sampling_mean_s": float(np.mean(all_t)) if all_t else None,
            "t_sampling_p50_s": float(np.median(all_t)) if all_t else None,
            # round-3 path-sanity gate: how many collision-free samples the
            # gate excluded as wander (0 for honest configs; nonzero values
            # mean "success" would have been inflated without the gate)
            "n_wander_trajectories": int(np.sum(
                [r.get("n_wander_trajectories", 0)
                 for env in results["per_env"].values()
                 for r in env["contexts"]])),
            "n_envs": len(task_ids),
            "n_contexts": n_contexts,
            "n_samples": n_samples,
        }
        if results_path:
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2, default=float)
        return results
