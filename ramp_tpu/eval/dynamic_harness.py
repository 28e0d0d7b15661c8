"""Dynamic (pursuit-evasion) evaluation harness — parity with
`scripts/inference/inference_dynamic.py` (DynamicInference :23,
run_multiple_experiments :276) and `core/metrics.py:128-171`.

The whole closed-loop episode runs inside one jitted scan on device
(`ramp_tpu.planners.dynamic`); the harness only draws contexts, unpacks the
fixed-length episode buffers to their valid prefix, scores, and aggregates.
"""
from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.eval.metrics import dynamic_episode_metrics
from ramp_tpu.eval.harness import ContextManager, sample_context
from ramp_tpu.planners.dynamic import DynamicPlanner, EpisodeResult
from ramp_tpu.scenes.pointclouds import generate_box_points_np


def episode_chains(result: EpisodeResult) -> Dict[str, np.ndarray]:
    """Extract the valid-step prefix: executed evader states (`chain_start`)
    and pursuer centers (`chain_obs`), ref inference_dynamic.py:212-228."""
    valid = np.asarray(result.valid)
    n = int(valid.sum())
    return {
        "chain_start": np.asarray(result.evader_states)[:n, :2],
        "chain_obs": np.asarray(result.pursuer_centers)[:n],
        "plans": np.asarray(result.plans)[:n],
        "n_steps": n,
    }


def static_collision_of_path(path_xy: np.ndarray, box_centers: np.ndarray,
                             box_sizes: np.ndarray) -> bool:
    """Did the executed path enter any static box? (ref metrics :136-145)."""
    if len(path_xy) == 0:
        return False
    sizes = np.asarray(box_sizes)
    if sizes.ndim == 1:
        sizes = np.repeat(sizes[:, None], 2, axis=-1)
    lower = np.asarray(box_centers) - sizes / 2
    upper = np.asarray(box_centers) + sizes / 2
    inside = np.all((path_xy[:, None, :] >= lower[None]) &
                    (path_xy[:, None, :] <= upper[None]), axis=-1)
    return bool(inside.any())


class DynamicEvalHarness:
    def __init__(self, planner: DynamicPlanner, params,
                 goal_safe_threshold: float = 0.25,  # ref base_config.py:118
                 points_per_obstacle: int = 64):
        self.planner = planner
        self.params = params
        self.goal_safe_threshold = goal_safe_threshold
        self.points_per_obstacle = points_per_obstacle

    def run_episode(self, key, obstacle_points, box_centers, box_sizes,
                    context: Dict, n_samples: int = 35) -> Dict:
        """One closed-loop episode + scoring. Static APF points come from the
        first 4 boxes (ref diffusion_model_dynamic.py:516-517)."""
        rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
        # APF-variant clouds (ref APFhelper_dynamic.py:41-60): boundary
        # count in [2P/3, P] and element-wise edge weights — distinct from
        # the dataset/env variant's [P/2, 2P/3] + tiled weights
        apf_pts = np.concatenate([
            generate_box_points_np(c, s, self.points_per_obstacle, rng=rng,
                                   boundary_lo_frac=2.0 / 3.0,
                                   boundary_hi_frac=1.0,
                                   elementwise_edge_weights=True)
            for c, s in zip(np.asarray(box_centers)[:4], np.asarray(box_sizes)[:4])
        ]).astype(np.float32)

        t0 = time.perf_counter()
        result = self.planner.run_episode(
            self.params, key,
            jnp.asarray(obstacle_points), jnp.asarray(apf_pts),
            jnp.asarray(context["start"], jnp.float32),
            jnp.asarray(context["goal"], jnp.float32),
            jnp.asarray(context["pursuer"], jnp.float32),
            n_samples=n_samples)
        result = jax.block_until_ready(result)
        t_episode = time.perf_counter() - t0

        chains = episode_chains(result)
        chain_start = np.concatenate([
            np.asarray(context["start"])[None, :2], chains["chain_start"]])
        static_col = static_collision_of_path(chains["chain_start"],
                                              box_centers, box_sizes)
        metrics = dynamic_episode_metrics(
            chain_start, chains["chain_obs"],
            np.asarray(context["goal"])[:2], self.goal_safe_threshold,
            static_col, self.planner.config.pursuer_radius)
        metrics["t_episode_s"] = t_episode
        metrics["n_steps"] = chains["n_steps"]
        metrics["t_per_replan_s"] = (t_episode / max(chains["n_steps"], 1))
        return {"metrics": metrics, "chains": chains, "context": context}

    def run_multiple_experiments(self, obstacle_points, box_centers, box_sizes,
                                 n_contexts: int = 10, n_experiments: int = 3,
                                 n_samples: int = 35, seed: int = 0,
                                 results_path: Optional[str] = None,
                                 context_dir: Optional[str] = None) -> Dict:
        """contexts x experiments grid (ref inference_dynamic.py:276-393)."""
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        ctx_mgr = ContextManager(context_dir) if context_dir else None

        rows: List[Dict] = []
        for c in range(n_contexts):
            if ctx_mgr is not None:
                context = ctx_mgr.load(c)
                if context is None:
                    context = self._draw_context(rng, box_centers, box_sizes)
                    ctx_mgr.save(c, context)
            else:
                context = self._draw_context(rng, box_centers, box_sizes)
            for _ in range(n_experiments):
                key, k = jax.random.split(key)
                out = self.run_episode(k, obstacle_points, box_centers,
                                       box_sizes, context, n_samples)
                rows.append(out["metrics"])

        pl = [r["path_length"] for r in rows if r["path_length"] is not None]
        # rows hold n_experiments consecutive episodes per context, and
        # repeats on one context share its geometry/start/goal — the CI's
        # independent unit is the context (see stats.cluster_means).
        from ramp_tpu.eval.stats import (ci_fields, cluster_means, mean_ci95,
                                         rate_ci95)
        agg = {
            "capture_rate": float(np.mean([r["captured"] for r in rows])),
            **ci_fields("capture_rate",
                        rate_ci95([r["captured"] for r in rows],
                                  cluster_size=n_experiments)),
            "goal_success_rate": float(np.mean([r["goal_reached"] for r in rows])),
            **ci_fields("goal_success_rate",
                        rate_ci95([r["goal_reached"] for r in rows],
                                  cluster_size=n_experiments)),
            "score": float(np.mean([r["score"] for r in rows])),
            **ci_fields("score", mean_ci95(
                cluster_means([r["score"] for r in rows], n_experiments),
                bounds=(0.0, 1.0))),
            "path_length_mean": float(np.mean(pl)) if pl else None,
            "t_per_replan_p50_s": float(np.median([r["t_per_replan_s"] for r in rows])),
            "n_contexts": n_contexts,
            "n_experiments": n_experiments,
            "n_samples": n_samples,
        }
        results = {"aggregate": agg, "episodes": rows}
        if results_path:
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2, default=float)
        return results

    def _draw_context(self, rng, box_centers, box_sizes) -> Dict:
        ctx = sample_context(rng, box_centers, box_sizes)
        # pursuer starts in free space away from the evader's start
        from ramp_tpu.data.generator import sample_free_point
        for _ in range(100):
            p = sample_free_point(box_centers, box_sizes, rng)
            if np.linalg.norm(p - ctx["start"][:2]) > 0.5:
                break
        ctx["pursuer"] = p.astype(np.float32)
        return ctx
