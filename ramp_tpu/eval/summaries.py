"""Mid-training sampling summaries.

Working equivalent of the reference's (stale, disabled) wandb summary
(`mpd/summaries/summary_trajectory_generation.py:30-97`: sample 25
trajectories from the EMA model, log fraction-free / collision-intensity /
success). The returned callable plugs into `Trainer.fit(summary_fn=...)` and
merges its metrics into the training JSONL log.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.eval.metrics import (
    compute_collision_intensity, trajectory_success_and_metrics,
)


def make_sampling_summary(planner, obstacle_points: np.ndarray,
                          box_centers: np.ndarray, box_sizes: np.ndarray,
                          start: np.ndarray, goal: np.ndarray,
                          normalizer=None, n_samples: int = 25,
                          seed: int = 0) -> Callable[[object, int], Dict]:
    """Build a summary_fn sampling the EMA params on one fixed scene.

    start/goal are in UNNORMALIZED coordinates when a normalizer is given
    (normalized otherwise). n_samples=25 matches the reference summary.
    """
    obstacle_points = jnp.asarray(obstacle_points)
    if normalizer is not None:
        start_n = jnp.asarray(np.asarray(normalizer.normalize(start)), jnp.float32)
        goal_n = jnp.asarray(np.asarray(normalizer.normalize(goal)), jnp.float32)
    else:
        start_n = jnp.asarray(start, jnp.float32)
        goal_n = jnp.asarray(goal, jnp.float32)

    def summary_fn(state, step: int) -> Dict:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        trajs_n, _ = planner.plan(state.ema_params, key, obstacle_points,
                                  start_n, goal_n, n_samples=n_samples,
                                  return_chain=False)
        trajs = np.asarray(normalizer.unnormalize(trajs_n)) if normalizer is not None \
            else np.asarray(trajs_n)
        ci = np.asarray(compute_collision_intensity(trajs, box_centers, box_sizes))
        m = trajectory_success_and_metrics(trajs, ci)
        return {
            "summary/success": m["success"],
            "summary/collision_intensity": m["collision_intensity"],
            "summary/fraction_free": float((ci == 0).mean()),
            "summary/path_length": m["path_length"],
        }

    return summary_fn
