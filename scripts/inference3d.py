#!/usr/bin/env python
"""3-D evaluation — parity with `scripts/inference/inference3d.py`:
DDPM ancestral sampling (T=25), CFG w=5.75, optional two-set energy
composition, single start/goal demos.

  python scripts/inference3d.py --dataset dataset/EnvSmall3D \
      --checkpoints checkpoints/maze3d
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import jax.numpy as jnp
import numpy as np

from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig
from ramp_tpu.utils.checkpoints import load_planner_params
from ramp_tpu.utils.timer import Timer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--compose-dataset", default=None,
                   help="second obstacle-set dir for energy composition "
                        "(ref inference3d.py:49-79)")
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--n-samples", type=int, default=1)
    p.add_argument("--results", default="eval_results_3d.json")
    p.add_argument("--plots-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="override the JAX backend (e.g. cpu for debugging)")
    p.add_argument("--cfg-weight", type=float, default=None,
                   help="override the CFG / composition weight (default: "
                        "reference parity w=5.75, compose w1=w2=5)")
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    compose = args.compose_dataset is not None
    overrides = {}
    if args.cfg_weight is not None:
        overrides["cfg_weight"] = args.cfg_weight
        overrides["compose_weights"] = (args.cfg_weight, args.cfg_weight)
    cfg = Planner3DConfig(horizon=dataset.horizon, state_dim=dataset.state_dim,
                          unet_input_dim=args.unet_dim,
                          unet_dim_mults_option=args.dim_mults_option,
                          compose=compose, **overrides)
    planner = Planner3D(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 seed=args.seed)

    idx = 0
    obstacle_pts = dataset.obstacle_points[idx]
    if compose:
        other = TrajectoryDataset(args.compose_dataset, include_velocity=True)
        obstacle_pts = np.stack([obstacle_pts, other.obstacle_points[0]])

    hc = dataset.hard_conds(idx)
    start = jnp.asarray(hc["start"], jnp.float32)
    goal = jnp.asarray(hc["goal"], jnp.float32)

    key = jax.random.PRNGKey(args.seed)
    # warmup/compile then timed run (ref torch.compile+warmup inference3d.py:122)
    x, _ = planner.plan(params, key, jnp.asarray(obstacle_pts), start, goal,
                        n_samples=args.n_samples, return_chain=False)
    jax.block_until_ready(x)
    with Timer() as t:
        x, _ = planner.plan(params, jax.random.split(key)[0],
                            jnp.asarray(obstacle_pts), start, goal,
                            n_samples=args.n_samples, return_chain=False)
        jax.block_until_ready(x)

    trajs = np.asarray(dataset.normalizer.unnormalize(x))

    from ramp_tpu.eval.metrics import (compute_collision_intensity_3d,
                                       compute_path_length_3d)
    # idx is a trajectory index; idx=0 belongs to task 0, whose metadata
    # carries THIS scene's sphere geometry (dataset.metadata would be the
    # last task's and mix scenes)
    meta = dataset.task_metadata[0]
    box_centers = np.asarray(dataset.box_centers[idx])
    box_sizes = np.asarray(dataset.box_sizes[idx])
    sph_c = meta.get("sphere_centers")
    sph_r = meta.get("sphere_radii")
    if compose:
        # a composed plan must clear the union of both obstacle sets
        om = other.task_metadata[0]
        box_centers = np.concatenate([box_centers,
                                      np.asarray(other.box_centers[0])])
        box_sizes = np.concatenate([box_sizes,
                                    np.asarray(other.box_sizes[0])])
        if om.get("sphere_centers") is not None:
            sph_c = (np.concatenate([np.asarray(sph_c),
                                     np.asarray(om["sphere_centers"])])
                     if sph_c is not None else om["sphere_centers"])
            sph_r = (np.concatenate([np.asarray(sph_r).reshape(-1),
                                     np.asarray(om["sphere_radii"]).reshape(-1)])
                     if sph_r is not None else om["sphere_radii"])
    ci = np.asarray(compute_collision_intensity_3d(
        trajs, box_centers, box_sizes, sph_c, sph_r))
    free = ci <= 0.01
    pl = np.asarray(compute_path_length_3d(trajs[free])) if free.any() else None
    result = {"t_sampling_s": t.elapsed, "n_samples": args.n_samples,
              "compose": compose,
              "goal_error": float(np.linalg.norm(
                  trajs[0, -1, :3] - np.asarray(
                      dataset.normalizer.unnormalize(goal))[:3])),
              "collision_intensity_pct": float(ci.mean() * 100),
              "success": int(free.any()),
              "n_free_trajectories": int(free.sum()),
              "path_length_mean": float(pl.mean()) if pl is not None else None}
    with open(args.results, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))

    if args.plots_dir:
        os.makedirs(args.plots_dir, exist_ok=True)
        from ramp_tpu.eval.visualization import save_3d_plot
        meta = dataset.task_metadata[0]
        save_3d_plot(os.path.join(args.plots_dir, "plan3d.png"), trajs,
                     dataset.box_centers[idx], dataset.box_sizes[idx],
                     sphere_centers=meta.get("sphere_centers"),
                     sphere_radii=meta.get("sphere_radii"),
                     start=np.asarray(dataset.normalizer.unnormalize(start)),
                     goal=np.asarray(dataset.normalizer.unnormalize(goal)))


if __name__ == "__main__":
    main()
