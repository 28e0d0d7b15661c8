#!/usr/bin/env python
"""Dynamic pursuit-evasion evaluation — parity with
`scripts/inference/inference_dynamic.py`.

  python scripts/inference_dynamic.py --dataset dataset/EnvPredator \
      --checkpoints checkpoints/predator --n-contexts 10 --n-experiments 3
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import numpy as np

from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.eval.dynamic_harness import DynamicEvalHarness
from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--n-contexts", type=int, default=10)
    p.add_argument("--n-experiments", type=int, default=3)
    p.add_argument("--n-samples", type=int, default=35)
    p.add_argument("--results", default="eval_results_dynamic.json")
    p.add_argument("--context-dir", default=None)
    p.add_argument("--gif-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="override the JAX backend (e.g. cpu for debugging)")
    p.add_argument("--ddpm", action="store_true",
                   help="use the DDPM p_sample_loop closed-loop variant "
                        "(ref diffusion_model_dynamic.py:216-331) instead of DDIM")
    p.add_argument("--ddim-steps-high", type=int, default=None,
                   help="STAGE-I plan DDIM steps (default: reference parity 10)")
    p.add_argument("--ddim-steps-low", type=int, default=None,
                   help="STAGE-II refine DDIM steps (default: reference parity 5)")
    p.add_argument("--cfg-weight", type=float, default=None,
                   help="CFG weight (default: reference parity w=2.5)")
    p.add_argument("--preset", default=None,
                   choices=["parity", "quality", "fast"],
                   help="measured knob presets (ramp_tpu/presets.py); "
                        "fast = 3 STAGE-II refine steps (paper-scale score "
                        "0.654 ~ parity at -25%% p50); explicit knobs win")
    p.add_argument("--pursuer-conditioned", action="store_true",
                   help="condition the score model on the live pursuer "
                        "cloud (beyond-parity; requires weights trained on "
                        "a --pursuer-aware dataset). The dataset's own "
                        "pursuer row, if present, is dropped from the "
                        "static scene — the planner appends the live one.")
    p.add_argument("--pursuer-sweep-steps", type=int, default=None,
                   help="with --pursuer-conditioned: the conditioning row "
                        "is swept K predicted pursuit-steps toward the "
                        "evader (requires weights trained with "
                        "generate_dataset_predator(sweep_steps=K))")
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    overrides = {}
    if args.ddim_steps_high is not None:
        overrides["ddim_steps_high"] = args.ddim_steps_high
    from ramp_tpu.presets import resolve_dynamic_preset
    cfg_weight, ddim_steps_low = resolve_dynamic_preset(
        args.preset, args.cfg_weight, args.ddim_steps_low)
    if cfg_weight is not None:
        overrides["cfg_weight"] = cfg_weight
    if ddim_steps_low is not None:
        overrides["ddim_steps_low"] = ddim_steps_low
    if args.pursuer_conditioned:
        overrides["pursuer_conditioned"] = True
    if args.pursuer_sweep_steps is not None:
        overrides["pursuer_sweep_steps"] = args.pursuer_sweep_steps
    cfg = DynamicPlannerConfig(horizon=dataset.horizon,
                               state_dim=dataset.state_dim,
                               unet_input_dim=args.unet_dim,
                               unet_dim_mults_option=args.dim_mults_option,
                               use_ddim=not args.ddpm, **overrides)
    planner = DynamicPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]

    from ramp_tpu.utils.checkpoints import load_planner_params
    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 seed=args.seed)

    idx = 0
    scene_points = dataset.obstacle_points[idx]
    if args.pursuer_conditioned:
        # a pursuer-aware dataset carries the training pursuer as the last
        # cloud row; the static scene is the box rows only — the planner
        # appends the LIVE pursuer cloud each control step
        n_boxes = len(dataset.box_centers[idx])
        scene_points = scene_points[:n_boxes]
    harness = DynamicEvalHarness(planner, params)
    results = harness.run_multiple_experiments(
        scene_points, dataset.box_centers[idx],
        dataset.box_sizes[idx],
        n_contexts=args.n_contexts, n_experiments=args.n_experiments,
        n_samples=args.n_samples, seed=args.seed,
        results_path=args.results, context_dir=args.context_dir)
    print(json.dumps(results["aggregate"], indent=2))
    print(f"results written to {args.results}")

    if args.gif_dir:
        os.makedirs(args.gif_dir, exist_ok=True)
        from ramp_tpu.eval.visualization import save_dynamic_gif
        rng = np.random.default_rng(args.seed)
        ctx = harness._draw_context(rng, dataset.box_centers[idx],
                                    dataset.box_sizes[idx])
        out = harness.run_episode(jax.random.PRNGKey(args.seed),
                                  scene_points,
                                  dataset.box_centers[idx],
                                  dataset.box_sizes[idx], ctx,
                                  n_samples=args.n_samples)
        save_dynamic_gif(os.path.join(args.gif_dir, "episode.gif"),
                         out["chains"], dataset.box_centers[idx],
                         dataset.box_sizes[idx], ctx["goal"][:2],
                         pursuer_radius=cfg.pursuer_radius)
        print(f"gif written to {args.gif_dir}/episode.gif")


if __name__ == "__main__":
    main()
