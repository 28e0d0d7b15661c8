#!/usr/bin/env python
"""Static 2-D evaluation — parity with `scripts/inference/inference_static.py`.

  python scripts/inference_static.py --dataset dataset/EnvSimple2dquant \
      --checkpoints checkpoints/simple2d --n-contexts 20 --n-samples 20
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import numpy as np

from ramp_tpu.data.dataset import TrajectoryDataset
from ramp_tpu.eval.harness import StaticEvalHarness
from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
from ramp_tpu.utils.checkpoints import load_planner_params


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--n-contexts", type=int, default=20)
    p.add_argument("--n-samples", type=int, default=20)
    p.add_argument("--max-envs", type=int, default=None)
    p.add_argument("--compose", action="store_true")
    p.add_argument("--use-apf", action="store_true")
    p.add_argument("--apf-backend", default="xla", choices=["xla", "pallas"],
                   help="APF kernel: compiler-fused XLA or the hand-fused "
                        "Pallas TPU kernel (guidance/apf_pallas.py)")
    p.add_argument("--results", default="eval_results_static.json")
    p.add_argument("--context-dir", default=None)
    p.add_argument("--plots-dir", default=None)
    p.add_argument("--ddim-steps", type=int, default=None,
                   help="override the DDIM inference step count "
                        "(default: reference parity — 5, or 8 for compose+APF)")
    p.add_argument("--cfg-weight", type=float, default=None,
                   help="override the classifier-free guidance weight "
                        "(default: reference parity w=2)")
    p.add_argument("--preset", default=None,
                   choices=["parity", "quality", "fast"],
                   help="measured knob presets (ramp_tpu/presets.py): "
                        "quality = DDIM-5 w=5 (best success, same latency); "
                        "fast = DDIM-3 w=3 (~40%% lower latency); explicit "
                        "knobs override")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="override the JAX backend (e.g. cpu for debugging)")
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    from ramp_tpu.guidance.apf import APFParams
    from ramp_tpu.presets import resolve_static_preset
    ddim_steps, cfg_weight = resolve_static_preset(
        args.preset, args.ddim_steps, args.cfg_weight)
    overrides = {}
    if ddim_steps is not None:
        overrides["ddim_steps_override"] = ddim_steps
    if cfg_weight is not None:
        overrides["cfg_weight"] = cfg_weight
        overrides["compose_weights"] = (cfg_weight, cfg_weight)
    cfg = StaticPlannerConfig(horizon=dataset.horizon,
                              state_dim=dataset.state_dim,
                              unet_input_dim=args.unet_dim,
                              unet_dim_mults_option=args.dim_mults_option,
                              compose=args.compose, use_apf=args.use_apf,
                              apf=APFParams(backend=args.apf_backend),
                              **overrides)
    planner = StaticPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 seed=args.seed)

    harness = StaticEvalHarness(planner, params, normalizer=dataset.normalizer)
    results = harness.run_full_evaluation(
        dataset, n_contexts=args.n_contexts, n_samples=args.n_samples,
        seed=args.seed, results_path=args.results,
        context_dir=args.context_dir, max_tasks=args.max_envs)
    agg = results["aggregate"]
    print(json.dumps(agg, indent=2))
    print(f"results written to {args.results}")

    if args.plots_dir:
        os.makedirs(args.plots_dir, exist_ok=True)
        from ramp_tpu.eval.visualization import save_static_plot
        from ramp_tpu.eval.harness import sample_context
        rng = np.random.default_rng(args.seed)
        for tid in list(results["per_env"])[:4]:
            idx = int(dataset.map_task_id_to_trajectories_id[int(tid)][0])
            ctx = sample_context(rng, dataset.box_centers[idx],
                                 dataset.box_sizes[idx])
            key = jax.random.PRNGKey(args.seed + int(tid))
            out = harness.run_context(key, dataset.obstacle_points[idx],
                                      dataset.box_centers[idx],
                                      dataset.box_sizes[idx], ctx,
                                      n_samples=args.n_samples)
            save_static_plot(os.path.join(args.plots_dir, f"env{tid}.png"),
                             out["trajs"], dataset.box_centers[idx],
                             dataset.box_sizes[idx],
                             dataset.obstacle_points[idx],
                             start=ctx["start"], goal=ctx["goal"])
        print(f"plots written to {args.plots_dir}")


if __name__ == "__main__":
    main()
