#!/usr/bin/env python
"""Generate a synthetic MPD-layout dataset.

The reference repo ships no dataset (SURVEY.md §2); this produces compatible
training/eval data: scenes from the env samplers + classical-planner
collision-free demonstrations.

  python scripts/generate_data.py --out dataset/EnvSimple2dquant \
      --env EnvSimple2dquant --n-tasks 16 --n-trajs 32
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ramp_tpu.data.generator import generate_dataset


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--env", default="EnvSimple2dquant",
                   choices=["EnvSimple2dquant", "EnvHard2dquant", "EnvPredator",
                            "EnvPredatorObstacles", "EnvSmall3D"])
    p.add_argument("--n-tasks", type=int, default=16)
    p.add_argument("--n-trajs", type=int, default=32)
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--points-per-obstacle", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dynamic-layout", action="store_true",
                   help="write obstacle_pointsORG/obstacle_config layout")
    p.add_argument("--pursuer-aware", action="store_true",
                   help="EnvPredator[Obstacles] only: plan demonstrations "
                        "around an inflated pursuer disc and append the "
                        "pursuer sphere cloud as one extra obstacle row "
                        "(for DynamicPlannerConfig.pursuer_conditioned)")
    p.add_argument("--sweep-steps", type=int, default=0,
                   help="with --pursuer-aware: sweep the pursuer row K "
                        "predicted pursuit-steps along a random threat "
                        "direction (predictive conditioning; see "
                        "DynamicPlannerConfig.pursuer_sweep_steps)")
    p.add_argument("--sweep-jitter", action="store_true",
                   help="with --sweep-steps: randomize each scene's sweep "
                        "magnitude over [0, K] steps so the model also sees "
                        "short capsules (the inference twin caps the sweep "
                        "at the live pursuer-evader distance)")
    args = p.parse_args()
    if args.pursuer_aware or args.env == "EnvPredatorObstacles":
        from ramp_tpu.data.generator import generate_dataset_predator
        if not args.env.startswith("EnvPredator"):
            p.error("--pursuer-aware applies to the EnvPredator families")
        out = generate_dataset_predator(
            args.out, n_tasks=args.n_tasks,
            n_trajs_per_task=args.n_trajs, horizon=args.horizon,
            points_per_obstacle=args.points_per_obstacle, seed=args.seed,
            n_boxes=8 if args.env == "EnvPredatorObstacles" else 4,
            env_id=args.env, sweep_steps=args.sweep_steps,
            sweep_jitter=args.sweep_jitter)
        print(f"wrote dataset to {out}")
        return
    if args.env == "EnvSmall3D":
        from ramp_tpu.data.generator import generate_dataset_3d
        out = generate_dataset_3d(
            args.out, n_tasks=args.n_tasks, n_trajs_per_task=args.n_trajs,
            horizon=args.horizon,
            points_per_obstacle=args.points_per_obstacle, seed=args.seed)
    else:
        out = generate_dataset(args.out, env_id=args.env, n_tasks=args.n_tasks,
                               n_trajs_per_task=args.n_trajs,
                               horizon=args.horizon,
                               points_per_obstacle=args.points_per_obstacle,
                               seed=args.seed, static=not args.dynamic_layout)
    print(f"wrote dataset to {out}")


if __name__ == "__main__":
    main()
