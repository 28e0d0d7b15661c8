#!/usr/bin/env python
"""Export the latest orbax checkpoint's EMA params to a compact npz.

Trained weights stored under `checkpoints/` are working state; this exports
them to a small committable artifact that inference CLIs accept directly via
`--checkpoints <file>.npz`.

  python scripts/export_weights.py --checkpoints checkpoints/simple2d_v2 \
      --dataset dataset/EnvSimple2dquant_v2 --out artifacts/weights/simple2d_v2.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoints", required=True, help="orbax checkpoint dir")
    p.add_argument("--dataset", required=True, help="dataset dir (for shapes)")
    p.add_argument("--out", required=True)
    p.add_argument("--threed", action="store_true")
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    p.add_argument("--raw", action="store_true", help="export raw (non-EMA) params")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = p.parse_args()

    from ramp_tpu.utils.platform import set_platform
    set_platform(args.platform)

    from ramp_tpu.data.dataset import TrajectoryDataset
    from ramp_tpu.utils.checkpoints import export_params_npz, load_planner_params

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    if args.threed:
        from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig
        planner = Planner3D(Planner3DConfig(
            horizon=dataset.horizon, state_dim=dataset.state_dim,
            unet_input_dim=args.unet_dim,
            unet_dim_mults_option=args.dim_mults_option))
    else:
        from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
        planner = StaticPlanner(StaticPlannerConfig(
            horizon=dataset.horizon, state_dim=dataset.state_dim,
            unet_input_dim=args.unet_dim,
            unet_dim_mults_option=args.dim_mults_option))

    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 use_ema=not args.raw)
    out = export_params_npz(params, args.out)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
