"""Serve a planner over HTTP — one warm process per chip.

`--family static` (default) serves the 2-D static planner; `--family 3d`
serves the 3-D planner (obstacle points become [O][P][3] and requests may
pass sphere geometry for on-server scoring); `--family dynamic` serves
closed-loop pursuit-evasion episodes (`POST /episode/begin`, then one
`POST /episode/step` per observed pursuer position, `/episode/end`).

    python scripts/serve.py --dataset dataset/EnvSimple2dquant_v2 \
        --checkpoints artifacts/weights/simple2d_v2.npz --port 8500

    curl -s localhost:8500/healthz
    curl -s -X POST localhost:8500/plan -d '{"obstacle_points": [[[0.1,0.2], ...]],
        "start": [-0.9,-0.9,0,0], "goal": [0.9,0.9,0,0], "n_samples": 20}'

The dataset supplies the trained normalizer and the expected scene shape
(like the eval CLIs); requests and responses are in world coordinates.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--family", default="static",
                   choices=["static", "3d", "dynamic"],
                   help="planner family to serve")
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--n-samples", type=int, default=20,
                   help="default trajectory population per request")
    p.add_argument("--use-apf", action="store_true")
    p.add_argument("--compose", action="store_true",
                   help="energy composition: requests carry two stacked "
                        "obstacle sets [2][O][P][d] (static and 3d families)")
    p.add_argument("--ddim-steps", type=int, default=None)
    p.add_argument("--preset", default=None,
                   choices=["parity", "quality", "fast"],
                   help="measured per-family knob presets "
                        "(ramp_tpu/presets.py)")
    p.add_argument("--cfg-weight", type=float, default=None)
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pursuer-conditioned", action="store_true",
                   help="--family dynamic only: condition the score model "
                        "on the observed pursuer cloud each tick (requires "
                        "weights trained on a --pursuer-aware dataset; "
                        "/episode/begin then requires a 'pursuer' field)")
    p.add_argument("--no-warm", action="store_true",
                   help="skip startup compilation (first request pays it)")
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    from ramp_tpu.data.dataset import TrajectoryDataset
    from ramp_tpu.utils.checkpoints import load_planner_params
    from ramp_tpu.serve import (ControllerService, PlanningService,
                                make_http_server)

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    # cfg_weight enters overrides per family below, via resolve_*_preset
    # (explicit flag wins inside the resolver).
    overrides = {}
    if args.pursuer_conditioned and args.family != "dynamic":
        p.error("--pursuer-conditioned applies to --family dynamic only")
    if args.family == "dynamic":
        from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
        from ramp_tpu.presets import resolve_dynamic_preset
        if args.use_apf or args.ddim_steps is not None or args.compose:
            p.error("--use-apf/--ddim-steps/--compose apply to "
                    "the static/3d families only")
        cfg_weight, ddim_steps_low = resolve_dynamic_preset(
            args.preset, args.cfg_weight)
        if cfg_weight is not None:
            overrides["cfg_weight"] = cfg_weight
        if ddim_steps_low is not None:
            overrides["ddim_steps_low"] = ddim_steps_low
        if args.pursuer_conditioned:
            overrides["pursuer_conditioned"] = True
        cfg = DynamicPlannerConfig(horizon=dataset.horizon,
                                   state_dim=dataset.state_dim,
                                   unet_input_dim=args.unet_dim,
                                   unet_dim_mults_option=args.dim_mults_option,
                                   **overrides)
        planner = DynamicPlanner(cfg)
        point_dim = 2
    elif args.family == "3d":
        from ramp_tpu.planners.planner3d import Planner3D, Planner3DConfig
        from ramp_tpu.presets import resolve_3d_preset
        if args.ddim_steps is not None:
            p.error("--ddim-steps applies to --family static only "
                    "(use --preset fast for the 3-D DDIM-8 sampler)")
        if args.use_apf:
            # beyond-parity 3-D APF on the DDPM chain (guidance/apf.py is
            # dimension-generic; the reference has no 3-D APF)
            overrides["use_apf"] = True
        use_ddim, preset_ddim_steps, cfg_weight = resolve_3d_preset(
            args.preset, args.cfg_weight, compose=args.compose)
        if cfg_weight is not None:
            overrides["cfg_weight"] = cfg_weight
            overrides["compose_weights"] = (cfg_weight, cfg_weight)
        if use_ddim:
            overrides["use_ddim"] = True
        if preset_ddim_steps is not None:
            overrides["ddim_steps_override"] = preset_ddim_steps
        cfg = Planner3DConfig(horizon=dataset.horizon,
                              state_dim=dataset.state_dim,
                              unet_input_dim=args.unet_dim,
                              unet_dim_mults_option=args.dim_mults_option,
                              compose=args.compose, **overrides)
        planner = Planner3D(cfg)
        point_dim = 3
    else:
        from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
        from ramp_tpu.presets import resolve_static_preset
        ddim_steps, cfg_weight = resolve_static_preset(
            args.preset, args.ddim_steps, args.cfg_weight)
        if cfg_weight is not None:
            overrides["cfg_weight"] = cfg_weight
        if ddim_steps is not None:
            overrides["ddim_steps_override"] = ddim_steps
        cfg = StaticPlannerConfig(horizon=dataset.horizon,
                                  state_dim=dataset.state_dim,
                                  unet_input_dim=args.unet_dim,
                                  unet_dim_mults_option=args.dim_mults_option,
                                  use_apf=args.use_apf, compose=args.compose,
                                  **overrides)
        planner = StaticPlanner(cfg)
        point_dim = 2
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 seed=args.seed)

    if args.family == "dynamic":
        service = None
        controller = ControllerService(planner, params, dataset.normalizer,
                                       default_n_samples=args.n_samples)
        if not args.no_warm:
            # compile STAGE I + one control step on dummy inputs. A
            # pursuer-aware dataset carries the training pursuer as its
            # last cloud row; requests send boxes only (the planner
            # appends the live row), so warm at the boxes-only shape.
            warm_obs = n_obs - 1 if args.pursuer_conditioned else n_obs
            print(json.dumps({"event": "warming", "shape": [warm_obs, n_pts],
                              "n_samples": args.n_samples}), flush=True)
            import time as _time
            t0 = _time.perf_counter()
            sd = dataset.state_dim
            out = controller.begin(
                [[[0.0, 0.0]] * n_pts] * warm_obs, [0.0] * sd, [0.0] * sd,
                seed=0,
                pursuer=([0.5, 0.5] if args.pursuer_conditioned else None))
            controller.step(out["episode_id"], [0.0, 0.0])
            controller.end(out["episode_id"])
            print(json.dumps({"event": "warm",
                              "seconds": round(_time.perf_counter() - t0, 1)}),
                  flush=True)
    else:
        controller = None
        service = PlanningService(planner, params, dataset.normalizer,
                                  default_n_samples=args.n_samples,
                                  point_dim=point_dim)
        if not args.no_warm:
            print(json.dumps({"event": "warming", "shape": [n_obs, n_pts],
                              "n_samples": args.n_samples}), flush=True)
            secs = service.warm(n_obs, n_pts)
            print(json.dumps({"event": "warm", "seconds": round(secs, 1)}),
                  flush=True)

    server = make_http_server(service, args.host, args.port,
                              controller=controller)
    print(json.dumps({"event": "serving",
                      "url": f"http://{args.host}:{args.port}"}), flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
