#!/usr/bin/env python
"""QCar pursuit-evasion scenarios: non-holonomic closed-loop replanning.

Simulation counterpart of the reference's PHYSICAL demos (ref
README.md:58-86; the repo ships no code for them): a kinematic-bicycle
evader with QCar1 geometry executes the dynamic planner's replans through
a pure-pursuit tracker while the dataset pursuer hunts its actual
position, in the 6x6 m (= [-1,1]^2) arena.

  Scenario 1: the dataset scene's 4 static boxes (baseline).
  Scenario 2: + 2 UNSEEN boxes sampled in free space. They enter the APF
    surface points always, and the encoder cloud too by default
    (--unseen-apf-only drops them from the encoder: avoidance then rests
    on the reactive APF alone, isolating the composition mechanism).

  python scripts/qcar_demo.py --dataset dataset/EnvPredator_v2 \
      --checkpoints artifacts/weights/predator_v2_60k.npz --n-episodes 5
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def sample_unseen_boxes(rng, box_centers, box_sizes, n_new=2, margin=0.12):
    """Free-space centers for the scenario-2 boxes; dataset-mean size."""
    from ramp_tpu.data.generator import sample_free_point
    centers, sizes = list(np.asarray(box_centers)), np.asarray(box_sizes)
    if sizes.ndim == 1:
        sizes = np.repeat(sizes[:, None], 2, axis=-1)
    new_size = sizes.mean(axis=0)
    all_sizes = list(sizes)
    for _ in range(n_new):
        c = sample_free_point(np.asarray(centers), np.asarray(all_sizes),
                              rng, margin=float(new_size.max()) / 2 + margin)
        centers.append(np.asarray(c, np.float32))
        all_sizes.append(new_size)
    return (np.asarray(centers, np.float32)[len(box_centers):],
            np.asarray(all_sizes, np.float32)[len(box_centers):])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--scenario", default="both", choices=["1", "2", "both"])
    p.add_argument("--n-episodes", type=int, default=5)
    p.add_argument("--n-samples", type=int, default=35)
    p.add_argument("--max-steps", type=int, default=60)
    p.add_argument("--substeps", type=int, default=5)
    p.add_argument("--engine", default="scan", choices=["scan", "host"],
                   help="scan: whole episode in one jitted dispatch "
                        "(fast eval); host: one controller_step dispatch "
                        "per tick (the deployment contract)")
    p.add_argument("--unseen-apf-only", action="store_true",
                   help="scenario 2: hide the unseen boxes from the encoder "
                        "(APF-only reactive avoidance)")
    p.add_argument("--results", default="eval_results_qcar.json")
    p.add_argument("--gif-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--cfg-weight", type=float, default=None)
    p.add_argument("--preset", default=None,
                   choices=["parity", "quality", "fast"])
    p.add_argument("--pursuer-conditioned", action="store_true",
                   help="condition the score model on the live pursuer "
                        "cloud (weights from a --pursuer-aware dataset; "
                        "the dataset's own pursuer row is dropped from "
                        "the scene cloud)")
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    from ramp_tpu.data.dataset import TrajectoryDataset
    from ramp_tpu.eval.harness import sample_context
    from ramp_tpu.eval.qcar import run_qcar_episode, run_qcar_episode_scan
    from ramp_tpu.eval.stats import ci_fields, mean_ci95, rate_ci95
    from ramp_tpu.planners.dynamic import DynamicPlanner, DynamicPlannerConfig
    from ramp_tpu.presets import resolve_dynamic_preset
    from ramp_tpu.scenes.pointclouds import (generate_box_points_np,
                                             scene_obstacle_points_np)
    from ramp_tpu.utils.checkpoints import load_planner_params

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    overrides = {}
    cfg_weight, ddim_steps_low = resolve_dynamic_preset(
        args.preset, args.cfg_weight)
    if cfg_weight is not None:
        overrides["cfg_weight"] = cfg_weight
    if ddim_steps_low is not None:
        overrides["ddim_steps_low"] = ddim_steps_low
    if args.pursuer_conditioned:
        # the encoder cloud below is rebuilt from box geometry (boxes
        # only), so the planner's appended live-pursuer row is the +1 row
        overrides["pursuer_conditioned"] = True
    cfg = DynamicPlannerConfig(horizon=dataset.horizon,
                               state_dim=dataset.state_dim,
                               unet_input_dim=args.unet_dim,
                               unet_dim_mults_option=args.dim_mults_option,
                               max_iterations=args.max_steps,
                               **overrides)
    planner = DynamicPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = load_planner_params(planner, args.checkpoints, n_obs, n_pts,
                                 seed=args.seed)

    idx = 0
    base_centers = np.asarray(dataset.box_centers[idx])
    base_sizes = np.asarray(dataset.box_sizes[idx])
    if base_sizes.ndim == 1:
        base_sizes = np.repeat(base_sizes[:, None], 2, axis=-1)

    scenarios = ["1", "2"] if args.scenario == "both" else [args.scenario]
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    out = {}
    for sc in scenarios:
        centers, sizes = base_centers, base_sizes
        if sc == "2":
            new_c, new_s = sample_unseen_boxes(rng, base_centers, base_sizes)
            centers = np.concatenate([base_centers, new_c])
            sizes = np.concatenate([base_sizes, new_s])
        # encoder cloud: dataset-variant point distribution; scenario 2
        # optionally hides the unseen boxes from it (APF-only avoidance)
        enc_centers = base_centers if (sc == "2" and args.unseen_apf_only) \
            else centers
        enc_sizes = base_sizes if (sc == "2" and args.unseen_apf_only) \
            else sizes
        obstacle_pts = scene_obstacle_points_np(enc_centers, enc_sizes,
                                                points_per_box=n_pts, rng=rng)
        # APF surface points always cover every physical box (APF-variant
        # distribution, matching the eval harness / ref APFhelper_dynamic)
        apf_pts = np.concatenate([
            generate_box_points_np(c, s, 64, rng=rng,
                                   boundary_lo_frac=2.0 / 3.0,
                                   boundary_hi_frac=1.0,
                                   elementwise_edge_weights=True)
            for c, s in zip(centers, sizes)]).astype(np.float32)

        rows = []
        from ramp_tpu.data.generator import sample_free_point
        for ep in range(args.n_episodes):
            ctx = sample_context(rng, centers, sizes)
            # farthest of up to 100 free draws — never silently accept a
            # pursuer spawned on top of the start (instant capture)
            pur, best_d = None, -1.0
            for _ in range(100):
                cand = sample_free_point(centers, sizes, rng)
                d = float(np.linalg.norm(cand - ctx["start"][:2]))
                if d > best_d:
                    pur, best_d = cand, d
                if d > 0.5:
                    break
            ctx["pursuer"] = pur.astype(np.float32)
            ctx["box_centers"], ctx["box_sizes"] = centers, sizes
            key, k = jax.random.split(key)
            if args.engine == "scan":
                res = run_qcar_episode_scan(planner, params, obstacle_pts,
                                            apf_pts, ctx,
                                            n_samples=args.n_samples,
                                            n_substeps=args.substeps, key=k)
            else:
                res = run_qcar_episode(planner, params, obstacle_pts,
                                       apf_pts, ctx,
                                       n_samples=args.n_samples,
                                       n_substeps=args.substeps,
                                       max_steps=args.max_steps, key=k)
            m = res["metrics"]
            rows.append(m)
            print(f"scenario {sc} ep {ep}: score={m['score']} "
                  f"captured={m['captured']} goal={m['goal_reached']} "
                  f"track_err={m['tracking_error_mean']:.4f}", flush=True)
            if args.gif_dir and ep == 0:
                os.makedirs(args.gif_dir, exist_ok=True)
                from ramp_tpu.eval.visualization import save_dynamic_gif
                save_dynamic_gif(
                    os.path.join(args.gif_dir, f"qcar_scenario{sc}.gif"),
                    res["chains"], centers, sizes, ctx["goal"][:2],
                    pursuer_radius=cfg.pursuer_radius)

        pl = [r["path_length"] for r in rows if r["path_length"] is not None]
        out[f"scenario_{sc}"] = {
            "n_boxes": len(centers),
            "capture_rate": float(np.mean([r["captured"] for r in rows])),
            **ci_fields("capture_rate",
                        rate_ci95([r["captured"] for r in rows])),
            "goal_success_rate": float(np.mean([r["goal_reached"]
                                                for r in rows])),
            **ci_fields("goal_success_rate",
                        rate_ci95([r["goal_reached"] for r in rows])),
            "score": float(np.mean([r["score"] for r in rows])),
            **ci_fields("score", mean_ci95([r["score"] for r in rows],
                                           bounds=(0.0, 1.0))),
            "tracking_error_mean": float(np.mean(
                [r["tracking_error_mean"] for r in rows])),
            "path_length_mean": float(np.mean(pl)) if pl else None,
            "n_episodes": args.n_episodes,
            "episodes": rows,
        }

    with open(args.results, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "episodes"}
                      for k, v in out.items()}, indent=2))
    print(f"results written to {args.results}")


if __name__ == "__main__":
    main()
