"""Cross-engine quality check: the REFERENCE engine running OUR weights.

BASELINE.md's quality-parity target asks that the rebuild match the
reference's metrics "measured by re-running the reference harness CPU-side
vs. the new engine". The reference ships no weights, so the only way to put
both engines on identical weights is to export OURS: this script converts a
RAMP-TPU trained checkpoint to a torch state_dict
(`ramp_tpu.utils.torch_import.export_*`), loads it into the reference's own
`TemporalUnetInference` + `StaticGaussianDiffusionModel` (imported from
/root/reference, never copied), samples the same env/context grid our static
harness uses (same `sample_context` stream, same seed), and scores the
reference's outputs with our metric definitions
(`ramp_tpu/eval/metrics.py` == `scripts/inference/core/metrics.py`).

If both engines report comparable success / collision intensity on identical
weights and contexts, sampler parity holds end-to-end (RNG streams differ, so
the comparison is statistical, not bitwise).

  python scripts/cross_engine_eval.py --dataset dataset/EnvSimple2dquant_v2 \
      --weights artifacts/weights/simple2d_v2.npz --max-envs 6 --n-contexts 5 \
      [--use-apf] [--compare eval_results_static_300k.json]

Output: one JSON dict {reference_engine: {...}, ours_recorded: {...}}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="dataset/EnvSimple2dquant_v2")
    ap.add_argument("--weights", default="artifacts/weights/simple2d_v2.npz")
    ap.add_argument("--unet-dim", type=int, default=32)
    ap.add_argument("--dim-mults-option", type=int, default=1, choices=[0, 1])
    ap.add_argument("--max-envs", type=int, default=6)
    ap.add_argument("--n-contexts", type=int, default=5)
    ap.add_argument("--n-samples", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--use-apf", action="store_true")
    ap.add_argument("--compare", default=None,
                    help="our harness's eval_results JSON to print alongside")
    ap.add_argument("--results", default="eval_results_cross_engine.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # template init only, no jit
    import numpy as np

    from ramp_tpu.data.dataset import TrajectoryDataset
    from ramp_tpu.eval.harness import sample_context
    from ramp_tpu.eval.metrics import (compute_collision_intensity,
                                       trajectory_success_and_metrics)
    from ramp_tpu.nn.unet import UNET_DIM_MULTS
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
    from ramp_tpu.utils.checkpoints import load_planner_params
    from ramp_tpu.utils.torch_import import (export_encoder2d_state_dict,
                                             export_unet_state_dict)

    dataset = TrajectoryDataset(args.dataset, include_velocity=True)
    dim_mults = UNET_DIM_MULTS[args.dim_mults_option]
    cfg = StaticPlannerConfig(horizon=dataset.horizon,
                              state_dim=dataset.state_dim,
                              unet_input_dim=args.unet_dim,
                              unet_dim_mults_option=args.dim_mults_option)
    planner = StaticPlanner(cfg)
    n_obs, n_pts = dataset.obstacle_points.shape[1:3]
    params = load_planner_params(planner, args.weights, n_obs, n_pts)

    # ---- our flax weights -> the reference's torch modules
    sys.path.insert(0, REF)
    import torch
    torch.manual_seed(args.seed)
    from mpd.models.diffusion_models.diffusion_model_static import \
        StaticGaussianDiffusionModel
    from mpd.models.diffusion_models.sample_functions import ddpm_sample_fn
    from mpd.models.diffusion_models.UnetInference import TemporalUnetInference

    unet = TemporalUnetInference(state_dim=cfg.state_dim,
                                 n_support_points=cfg.horizon,
                                 unet_input_dim=cfg.unet_input_dim,
                                 dim_mults=dim_mults)
    sd = export_unet_state_dict(params["unet"], n_resolutions=len(dim_mults))
    sd.update({f"scene_encoder.{k}": v for k, v in
               export_encoder2d_state_dict(params["encoder"]).items()})
    missing, unexpected = unet.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert missing == ["scene_encoder.pos_encoder.div_term"], missing

    model = StaticGaussianDiffusionModel(
        model=unet, variance_schedule=cfg.variance_schedule,
        n_diffusion_steps=cfg.n_diffusion_steps, predict_epsilon=True,
        compose=False, use_apf=args.use_apf)
    model.eval()
    for p in model.parameters():
        p.requires_grad_(False)

    # threaded through run_inference but never read by the U-Net
    # (see bench_reference_cpu.py docstring note on x_start)
    traj_normalized = torch.zeros(cfg.horizon, cfg.state_dim)

    # ---- same env/context stream as our harness (run_full_evaluation)
    rng = np.random.default_rng(args.seed)
    task_ids = list(dataset.map_task_id_to_trajectories_id.keys())[:args.max_envs]
    all_success, all_ci, all_t = [], [], []
    per_env = {}
    for tid in task_ids:
        idx = int(dataset.map_task_id_to_trajectories_id[tid][0])
        obstacle_pts = torch.from_numpy(
            np.asarray(dataset.obstacle_points[idx], np.float32))
        box_centers = dataset.box_centers[idx]
        box_sizes = dataset.box_sizes[idx]
        env_success, env_ci = [], []
        for _ in range(args.n_contexts):
            ctx = sample_context(rng, box_centers, box_sizes)
            start_n = np.asarray(dataset.normalizer.normalize(ctx["start"]),
                                 np.float32)
            goal_n = np.asarray(dataset.normalizer.normalize(ctx["goal"]),
                                np.float32)
            hard_conds = {0: torch.from_numpy(start_n),
                          cfg.horizon - 1: torch.from_numpy(goal_n)}
            t0 = time.perf_counter()
            chain = model.run_inference(
                None, hard_conds, n_samples=args.n_samples,
                horizon=cfg.horizon, return_chain=True,
                traj_normalized=traj_normalized, obstacle_pts=obstacle_pts,
                sample_fn=ddpm_sample_fn, guide=None, n_guide_steps=1,
                t_start_guide=25, noise_std_extra_schedule_fn=lambda x: 0.5,
                n_diffusion_steps_without_noise=0)
            dt = time.perf_counter() - t0
            trajs_n = chain[-1].detach().numpy()
            trajs = np.asarray(dataset.normalizer.unnormalize(trajs_n))
            ci = np.asarray(compute_collision_intensity(trajs, box_centers,
                                                        box_sizes))
            m = trajectory_success_and_metrics(trajs, ci)
            env_success.append(m["success"])
            env_ci.append(m["collision_intensity"])
            all_t.append(dt)
        per_env[int(tid)] = {"success_rate": float(np.mean(env_success)),
                             "collision_intensity": float(np.mean(env_ci))}
        all_success += env_success
        all_ci += env_ci
        print(f"env {tid}: success {np.mean(env_success):.3f} "
              f"ci {np.mean(env_ci):.3f}% ({np.mean(all_t):.1f} s/context)")

    out = {"reference_engine_with_our_weights": {
        "success_rate": float(np.mean(all_success)),
        "collision_intensity_pct": float(np.mean(all_ci)),
        "mean_s_per_context_cpu": float(np.mean(all_t)),
        "grid": f"{len(task_ids)}x{args.n_contexts}x{args.n_samples}",
        "use_apf": args.use_apf, "weights": args.weights, "per_env": per_env,
    }}
    if args.compare:
        with open(args.compare) as f:
            ours = json.load(f)
        out["ours_recorded"] = ours.get("aggregate", ours)
    with open(args.results, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_env"},
                     default=str)[:600])
    print(f"results written to {args.results}")


if __name__ == "__main__":
    main()
