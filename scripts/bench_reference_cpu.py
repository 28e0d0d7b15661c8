"""Measure the reference's PyTorch-CPU sampling throughput (BASELINE.md target).

BASELINE.json's north-star asks for >=50x the reference's PyTorch-CPU
sampling throughput on one v5e chip. The reference repo publishes no numbers,
so this script produces the CPU baseline by running the reference's own
sampler (imported from /root/reference, NOT copied): the exact
`StaticGaussianDiffusionModel.run_inference` inner loop the static harness
times (`scripts/inference/inference_static.py:146-157`) — DDIM-5, CFG x2,
energy-mode U-Net gradient, optional cKDTree APF — with the same workload
as our bench.py (64 trajectories, 6x64-point obstacle scene, horizon 64).

Weights are randomly initialized: throughput is weight-independent, and the
reference ships no checkpoints. torch.compile is OFF by default (Inductor
CPU compiles for many minutes on this 1-core box; eager is the honest
PyTorch-CPU number most users get) — pass --compile to include it.

Output: one JSON line
  {"ref_cpu_ms_per_replan": ..., "tpu_ms_per_replan": ..., "speedup": ...}
where tpu_ms is read from a prior bench.py result (--tpu-ms to override).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--n-iters", type=int, default=5)
    ap.add_argument("--use-apf", action="store_true", default=True)
    ap.add_argument("--no-apf", dest="use_apf", action="store_false")
    ap.add_argument("--compile", action="store_true")
    ap.add_argument("--tpu-ms", type=float, default=None,
                    help="our TPU p50 replan ms (default: logs/bench.json or 19.4)")
    args = ap.parse_args()

    sys.path.insert(0, REF)
    import torch
    torch.manual_seed(0)

    from mpd.models import StaticGaussianDiffusionModel, TemporalUnetInference
    from mpd.models.diffusion_models.sample_functions import ddpm_sample_fn

    horizon, state_dim = 64, 4
    unet = TemporalUnetInference(
        state_dim=state_dim,
        n_support_points=horizon,
        unet_input_dim=32,
        dim_mults=(1, 2, 4, 8),  # UNET_DIM_MULTS[1], ref UnetInference.py:13
    )
    model = StaticGaussianDiffusionModel(
        model=unet,
        variance_schedule="exponential",
        n_diffusion_steps=100,
        predict_epsilon=True,
        compose=False,
        use_apf=args.use_apf,
    )
    model.eval()
    for p in model.parameters():
        p.requires_grad_(False)
    if args.compile:
        model = torch.compile(model)

    obstacle_pts = (torch.rand(6, 64, 2) * 1.6 - 0.8).float()
    start = torch.tensor([-0.9, -0.9, 0.0, 0.0])
    goal = torch.tensor([0.9, 0.9, 0.0, 0.0])
    hard_conds = {0: start, horizon - 1: goal}
    # The reference harness threads a single normalized dataset trajectory
    # through run_inference (inference_static.py:63,152); the U-Net accepts it
    # as `x_start` but never reads it — a random stand-in is equivalent.
    traj_normalized = (torch.rand(horizon, state_dim) * 2 - 1).float()

    def one_replan():
        return model.run_inference(
            None, hard_conds,
            n_samples=args.n_samples,
            horizon=horizon,
            return_chain=True,
            traj_normalized=traj_normalized,
            obstacle_pts=obstacle_pts,
            sample_fn=ddpm_sample_fn,
            guide=None,
            n_guide_steps=1,
            t_start_guide=25,
            noise_std_extra_schedule_fn=lambda x: 0.5,
            n_diffusion_steps_without_noise=0,
        )

    one_replan()  # warmup (scene-latent cache, allocator, lazy inits)
    times = []
    for _ in range(args.n_iters):
        t0 = time.perf_counter()
        one_replan()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    ref_ms = times[len(times) // 2]

    tpu_ms = args.tpu_ms
    if tpu_ms is None:
        try:
            with open("logs/bench.json") as f:
                tpu_ms = json.load(f)["value"]
        except Exception:
            tpu_ms = 19.4  # last recorded bench.py value (RESULTS.md)
    print(json.dumps({
        "ref_cpu_ms_per_replan": round(ref_ms, 2),
        "ref_cpu_all_iters_ms": [round(t, 2) for t in times],
        "n_samples": args.n_samples,
        "use_apf": args.use_apf,
        "compiled": args.compile,
        "tpu_ms_per_replan": tpu_ms,
        "speedup": round(ref_ms / tpu_ms, 1),
    }))


if __name__ == "__main__":
    main()
