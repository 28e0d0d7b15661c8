#!/usr/bin/env python
"""Profile the guided-replan hot loop (VERDICT r1 item 9).

The Pallas-APF A/B showed guidance is <1% of the replan; the U-Net
energy-gradient (forward + autograd backward per denoise step) dominates.
This script answers "where does the time go" with numbers instead of
guesses:

  * XLA cost analysis of the compiled plan: FLOPs + HBM bytes per replan
  * achieved TFLOP/s and GB/s against the v5e peaks (197 TFLOP/s bf16,
    819 GB/s HBM) from the measured marginal replan latency
  * optionally a full profiler trace (`--trace DIR`, TensorBoard Profile /
    Perfetto) for per-kernel time

Roofline logic: if achieved/peak FLOPs >> achieved/peak bytes the loop is
compute-bound and remat/attention tweaks are the lever; if the reverse,
fusion/layout is. Reference has no equivalent (wall-clock timers only,
SURVEY.md §5).

  python scripts/profile_static.py [--n-samples 64] [--trace logs/prof]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_HBM_GBS = 819.0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--trace", default=None,
                   help="also capture a profiler trace into this dir")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()

    from bench import measure_replan
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig

    config = StaticPlannerConfig(use_apf=True)
    planner = StaticPlanner(config)
    params = planner.init_params(jax.random.PRNGKey(0), 6, 64)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (6, 64, 2),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.9, -0.9, 0.0, 0.0], jnp.float32)
    goal = jnp.asarray([0.9, 0.9, 0.0, 0.0], jnp.float32)

    # --- cost analysis of ONE compiled replan
    fn = planner.plan_fn(args.n_samples, return_chain=False)
    import functools
    lowered = jax.jit(
        functools.partial(planner._plan, n_samples=args.n_samples,
                          return_chain=False)
    ).lower(params, jax.random.PRNGKey(1), pts, start, goal,
            planner._guide_w())
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    # --- measured marginal latency (same methodology as bench.py)
    m = measure_replan(config, n_samples=args.n_samples, K=8, n_iters=10)
    per_s = m["per_replan_ms"] / 1e3
    achieved_tflops = flops / per_s / 1e12 if per_s > 0 else 0.0
    achieved_gbs = bytes_accessed / per_s / 1e9 if per_s > 0 else 0.0

    out = {
        "per_replan_ms": m["per_replan_ms"],
        "p50_single_with_sync_ms": m["p50_single_ms"],
        "flops_per_replan": flops,
        "hbm_bytes_per_replan": bytes_accessed,
        "achieved_tflops": round(achieved_tflops, 2),
        "pct_peak_flops": round(100 * achieved_tflops
                                / V5E_PEAK_TFLOPS_BF16, 1),
        "achieved_hbm_gbs": round(achieved_gbs, 1),
        "pct_peak_hbm": round(100 * achieved_gbs / V5E_PEAK_HBM_GBS, 1),
        "device": str(jax.devices()[0]),
        "n_samples": args.n_samples,
        "ddim_steps": config.ddim_steps,
    }
    bound = ("compute" if out["pct_peak_flops"] >= out["pct_peak_hbm"]
             else "memory")
    out["bound"] = bound

    if args.trace:
        from ramp_tpu.utils.profiling import trace
        key = jax.random.PRNGKey(7)
        x, _ = fn(params, key, pts, start, goal)  # warm
        jax.block_until_ready(x)
        with trace(args.trace):
            for i in range(20):
                x, _ = fn(params, jax.random.fold_in(key, i), pts, start,
                          goal)
            jax.block_until_ready(x)
        out["trace_dir"] = args.trace

    print(json.dumps(out))


if __name__ == "__main__":
    main()
