"""Benchmark: p50 replan latency for a 64-trajectory batch (the driver's
north-star metric — BASELINE.md targets <50 ms on one v5e chip).

A "replan" is one STAGE-II-shaped refinement: 5 guided DDIM steps over the
full trajectory batch with CFG (2x fold) and device-side APF — the inner loop
of both the static harness (`inference_static.py:146-157`) and the dynamic
closed-loop replanner (`diffusion_model_dynamic.py:552-587`).

Prints ONE JSON line:
  {"metric": "p50_replan_latency_64traj", "value": <ms>, "unit": "ms",
   "vs_baseline": <50.0 / value>}   (>1.0 means beating the 50 ms target)
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig

    n_samples = 64
    n_obstacles, n_points = 6, 64
    config = StaticPlannerConfig(use_apf=True)  # APF on: the expensive path
    planner = StaticPlanner(config)
    params = planner.init_params(jax.random.PRNGKey(0), n_obstacles, n_points)

    obstacle_pts = jax.random.uniform(
        jax.random.PRNGKey(2), (n_obstacles, n_points, 2), minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.9, -0.9, 0.0, 0.0], jnp.float32)
    goal = jnp.asarray([0.9, 0.9, 0.0, 0.0], jnp.float32)

    plan = planner.plan_fn(n_samples, return_chain=False)

    # compile + warmup (the reference warms up too, diffusion_model_static.py:405)
    key = jax.random.PRNGKey(1)
    x, _ = plan(params, key, obstacle_pts, start, goal)
    x.block_until_ready()

    n_iters = 50
    times_ms = []
    for i in range(n_iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        x, _ = plan(params, k, obstacle_pts, start, goal)
        x.block_until_ready()
        times_ms.append((time.perf_counter() - t0) * 1e3)

    times_ms.sort()
    p50 = times_ms[len(times_ms) // 2]
    # 5 guided DDIM steps/plan, n_samples trajectories, CFG fold 2x
    result = {
        "metric": "p50_replan_latency_64traj",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 3),
        "extra": {
            "p10_ms": round(times_ms[len(times_ms) // 10], 3),
            "p90_ms": round(times_ms[(len(times_ms) * 9) // 10], 3),
            "trajs_per_sec": round(n_samples / (p50 / 1e3), 1),
            "denoise_steps_per_sec": round(config.ddim_steps / (p50 / 1e3), 1),
            "device": str(jax.devices()[0]),
            "n_samples": n_samples,
            "ddim_steps": config.ddim_steps,
            "apf": True,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
