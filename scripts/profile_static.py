#!/usr/bin/env python
"""Capture a jax.profiler trace of the static guided-plan hot loop.

Writes a TensorBoard-loadable trace under --out; per-op timings identify
whether the guided step is MXU-, HBM-, or overhead-bound.

  python scripts/profile_static.py --out /tmp/trace
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/ramp_trace")
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--use-apf", action="store_true", default=True)
    args = p.parse_args()

    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig
    from ramp_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    n_obstacles, n_points = 6, 64
    planner = StaticPlanner(StaticPlannerConfig(use_apf=args.use_apf))
    params = planner.init_params(jax.random.PRNGKey(0), n_obstacles, n_points)
    pts = jax.random.uniform(jax.random.PRNGKey(2),
                             (n_obstacles, n_points, 2), minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.9, -0.9, 0.0, 0.0], jnp.float32)
    goal = jnp.asarray([0.9, 0.9, 0.0, 0.0], jnp.float32)
    fn = planner.plan_fn(args.n_samples, return_chain=False)

    # warm up / compile outside the trace
    x, _ = fn(params, jax.random.PRNGKey(1), pts, start, goal)
    x.block_until_ready()

    with jax.profiler.trace(args.out):
        key = jax.random.PRNGKey(3)
        for _ in range(args.iters):
            key, k = jax.random.split(key)
            x, _ = fn(params, k, pts, start, goal)
        x.block_until_ready()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
