#!/usr/bin/env python
"""A/B the self-attention lowering on the replan benchmark (real chip).

Same chained-scan methodology as bench.py (marginal latency of K dependency-
chained replans, one host sync). Compares `attn_impl` variants of the SAME
math/params: default (head transpose), bnhd (no transpose), flash (Pallas).

  python scripts/bench_attn_ab.py [--impls default bnhd flash]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(impl: str, n_samples: int = 64, K: int = 16, n_iters: int = 20) -> dict:
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig

    config = StaticPlannerConfig(use_apf=True, attn_impl=impl)
    planner = StaticPlanner(config)
    params = planner.init_params(jax.random.PRNGKey(0), 6, 64)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (6, 64, 2),
                             minval=-0.8, maxval=0.8)
    start = jnp.asarray([-0.9, -0.9, 0.0, 0.0], jnp.float32)
    goal = jnp.asarray([0.9, 0.9, 0.0, 0.0], jnp.float32)
    horizon, state_dim = config.horizon, config.state_dim

    @partial(jax.jit, static_argnames=("length",))
    def chained(params, key, pts, start, goal, length):
        def body(carry, _):
            key, xprev = carry
            key = jax.random.fold_in(
                key, jnp.abs(xprev[0, 0, 0] * 1e6).astype(jnp.uint32))
            x, _ = planner._plan(params, key, pts, start, goal,
                                 n_samples=n_samples, return_chain=False)
            return (key, x), None
        init = (key, jnp.zeros((n_samples, horizon, state_dim)))
        (key, x), _ = jax.lax.scan(body, init, None, length=length)
        return x

    def timed(length, key):
        t0 = time.perf_counter()
        x = chained(params, key, pts, start, goal, length)
        _ = np.asarray(x[0:1, 0:1, 0:1])
        return (time.perf_counter() - t0) * 1e3

    timed(1, jax.random.PRNGKey(1))
    timed(K, jax.random.PRNGKey(1))
    singles = sorted(timed(1, jax.random.PRNGKey(100 + i)) for i in range(n_iters))
    chains = sorted(timed(K, jax.random.PRNGKey(200 + i)) for i in range(n_iters))
    per = (chains[n_iters // 2] - singles[n_iters // 2]) / (K - 1)
    return {"impl": impl, "per_replan_ms": round(per, 3),
            "p50_single_ms": round(singles[n_iters // 2], 3),
            "p50_chain_ms": round(chains[n_iters // 2], 3)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--impls", nargs="+", default=["default", "bnhd"])
    args = p.parse_args()
    from ramp_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    for impl in args.impls:
        try:
            print(json.dumps(measure(impl)))
        except Exception as e:  # e.g. flash unsupported on this backend
            print(json.dumps({"impl": impl, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
