"""Benchmark: p50 replan latency for a 64-trajectory batch (the driver's
north-star metric — BASELINE.md targets <50 ms on one v5e chip).

A "replan" is one full guided DDIM plan: 5 guided denoise steps over the
trajectory batch with CFG (2x fold) and device-side APF — the inner loop of
both the static harness (`inference_static.py:146-157`) and the dynamic
closed-loop replanner (`diffusion_model_dynamic.py:552-587`).

Methodology — measured, not assumed, on this platform:
  * `block_until_ready` can return before execution completes (a 2048^3
    matmul "finished" in 0.04 ms), so naive per-call timing UNDERESTIMATES;
  * any true host synchronization costs a fixed ~25 ms runtime tick, so
    fetch-per-call timing OVERESTIMATES.
The honest number is the marginal latency of a dependency-chained
`lax.scan` of K replans (each key folds in the previous plan, so steps
cannot overlap), timed around ONE host fetch:
    per_replan = (t_chain(K) - t_chain(1)) / (K - 1)
This isolates pure device time per replan from the fixed sync cost.

`measure_replan()` is the reusable harness (scripts/bench_attn_ab.py A/Bs
attention lowerings through it); `main()` prints ONE JSON line:
  {"metric": "p50_replan_latency_64traj", "value": <ms>, "unit": "ms",
   "vs_baseline": <50.0 / value>}   (>1.0 means beating the 50 ms target)
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def measure_replan(config=None, n_samples: int = 64, K: int = 16,
                   n_iters: int = 30) -> dict:
    """Measure p50 marginal replan latency for a StaticPlanner config.

    Returns {"per_replan_ms", "p50_single_ms", "p50_chain_ms", "config"}.
    """
    from ramp_tpu.planners.static import StaticPlanner, StaticPlannerConfig

    config = config or StaticPlannerConfig(use_apf=True)
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
            # data dependency: the next key folds in the previous plan, so
            # the scan cannot pipeline across replans
            key = jax.random.fold_in(
                key, jnp.abs(xprev[0, 0, 0] * 1e6).astype(jnp.uint32))
            x, _ = planner._plan(params, key, pts, start, goal,
                                 planner._guide_w(),
                                 n_samples=n_samples, return_chain=False)
            return (key, x), None
        init = (key, jnp.zeros((n_samples, horizon, state_dim)))
        (key, x), _ = jax.lax.scan(body, init, None, length=length)
        return x

    def timed(length, key):
        t0 = time.perf_counter()
        x = chained(params, key, pts, start, goal, length)
        _ = np.asarray(x[0:1, 0:1, 0:1])  # true host sync
        return (time.perf_counter() - t0) * 1e3

    # compile + warmup both lengths
    timed(1, jax.random.PRNGKey(1))
    timed(K, jax.random.PRNGKey(1))
    singles = sorted(timed(1, jax.random.PRNGKey(100 + i)) for i in range(n_iters))
    chains = sorted(timed(K, jax.random.PRNGKey(200 + i)) for i in range(n_iters))
    p50_single = singles[n_iters // 2]
    p50_chain = chains[n_iters // 2]
    per = (p50_chain - p50_single) / (K - 1)
    return {"per_replan_ms": round(per, 3),
            "p50_single_ms": round(p50_single, 3),
            "p50_chain_ms": round(p50_chain, 3),
            "n_samples": n_samples, "K": K,
            "ddim_steps": config.ddim_steps}


def main() -> None:
    import os
    from ramp_tpu.utils import platform as plat
    plat.enable_compilation_cache()

    # The TPU here lives behind a TCP relay; if the relay is down,
    # jax.devices() blocks forever. Never hang the driver's bench run: wait a
    # bounded time for the accelerator, then fall back to a clearly-marked
    # tiny-model CPU measurement so a valid JSON line is always emitted.
    cpu_fallback = False
    if not plat.accelerator_available():
        wait_s = float(os.environ.get("RAMP_BENCH_TUNNEL_WAIT_S", "900"))
        if not plat.wait_for_accelerator(wait_s):
            plat.set_platform("cpu")
            cpu_fallback = True

    # Fixed sync floor: fetch one scalar that is already on device. On the
    # tunneled chip this is ~1 RTT of the relay + the runtime's sync tick —
    # the irreducible part of any single-call-with-host-sync latency, which
    # the marginal-chain method deliberately excludes. Reporting it makes
    # the ~25 ms gap between marginal and single-call numbers explainable
    # instead of mysterious (VERDICT r1 item 4).
    def _sync_floor_ms(n: int = 15) -> float:
        one = jax.device_put(jnp.zeros(()))
        jax.block_until_ready(one)
        _ = np.asarray(one + jnp.float32(0))  # warm the trivial-add path
        ts = []
        for i in range(1, n + 1):
            t0 = time.perf_counter()
            # a FRESH trivial computation each time: fetching an
            # already-materialized array is host-cached (measured ~5 us),
            # so the probe must dispatch + sync a new result
            _ = np.asarray(one + jnp.float32(i))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[n // 2]

    n_samples = 64
    if cpu_fallback:
        from ramp_tpu.planners.static import StaticPlannerConfig
        tiny = StaticPlannerConfig(use_apf=True, horizon=16,
                                   n_diffusion_steps=10, unet_input_dim=8,
                                   unet_dim_mults_option=0, dtype="float32")
        m = measure_replan(tiny, n_samples=n_samples, K=8, n_iters=5)
    else:
        m = measure_replan(n_samples=n_samples)
    per_replan = m["per_replan_ms"]
    result = {
        "metric": "p50_replan_latency_64traj",
        "value": per_replan,
        "unit": "ms",
        "vs_baseline": round(50.0 / per_replan, 3),
        "extra": {
            "method": f"marginal latency of a dependency-chained scan of {m['K']} "
                      "replans (single host sync); see bench.py docstring",
            "p50_single_call_with_host_sync_ms": m["p50_single_ms"],
            "host_sync_floor_ms": round(_sync_floor_ms(), 3),
            "p50_chain_ms": m["p50_chain_ms"],
            "trajs_per_sec": round(n_samples / (per_replan / 1e3), 1),
            "guided_denoise_steps_per_sec": round(
                m["ddim_steps"] / (per_replan / 1e3), 1),
            "device": str(jax.devices()[0]),
            "n_samples": n_samples,
            "ddim_steps": m["ddim_steps"],
            "apf": True,
        },
    }
    if cpu_fallback:
        result["extra"]["platform_fallback"] = (
            "TPU tunnel unavailable after bounded wait; tiny-model CPU "
            "measurement — NOT comparable to the 50 ms v5e target")
        try:  # point at the committed on-chip record for the real number
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "artifacts", "bench_chip.json")) as f:
                chip = json.load(f)
            result["extra"]["last_recorded_chip_measurement"] = {
                "value_ms": chip["value"], "device": chip["device"],
                "measured_utc": chip["measured_utc"]}
        except (OSError, KeyError, ValueError):
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
