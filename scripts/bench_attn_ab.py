#!/usr/bin/env python
"""A/B the self-attention lowering on the replan benchmark (real chip).

Reuses bench.py's chained-scan harness (marginal latency of K dependency-
chained replans, one host sync) on `attn_impl` variants of the SAME
math/params.

Measured 2026-08-17 on one v5e: default 19.52 ms, bnhd 19.48 ms — XLA hides
the head-transpose relayouts, so "default" remains the shipped default.

  python scripts/bench_attn_ab.py [--impls default bnhd]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--impls", nargs="+", default=["default", "bnhd", "fused"])
    args = p.parse_args()

    from bench import measure_replan
    from ramp_tpu.planners.static import StaticPlannerConfig
    from ramp_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    for impl in args.impls:
        try:
            m = measure_replan(StaticPlannerConfig(use_apf=True, attn_impl=impl),
                               n_iters=20)
            print(json.dumps({"impl": impl, **m}))
        except Exception as e:
            print(json.dumps({"impl": impl, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
