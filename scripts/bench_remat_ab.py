#!/usr/bin/env python
"""A/B `eps_remat` (jax.checkpoint on the energy gradient) on the replan bench.

The round-2 roofline showed the 64-traj DDIM-5+APF replan at 4.9% of peak
FLOPs and 35% of peak HBM: storing forward activations for the backward pass
is pure HBM traffic, and recomputing them is nearly free at this FLOP
utilization. This measures whether the trade pays on the real chip.

  python scripts/bench_remat_ab.py
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-iters", type=int, default=20)
    args = p.parse_args()

    from bench import measure_replan
    from ramp_tpu.planners.static import StaticPlannerConfig
    from ramp_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    for remat in (False, True):
        try:
            cfg = StaticPlannerConfig(use_apf=True, eps_remat=remat)
            m = measure_replan(cfg, n_iters=args.n_iters)
            print(json.dumps({"eps_remat": remat, **m}))
        except Exception as e:
            print(json.dumps({"eps_remat": remat, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
