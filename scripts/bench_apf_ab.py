#!/usr/bin/env python
"""A/B the static-APF backend (XLA-fused vs Pallas kernel) on the replan bench.

Reuses bench.py's chained-scan harness (marginal latency of K dependency-
chained replans, one host sync) with identical planner math/params; only
`APFParams.backend` differs. The Pallas kernel (`guidance/apf_pallas.py`)
fuses nearest-obstacle query + windowed repulsion into one VMEM-resident
kernel; the XLA path leaves fusion to the compiler.

  python scripts/bench_apf_ab.py [--backends xla pallas]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backends", nargs="+", default=["xla", "pallas"])
    args = p.parse_args()

    from bench import measure_replan
    from ramp_tpu.guidance.apf import APFParams
    from ramp_tpu.planners.static import StaticPlannerConfig
    from ramp_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    for backend in args.backends:
        try:
            cfg = StaticPlannerConfig(
                use_apf=True, apf=APFParams(backend=backend))
            m = measure_replan(cfg, n_iters=20)
            print(json.dumps({"backend": backend, **m}))
        except Exception as e:
            print(json.dumps({"backend": backend, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
