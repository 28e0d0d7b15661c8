#!/usr/bin/env python
"""Beyond-parity byte-count probe: marginal replan latency vs U-Net width.

The round-2..4 roofline thread concluded the 25 ms marginal replan is
HBM-byte-bound at shapes too small to stream at peak bandwidth, and that the
remaining ~3x to the 8.8 ms memory speed-of-light needs byte-count
reductions — a narrower net, fewer steps, or int8 — i.e. architecture
changes the parity configuration can't make (RESULTS.md "roofline thread").
This measures the first named lever: a bf16-narrow U-Net (unet_input_dim 24
and 16 vs the parity 32) through the same dependency-chained marginal-replan
harness as bench.py. Latency is weight-independent (random init), so this
answers the latency half of the student question before any distillation is
spent; quality of an actually-trained narrow student is a separate
measurement.

  python scripts/bench_narrow_ab.py --out artifacts/bench_narrow_ab.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dims", type=int, nargs="+", default=[32, 24, 16])
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from ramp_tpu.utils.platform import enable_compilation_cache, set_platform
    set_platform(args.platform)
    enable_compilation_cache()
    import jax

    from bench import measure_replan
    from ramp_tpu.planners.static import StaticPlannerConfig

    rows = []
    for dim in args.dims:
        cfg = StaticPlannerConfig(use_apf=True, unet_input_dim=dim)
        m = measure_replan(cfg, n_samples=args.n_samples)
        row = {"unet_input_dim": dim, **m}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"rows": rows, "device": str(jax.devices()[0]),
           "note": "random weights; marginal-chain methodology of bench.py"}
    print(json.dumps(out))
    if args.out:
        json.dump(out, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
