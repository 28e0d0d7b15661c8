"""Umbrella CLI: `python -m ramp_tpu <command> [args...]`.

One entry point over the `scripts/` CLIs (the reference requires cd-ing into
`scripts/inference` and editing `main()` literals per run — SURVEY §5
config/flag system; here every surface is one flag-driven command):

    python -m ramp_tpu generate-data --out dataset/demo --n-tasks 8
    python -m ramp_tpu train --dataset dataset/demo --checkpoints ckpt
    python -m ramp_tpu static --dataset dataset/demo --checkpoints ckpt
    python -m ramp_tpu dynamic --dataset dataset/EnvPredator ...
    python -m ramp_tpu 3d --dataset dataset/EnvSmall3D ...
    python -m ramp_tpu serve --dataset dataset/demo --port 8500
    python -m ramp_tpu export-weights --checkpoints ckpt --out w.npz

Commands dispatch to the repo's `scripts/*.py` (located relative to the
package), so `python -m ramp_tpu train ...` and `python scripts/train.py ...`
are byte-for-byte the same program.
"""
from __future__ import annotations

import os
import runpy
import sys

COMMANDS = {
    "generate-data": "generate_data",
    "train": "train",
    "static": "inference_static",
    "dynamic": "inference_dynamic",
    "3d": "inference3d",
    "serve": "serve",
    "export-weights": "export_weights",
    "cross-engine-eval": "cross_engine_eval",
    "profile-static": "profile_static",
    "qcar": "qcar_demo",
}


def _scripts_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    names = ", ".join(list(COMMANDS) + ["bench"])
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__.strip())
        print(f"\ncommands: {names}")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "bench":  # repo-root benchmark, not under scripts/
        script = os.path.join(os.path.dirname(_scripts_dir()), "bench.py")
        sys.argv = ["ramp_tpu bench"] + rest
        runpy.run_path(script, run_name="__main__")
        return 0
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; expected one of: {names}",
              file=sys.stderr)
        return 2
    script = os.path.join(_scripts_dir(), COMMANDS[cmd] + ".py")
    if not os.path.exists(script):
        print(f"{script} not found — the umbrella CLI needs the repo's "
              f"scripts/ directory next to the ramp_tpu package",
              file=sys.stderr)
        return 2
    sys.argv = [f"ramp_tpu {cmd}"] + rest
    runpy.run_path(script, run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
