"""Two-process data-parallel training: identical global losses.

Promotes `scripts/demo_multihost.sh` to a test (it was previously only a
manual demo): two OS processes form one global mesh via
`jax.distributed.initialize` (the DCN-topology analog of the reference's
NCCL rendezvous, `scripts/train/trainddp.py:25-65`), the loss is
all-reduced over the global batch, and both processes must log IDENTICAL
per-step metrics — agreement means the sharded train step really spans
both processes.

Runs in subprocesses because `jax.distributed.initialize` cannot share
the test process's already-initialized single-process backend.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_identical_losses(tmp_path):
    ds = str(tmp_path / "ds")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/generate_data.py"),
         "--out", ds, "--n-tasks", "3", "--n-trajs", "6",
         "--horizon", "16", "--points-per-obstacle", "16"],
        check=True, cwd=REPO, timeout=300)

    port = _free_port()
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    # each process must NOT inherit the virtual 8-device mesh the test
    # conftest configures for this process — give each its own single
    # CPU device so the 2-process global mesh has 2 devices
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    logs = [str(tmp_path / f"p{i}.jsonl") for i in (0, 1)]
    common = [sys.executable, os.path.join(REPO, "scripts/train.py"),
              "--dataset", ds, "--steps", "10", "--batch-size", "8",
              "--n-diffusion-steps", "10", "--steps-per-dispatch", "5",
              "--unet-dim", "8", "--dim-mults-option", "0",
              "--platform", "cpu", "--coordinator", f"localhost:{port}",
              "--num-processes", "2"]
    procs = [subprocess.Popen(
        common + ["--process-id", str(i), "--log-file", logs[i]],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in (0, 1)]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode()[-2000:]

    rows = []
    for path in logs:
        with open(path) as f:
            rows.append([{k: v for k, v in json.loads(line).items()
                          if k != "time_per_step"} for line in f])
    assert rows[0], "process 0 logged no steps"
    # every per-step metric (loss, grad-norm, step) identical across the
    # two processes — the all-reduced global loss, not a local one
    assert rows[0] == rows[1]
