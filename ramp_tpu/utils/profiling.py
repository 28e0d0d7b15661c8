"""Profiling helpers — the TPU-native upgrade of the reference's wall-clock
timers (SURVEY.md §5: the reference has only `TimerCUDA` around sampling and
training phases; no profiler integration at all).

`trace()` captures a full XLA/TPU profile viewable in TensorBoard or Perfetto
(`tensorboard --logdir <dir>` -> Profile tab), covering per-kernel device
time, HBM traffic, and host dispatch gaps.
"""
from __future__ import annotations

import contextlib
import os


import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ramp_tpu_profile",
          host_tracer_level: int = 2):
    """Capture a profiler trace around a block:

        with trace("/tmp/prof"):
            x = plan(...)
            jax.block_until_ready(x)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows as a span in the profile)."""
    return jax.profiler.TraceAnnotation(name)
