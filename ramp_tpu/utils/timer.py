"""Wall-clock timing with device sync.

TPU-native equivalent of the reference `TimerCUDA`
(`deps/torch_robotics/.../torch_timer.py:7-109`): instead of
`torch.cuda.synchronize`, we `jax.block_until_ready` the result being timed.
"""
from __future__ import annotations

import time

import jax


class Timer:
    """Context manager: `with Timer() as t: r = f(); t.sync(r)`; read t.elapsed."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def sync(self, value):
        jax.block_until_ready(value)
        return value

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        return False


def timed(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, seconds)."""
    start = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - start
