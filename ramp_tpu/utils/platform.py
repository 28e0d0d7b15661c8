"""Backend selection + persistent compilation cache.

`JAX_PLATFORMS` alone is not authoritative in environments where a site hook
registers a backend at interpreter start; the config API after import is.
Call before any other jax usage creates device buffers.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "ramp_tpu_jax")


def set_platform(name: Optional[str]) -> None:
    """name: 'cpu', 'tpu', or None (keep the environment default)."""
    if name:
        jax.config.update("jax_platforms", name)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled executables across processes.

    First compiles of the full guided sampler are minutes; the cache brings
    repeat runs (eval after train, re-running bench) down to seconds.
    """
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
