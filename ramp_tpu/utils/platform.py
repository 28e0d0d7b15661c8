"""Backend selection helper.

`JAX_PLATFORMS` alone is not authoritative in environments where a site hook
registers a backend at interpreter start; the config API after import is.
Call before any other jax usage creates device buffers.
"""
from __future__ import annotations

from typing import Optional

import jax


def set_platform(name: Optional[str]) -> None:
    """name: 'cpu', 'tpu', or None (keep the environment default)."""
    if name:
        jax.config.update("jax_platforms", name)
