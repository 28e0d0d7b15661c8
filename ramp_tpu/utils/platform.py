"""Backend selection + persistent compilation cache.

`JAX_PLATFORMS` alone is not authoritative in environments where a site hook
registers a backend at interpreter start; the config API after import is.
Call before any other jax usage creates device buffers.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from typing import Optional

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "ramp_tpu_jax")

# Ports the local TPU relay may listen on (tunneled PJRT backend). Used only
# as a fast-fail pre-check before the authoritative subprocess probe.
_RELAY_PORTS = (8113, 8112, 8117, 8107, 8103, 8102, 8097, 8093, 8092, 8087,
                8083, 8082)


def set_platform(name: Optional[str]) -> None:
    """name: 'cpu', 'tpu', or None (keep the environment default)."""
    if name:
        jax.config.update("jax_platforms", name)


def _relay_listening(timeout_s: float = 1.0) -> bool:
    for port in _RELAY_PORTS:
        s = socket.socket()
        s.settimeout(timeout_s)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def accelerator_available(probe_timeout_s: float = 180.0) -> bool:
    """True if the environment-selected jax backend can actually initialize.

    On this machine the TPU is reached through a TCP relay
    (``JAX_PLATFORMS=axon``); when the relay dies, ``jax.devices()`` blocks
    FOREVER instead of raising, so availability must be probed in a
    subprocess with a hard timeout. A CPU-selected environment is trivially
    available. The check is env-based and safe to call before any backend
    initialization in this process.
    """
    env_platform = os.environ.get("JAX_PLATFORMS", "").lower()
    if env_platform in ("cpu", "cpu,"):
        return True
    # The relay-port pre-check is a fast NEGATIVE only for relayed backends
    # (axon/proxy), where the subprocess probe would otherwise hang until its
    # timeout. A plain `tpu` platform (a real TPU VM) has no local relay —
    # fall through to the authoritative probe, which returns quickly there.
    if ("axon" in env_platform or "proxy" in env_platform) \
            and not _relay_listening():
        return False
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s, capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_accelerator(max_wait_s: float, poll_s: float = 30.0) -> bool:
    """Poll ``accelerator_available`` for up to ``max_wait_s``; True if up."""
    deadline = time.monotonic() + max_wait_s
    while True:
        if accelerator_available():
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(poll_s, max(0.0, deadline - time.monotonic())))


def _host_cpu_fingerprint() -> str:
    """A short stable id of this host's CPU feature set.

    XLA:CPU persists AOT-compiled executables keyed only by program — when a
    VM migrates to a host with a different feature set (observed here:
    avx512/amx deltas after a restart), stale entries load with "could lead
    to SIGILL" errors. Scoping the cache dir by the flags line makes a
    migrated VM start a fresh cache instead of risking illegal instructions.

    Note: cache loads that complain ONLY about `+prefer-no-gather` /
    `+prefer-no-scatter` are a benign false positive — XLA appends those
    pseudo tuning flags at compile time but LLVM's runtime host detection
    never reports them, so the loader's feature check always flags them even
    on the very host that compiled the entry. The real hazard is a mismatch
    in ISA features (avx512*/amx*), which this fingerprint scopes away.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    import hashlib
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "unknown"


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled executables across processes.

    First compiles of the full guided sampler are minutes; the cache brings
    repeat runs (eval after train, re-running bench) down to seconds. The
    directory is scoped per host-CPU fingerprint (see above).
    """
    cache_dir = cache_dir or os.path.join(DEFAULT_CACHE_DIR,
                                          _host_cpu_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
