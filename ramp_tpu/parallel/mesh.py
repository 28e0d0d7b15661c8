"""Device mesh and sharding utilities — the SPMD replacement for the
reference's NCCL process-per-GPU data parallelism.

The reference trains with PyTorch DDP: one process per GPU spawned via
`mp.spawn` (`scripts/train/trainddp.py:237-243`), an NCCL process group with a
MASTER_ADDR/port-retry rendezvous (`:25-65`), a `DistributedSampler` to shard
the dataset (`mpd/trainerddp/train_loaders.py:67-71`) and implicit bucket
all-reduce on gradients.

The TPU-native equivalent is SPMD over a `jax.sharding.Mesh`:

  * ONE program; `jax.jit` with `NamedSharding`s places the batch across
    devices and XLA inserts the gradient all-reduce (psum over ICI) — there
    is no explicit communication code to write at all.
  * Multi-host (multi-pod over DCN) reuses the same mesh; the only addition
    is `jax.distributed.initialize()` at startup and process-strided data
    loading (`process_shard_indices`, the DistributedSampler analog).

The trajectory-sampling batch at inference shards the same way: the `data`
axis of the mesh carries the n_samples population (SURVEY.md §2.3 — the
reference's only scaling axis).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Tuple[int, ...]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: a 1-D `data` mesh — the model is ~10-50 MB (SURVEY.md §2.3), so
    tensor/pipeline sharding would only add collective latency; data parallel
    over the batch is the right decomposition for every RAMP workload.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, schedules)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays with the leading axis sharded over `axis`.

    The DistributedSampler analog for device placement: every leaf's first
    dimension must be divisible by the mesh axis size.
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def process_shard_indices(n_items: int, shuffle_rng: Optional[np.random.Generator],
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    """Per-process strided index shard — the `DistributedSampler` equivalent
    (ref `mpd/trainerddp/train_loaders.py:67-71`) for multi-host training.

    Each host loads only its stride of the (optionally shuffled) index set;
    within a host, `shard_batch` splits the loaded batch over local devices.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx = np.arange(n_items)
    if shuffle_rng is not None:
        shuffle_rng.shuffle(idx)
    # pad to a multiple of process_count so every host sees equal length
    # (DistributedSampler pads by wrapping, same here)
    pad = (-len(idx)) % pc
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[pi::pc]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init. Replaces the reference's NCCL MASTER_ADDR/port-retry
    rendezvous dance (`scripts/train/trainddp.py:25-65`): JAX's coordination
    service handles rendezvous, and collectives ride ICI within a slice and
    DCN across slices without further configuration.

    No-op in single-process runs (the common case on one chip / CI).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def coordination_barrier(name: str, timeout_s: int = 600) -> None:
    """Align all processes via the coordination service (pure gRPC).

    The first cross-process COLLECTIVE creates the CPU Gloo context under a
    fixed ~30 s key-value deadline; on a loaded single-core host two
    processes can easily be >30 s apart in imports/compilation, which turns
    that first collective into `Gloo context initialization failed:
    DEADLINE_EXCEEDED`. A coordination-service barrier has a long
    configurable timeout and no Gloo dependency, so calling it immediately
    before the first sharded `device_put` bounds the skew the Gloo deadline
    has to absorb to microseconds. No-op in single-process runs.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed  # no public barrier API yet
    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)
