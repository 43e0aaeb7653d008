"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ICI.

    The models here are small CNNs (max ~60M params) — batch data
    parallelism is the right decomposition (no TP needed); the mesh axis is
    laid out over all chips so gradient psums ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-host pods (SURVEY §5.8).

    Call once per process before any other jax API on multi-host
    deployments; single-process runs return False and skip
    initialization. Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU-pod auto-detection built into jax.distributed.initialize). After
    this, ``data_mesh()`` spans every chip in the pod and
    ``host_local_batch_to_global`` assembles per-process batches into
    globally-sharded arrays.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None \
            and jax.process_count() == 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_shard_indices(n_items: int,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    """Static per-process slice of a dataset index space: each host loads
    only its shard over DCN (the data side of multi-host DP)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n_items, pc)


def host_local_batch_to_global(mesh: Mesh, batch):
    """Assemble per-process host batches into global batch-sharded arrays.

    Each process passes its local shard (global_batch / process_count
    items); the result is a pytree of jax.Arrays sharded over the mesh's
    data axis spanning all hosts. Single-process meshes reduce to
    shard_batch.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    s = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated (params, opt state)."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
