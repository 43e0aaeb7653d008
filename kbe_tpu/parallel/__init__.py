"""Device-mesh parallelism.

The reference is strictly single-GPU (no DataParallel/NCCL anywhere; see
SURVEY.md §2.9). This package is the TPU-native scale-out the reference
lacks: a 1-D data mesh over ICI, batch-sharded inference (the 64-image ->
64-video production config) and data-parallel training with XLA-inserted
gradient all-reduces.
"""

from kbe_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    host_local_batch_to_global,
    initialize_multihost,
    process_shard_indices,
    replicate,
    replicated_sharding,
    shard_batch,
)
from kbe_tpu.parallel.dp import data_parallel_step, batch_parallel_effect

__all__ = [
    "batch_sharding",
    "data_mesh",
    "host_local_batch_to_global",
    "initialize_multihost",
    "process_shard_indices",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "data_parallel_step",
    "batch_parallel_effect",
]
