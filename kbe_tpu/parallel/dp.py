"""Data-parallel execution wrappers.

Training: the loss is a batch mean, so sharding the batch axis and jitting
under the mesh makes XLA insert the gradient all-reduce (psum over ICI)
automatically — the TPU-native replacement for the DDP/NCCL layer the
reference never had.

Inference: the production config (BASELINE.md: 64 images -> 64 videos on a
v5p-8 pod slice) shards the image batch; every chip renders its own videos
with zero cross-chip traffic.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kbe_tpu.parallel.mesh import DATA_AXIS, batch_sharding, \
    replicated_sharding


def data_parallel_step(step_fn: Callable, mesh: Mesh,
                       donate_state: bool = True) -> Callable:
    """jit ``step_fn(state, batch) -> (state, metrics)`` over the mesh.

    ``state`` replicated, ``batch`` leaves sharded on their leading axis.
    """
    rep = replicated_sharding(mesh)
    bat = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bat),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def batch_parallel_effect(effect_fn: Callable, mesh: Mesh) -> Callable:
    """Batch-shard the single-image effect over the mesh.

    ``effect_fn(params, image_1hw3) -> frames`` becomes
    ``fn(params, images_bhw3) -> frames_b...`` with images and frames
    sharded over the data axis and params replicated.
    """
    vf = jax.vmap(lambda p, img: effect_fn(p, img[None]),
                  in_axes=(None, 0))
    rep = replicated_sharding(mesh)
    bat = batch_sharding(mesh)
    return jax.jit(vf, in_shardings=(rep, bat), out_shardings=bat)
