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
    """Batch-shard the single-image effect over the mesh via shard_map.

    ``effect_fn(params, image_1hw3) -> frames`` becomes
    ``fn(params, images_bhw3) -> frames_b...`` with images and frames
    sharded over the data axis and params replicated.

    shard_map (not vmap): each device traces the UN-vmapped effect body
    over its local shard, so the production Pallas renderers and the
    fused disocclusion fill — which reject vmap (ANY-space refs / scalar
    prefetch) — run unchanged; items beyond one per device go through a
    local ``lax.map``. Zero cross-chip traffic: every chip renders its
    own videos (BASELINE.md production config, 64 images -> 64 videos).
    """
    # check_vma/check_rep off: pallas_call out_shapes carry no varying-
    # manual-axes metadata, and this decomposition has no cross-device
    # collectives to validate anyway
    try:
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    def local_fn(params, imgs):
        return jax.lax.map(lambda img: effect_fn(params, img[None]), imgs)

    sm = shard_map(local_fn, mesh,
                   in_specs=(P(), P(DATA_AXIS)),
                   out_specs=P(DATA_AXIS))
    rep = replicated_sharding(mesh)
    bat = batch_sharding(mesh)
    return jax.jit(sm, in_shardings=(rep, bat), out_shardings=bat)
