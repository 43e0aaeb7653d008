"""Parallel-layer tests: mesh helpers, multi-host entry points (their
single-process fast paths — the environment has one host), and the
shard_map batch-parallel effect on the production kernel path.

The reference has no distributed layer at all (SURVEY §2.9/§5.8); these
cover the new TPU-native design in kbe_tpu/parallel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kbe_tpu.parallel import data_mesh, replicate, shard_batch
from kbe_tpu.parallel.mesh import (
    host_local_batch_to_global,
    initialize_multihost,
    process_shard_indices,
)


def test_initialize_multihost_single_process_noop():
    # one process, no coordinator env: must decline to initialize (and
    # therefore be safe to call unconditionally at CLI startup)
    assert initialize_multihost() is False


def test_process_shard_indices_partition():
    # the per-host dataset shards partition the index space exactly
    parts = [process_shard_indices(103, process_index=i, process_count=4)
             for i in range(4)]
    allidx = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allidx, np.arange(103))
    assert all(len(p) in (25, 26) for p in parts)


def test_host_local_batch_to_global_single_process():
    # jax.process_count() == 1 here: the fallback path must produce
    # batch-sharded global arrays identical to shard_batch
    mesh = data_mesh(8)
    batch = {"image": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(
        8, 4, 4, 3), "disparity": np.ones((8, 4, 4, 1), np.float32)}
    with mesh:
        out = host_local_batch_to_global(mesh, batch)
        want = shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(want[k]))
        assert out[k].sharding == want[k].sharding
        assert len(out[k].sharding.device_set) == 8


@pytest.mark.slow
def test_batch_parallel_effect_production_path_8dev():
    """VERDICT r3 #5: the shard_map batch-parallel effect must trace the
    PRODUCTION kernels (banded/posed splat + fused Pallas fill — both
    reject vmap) and shard images/frames over the data axis."""
    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.parallel import batch_parallel_effect
    from kbe_tpu.pipeline.kenburns import KenBurnsPipeline, build_effect_fn

    h = w = 32
    mesh = data_mesh(8)
    effect = EffectConfig(num_steps=2, fill_march_steps=8,
                          fill_march_phase1=4, fill_phase0=2,
                          inpaint=False)
    params = KenBurnsPipeline.create(jax.random.PRNGKey(0), h, w,
                                     effect=effect).params
    fn = build_effect_fn(h, w, ZoomSettings.default_3d(w, h),
                         CameraConfig(), effect)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (8, h, w, 3)).astype(np.float32)
    with mesh:
        batch_fn = batch_parallel_effect(fn, mesh)
        frames = batch_fn(replicate(mesh, params),
                          shard_batch(mesh, images))
        frames = jax.block_until_ready(frames)
    assert frames.shape == (8, 2, h, w, 3)
    assert len(frames.sharding.device_set) == 8
    # every image renders exactly as its single-device program would
    want = jax.jit(fn)(params, jnp.asarray(images[3:4]))
    np.testing.assert_allclose(np.asarray(frames[3]), np.asarray(want),
                               atol=1e-5)
