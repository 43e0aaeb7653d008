"""Shared trained-weights bench-scene builder for the profiling tools.

Builds the same (cloud, anchor) state the pipeline's front-end produces on
the procedural demo scene with the deterministic bench weights — the jit
program is identical across tools so the persistent compile cache hits.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    """min-of-reps wall ms; forces a host fetch (axon's block_until_ready
    does not actually block)."""
    out = jax.block_until_ready(fn(*args))
    del out
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def enable_cache():
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build_bench_cloud(size, dtype=jnp.bfloat16):
    """-> (cloud_xyz, cloud_data5, cloud_valid, anchor, camera, effect,
    zoom) for the trained-weights demo scene at ``size``^2."""
    h = w = size

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.geometry import (depth_range, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.ops.resize import resize_to_max
    from kbe_tpu.pipeline.inpaint_flow import (InpaintModels,
                                               pointcloud_inpainting)
    from kbe_tpu.pipeline.kenburns import compute_pose_shift
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image

    camera = CameraConfig()
    effect = EffectConfig()
    zoom = ZoomSettings.default_3d(w, h)
    ckpt = find_bench_weights()
    assert ckpt, "run tools/make_bench_weights.py first"
    params = jax.device_put(load_pipeline_params(ckpt))
    image = jnp.asarray(demo_scene_image(h, w), jnp.float32)[None]

    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)
    ctx_def = ContextNet(dtype=dtype)
    inp_def = Inpaint(dtype=dtype)

    @jax.jit
    def frontend(params, image):
        resized = resize_to_max(image, max(h, w) // 2)
        semantics = sem_def.apply(params.semantics, resized)
        disp_half = disp_def.apply(params.disparity, resized, semantics)
        disparity = refine_def.apply(params.refine, image, disp_half)
        disparity = disparity - jnp.minimum(jnp.min(disparity), 0.0)
        disparity = disparity / jnp.max(disparity) * camera.baseline
        depth = disparity_to_depth(disparity, camera.focal, camera.baseline)
        points = depth_to_points(depth[..., 0], camera.focal)
        anchor = depth_range(depth[0, ..., 0], effect.depth_range_margin)

        grids_xyz = [points.reshape(h, w, 3)]
        grids_data = [jnp.concatenate([image[0], disparity[0], depth[0]],
                                      axis=-1)]
        grids_valid = [jnp.ones((h, w), jnp.float32)]

        def _net_apply(p, data, masks):
            img, dsp = inp_def.apply(p, data, masks)
            return img, dsp, masks

        models = InpaintModels(
            context=partial(ctx_def.apply, params.context),
            net=partial(_net_apply, params.inpaint))
        for s in (0.0, 1.0):
            shift = compute_pose_shift(s, camera.focal, anchor, zoom,
                                       camera, w, h)
            inp = pointcloud_inpainting(
                models, image, disparity, effect.inpaint_overshoot * shift,
                camera, camera.focal, effect.validity_threshold,
                splat_method="banded", relayout_context=True)
            grids_xyz.append(inp["points"].reshape(h, w, 3))
            grids_data.append(jnp.concatenate(
                [inp["image"][0], inp["disparity"][0], inp["depth"][0]],
                axis=-1))
            grids_valid.append(
                (inp["existing"][0, ..., 0] == 0.0).astype(jnp.float32))
        return (jnp.stack(grids_xyz), jnp.stack(grids_data),
                jnp.stack(grids_valid), anchor)

    cloud_xyz, cloud_data, cloud_valid, anchor = jax.block_until_ready(
        frontend(params, image))
    return cloud_xyz, cloud_data, cloud_valid, anchor, camera, effect, zoom
