"""Split the posed splat kernel's per-frame cost (trained bench scene).

Times, per pose, amortized over a lax.map like the pipeline:
  * the XLA routing prepass alone
  * the kernel with passes="a" (zee + degrid only)
  * the kernel with passes="b" (accumulate only, sentinel z-buffer)
  * the full renderer ("ab")
and a payload-channel sweep (c=1 vs c=4) to isolate pass B's per-channel
cost. Pass timings are profiling-only configurations (wrong output).

Usage: python tools/profile_posed_split.py [size] [n_poses]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    del out
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_poses = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    h = w = size
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.geometry import (depth_range, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.ops.resize import resize_to_max
    from kbe_tpu.ops.splat_posed import (pose_routing, prepare_banded_scene,
                                         render_scene_posed)
    from kbe_tpu.pipeline.inpaint_flow import (InpaintModels,
                                               pointcloud_inpainting)
    from kbe_tpu.pipeline.kenburns import compute_pose_shift
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image

    camera = CameraConfig()
    effect = EffectConfig()
    zoom = ZoomSettings.default_3d(w, h)
    dtype = jnp.bfloat16
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
    frame_data = jnp.concatenate([cloud_data[..., 0:3],
                                  cloud_data[..., 4:5]], axis=-1)
    scene = prepare_banded_scene(cloud_xyz, frame_data, cloud_valid)
    scene1 = prepare_banded_scene(cloud_xyz, frame_data[..., :1],
                                  cloud_valid)

    steps = jnp.linspace(0.0, 1.0, n_poses)
    focals = jnp.full((n_poses,), camera.focal, jnp.float32)

    def shift_of(step, focal):
        return compute_pose_shift(step, focal, anchor, zoom, camera, w, h)

    def run(mode, sc):
        def body(args):
            step, focal = args
            shift = shift_of(step, focal)
            if mode == "routing":
                r = pose_routing(sc, shift, focal, h, w, overflow_cap=256)
                return (jnp.sum(r.offsets) + jnp.sum(r.meta1)
                        + jnp.sum(r.meta2) + jnp.sum(r.chunk_ids))
            render, weight, overflow = render_scene_posed(
                sc, shift, focal, h, w, camera.baseline,
                overflow_cap=256, passes=mode)
            return jnp.sum(render[..., 0]) + jnp.sum(weight) + overflow

        return jax.jit(lambda xs: lax.map(body, xs))

    base = timeit(run("routing", scene), (steps, focals)) / n_poses
    print(f"routing prepass only:        {base:8.2f} ms/frame", flush=True)
    for mode in ("a", "b", "ab"):
        ms = timeit(run(mode, scene), (steps, focals)) / n_poses
        print(f"passes={mode:2s} (c=4):           {ms:8.2f} ms/frame",
              flush=True)
    for mode in ("b", "ab"):
        ms = timeit(run(mode, scene1), (steps, focals)) / n_poses
        print(f"passes={mode:2s} (c=1):           {ms:8.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
