"""Stage attribution + routing stats on the TRAINED-WEIGHT bench scene.

bench.py r04 moved to trained weights + the procedural demo image; this
diagnostic explains its per-frame cost: overwork-chunk census per pose
(what the bounded scatter epilogue will absorb), then amortized lax.map
stage deltas exactly as the pipeline composes them (posed splat with/
without overflow_cap, phase-0 resolver, gated fill, crop tail).

Usage: python tools/diag_trained.py [size] [n_poses]
"""

import os
import sys
import time

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

    from functools import partial

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.discfill import resolve_thin_holes
    from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas
    from kbe_tpu.ops.geometry import (depth_range, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.ops.resize import (crop_rect_subpix_mm, resize_bilinear,
                                    resize_to_max)
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

    t0 = time.perf_counter()
    cloud_xyz, cloud_data, cloud_valid, anchor = jax.block_until_ready(
        frontend(params, image))
    print(f"frontend compile+run: {time.perf_counter() - t0:.1f} s",
          flush=True)
    print(f"frontend: {timeit(frontend, params, image):.1f} ms", flush=True)

    frame_data = jnp.concatenate([cloud_data[..., 0:3],
                                  cloud_data[..., 4:5]], axis=-1)
    scene = prepare_banded_scene(cloud_xyz, frame_data, cloud_valid)

    # ---- overwork census per pose ----
    @partial(jax.jit, static_argnames=("cap",))
    def census(step, cap):
        shift = compute_pose_shift(step, jnp.float32(camera.focal), anchor,
                                   zoom, camera, w, h)
        r = pose_routing(scene, shift, jnp.float32(camera.focal), h, w,
                         overflow_cap=cap)
        return r.n_over, r.overflow

    for step in (0.0, 0.5, 1.0):
        n_over, ovf = census(jnp.float32(step), 1024)
        print(f"step {step}: overwork chunks {int(n_over)} "
              f"(of {scene.records.shape[0]}), overflow {bool(ovf)}",
              flush=True)

    # ---- amortized stage deltas ----
    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)
    rx0 = max(0, int(np.floor(w / 2.0 - (max_cw - 1) / 2.0)) - 2)
    rx1 = min(w, int(np.floor(w / 2.0 + (max_cw - 1) / 2.0)) + 3)
    ry0 = max(0, int(np.floor(h / 2.0 - (max_ch - 1) / 2.0)) - 2)
    ry1 = min(h, int(np.floor(h / 2.0 + (max_ch - 1) / 2.0)) + 3)
    roi = (ry0, ry1, rx0, rx1)
    if roi == (0, h, 0, w):
        roi = None

    steps = jnp.linspace(0.0, 1.0, n_poses)
    focals = jnp.full((n_poses,), camera.focal, jnp.float32)

    def body(args, upto, cap, phase0):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        if upto == "shift":
            return jnp.sum(shift)
        render, weight, overflow = render_scene_posed(
            scene, shift, focal, h, w, camera.baseline, overflow_cap=cap)
        if upto == "render":
            return jnp.sum(render[..., 0]) + overflow
        render_depth = render[..., 3:4] * (weight > 0.0)
        if upto == "fillp0":
            f0, unresolved = resolve_thin_holes(render[0], render_depth[0],
                                                2, roi)
            return (jnp.sum(f0[..., 0])
                    + jnp.sum(unresolved.astype(jnp.float32)))
        filled = fill_disocclusion_pallas(
            render, render_depth, effect.fill_march_steps,
            phase1_steps=effect.fill_march_phase1, roi=roi,
            phase0_steps=phase0)
        if upto == "fill":
            return jnp.sum(filled[..., 0])
        rgb = jnp.floor(jnp.clip(filled[..., 0:3] * 255.0, 0.0, 255.0))
        patch = crop_rect_subpix_mm(rgb[0], max_cw, max_ch, w / 2.0,
                                    h / 2.0)
        patch = jnp.clip(jnp.round(patch), 0.0, 255.0)
        out = resize_bilinear(patch[None], h, w)[0]
        return jnp.sum(jnp.clip(jnp.round(out), 0.0, 255.0))

    print(f"== amortized stage deltas (trained scene), size {size}, "
          f"{n_poses} poses ==", flush=True)
    cfgs = [
        ("shift", 0, 0), ("render", 0, 0), ("render", 256, 0),
        ("fillp0", 256, 0), ("fill", 256, 0), ("fill", 256, 2),
        ("full", 256, 2),
    ]
    for upto, cap, p0 in cfgs:
        fn = jax.jit(lambda xs, u=upto, c=cap, p=p0: lax.map(
            lambda a: body(a, u, c, p), xs, batch_size=None))
        ms = timeit(fn, (steps, focals))
        print(f"upto {upto:7s} cap={cap:3d} phase0={p0}: "
              f"{ms / n_poses:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
