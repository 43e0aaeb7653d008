"""Stage attribution for the POSED frame loop on the bench scene.

Splits the per-frame cost into: pose shift solve | routing prepass
(bounds + meta + CSR sort) | posed splat kernel | gated fill phase 1 |
full fill | crop/resize tail — each measured as an amortized lax.map over
n poses, exactly how bench.py's frame loop runs. Also measures the kernel
with routing precomputed for ALL poses before the loop (batched routing),
to separate the sort's cost from the kernel's.

Usage: python tools/profile_posed.py [size] [n_poses]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, reps=4):
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
    n_poses = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h = w = size

    from functools import partial

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.discfill_pallas import (_fill_single_gated,
                                             fill_disocclusion_pallas)
    from kbe_tpu.ops.geometry import (depth_range, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.ops.resize import (crop_rect_subpix_mm, resize_bilinear,
                                    resize_to_max)
    from kbe_tpu.ops.splat_posed import (pose_routing, prepare_banded_scene,
                                         render_scene_posed)
    from kbe_tpu.pipeline.inpaint_flow import (InpaintModels,
                                               pointcloud_inpainting)
    from kbe_tpu.pipeline.kenburns import (KenBurnsPipeline,
                                           compute_pose_shift)

    camera = CameraConfig()
    effect = EffectConfig()
    zoom = ZoomSettings.default_3d(w, h)
    dtype = jnp.bfloat16
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), h, w,
                                   effect=effect, dtype=dtype)
    params = pipe.params
    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)
    ctx_def = ContextNet(dtype=dtype)
    inp_def = Inpaint(dtype=dtype)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)

    @jax.jit
    def frontend(params, image):
        resized = resize_to_max(image, max(h, w) // 2)
        semantics = sem_def.apply(params.semantics, resized)
        disp_half = disp_def.apply(params.disparity, resized, semantics)
        disparity = refine_def.apply(params.refine, image, disp_half)
        disparity = disparity - jnp.minimum(jnp.min(disparity), 0.0)
        disparity = disparity / jnp.max(disparity) * camera.baseline
        depth = disparity_to_depth(disparity, camera.focal,
                                   camera.baseline)
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
                models, image, disparity,
                effect.inpaint_overshoot * shift, camera, camera.focal,
                effect.validity_threshold, splat_method="banded",
                relayout_context=True)
            grids_xyz.append(inp["points"].reshape(h, w, 3))
            grids_data.append(jnp.concatenate(
                [inp["image"][0], inp["disparity"][0], inp["depth"][0]],
                axis=-1))
            grids_valid.append(
                (inp["existing"][0, ..., 0] == 0.0).astype(jnp.float32))
        frame_data = jnp.concatenate(
            [jnp.stack(grids_data)[..., 0:3],
             jnp.stack(grids_data)[..., 4:5]], axis=-1)
        scene = prepare_banded_scene(jnp.stack(grids_xyz), frame_data,
                                     jnp.stack(grids_valid))
        return scene, anchor

    t0 = time.perf_counter()
    scene, anchor = jax.block_until_ready(frontend(params, image))
    print(f"frontend(+scene pack) compile+run: "
          f"{time.perf_counter() - t0:.1f} s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(frontend(params, image))
        _ = float(jnp.sum(out[0].records[:4, 0, 0]))
        ts.append(time.perf_counter() - t0)
    print(f"frontend: {min(ts) * 1e3:.1f} ms")

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

    def body(args, upto, routing=None):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        if upto == "shift":
            return jnp.sum(shift)
        if upto == "routing":
            r = pose_routing(scene, shift, focal, h, w)
            return (jnp.sum(r.offsets[-1:]).astype(jnp.float32)
                    + r.meta1[0] + r.meta2[0])
        render, weight, overflow = render_scene_posed(
            scene, shift, focal, h, w, camera.baseline, routing=routing)
        if upto == "render":
            return jnp.sum(render[..., 0]) + overflow
        render_depth = render[..., 3:4] * (weight > 0.0)
        if upto == "fillp1":
            f1, unresolved = _fill_single_gated(
                render[0], render_depth[0], effect.fill_march_phase1,
                False, roi)
            return (jnp.sum(f1[..., 0])
                    + jnp.sum(unresolved.astype(jnp.float32)))
        filled = fill_disocclusion_pallas(
            render, render_depth, effect.fill_march_steps,
            phase1_steps=effect.fill_march_phase1, roi=roi)
        if upto == "fill":
            return jnp.sum(filled[..., 0])
        rgb = jnp.floor(jnp.clip(filled[..., 0:3] * 255.0, 0.0, 255.0))
        patch = crop_rect_subpix_mm(rgb[0], max_cw, max_ch, w / 2.0,
                                    h / 2.0)
        patch = jnp.clip(jnp.round(patch), 0.0, 255.0)
        out = resize_bilinear(patch[None], h, w)[0]
        return jnp.sum(jnp.clip(jnp.round(out), 0.0, 255.0))

    print(f"== amortized map profile (POSED path), size {size}, "
          f"{n_poses} poses, {scene.px.shape[0]} grids ==")
    prev = 0.0
    for upto in ("shift", "routing", "render", "fillp1", "fill", "full"):
        fn = jax.jit(lambda xs, u=upto: lax.map(
            lambda a: body(a, u), xs, batch_size=None))
        ms = timeit(fn, (steps, focals))
        per = ms / n_poses
        print(f"upto {upto:8s}: {ms:8.2f} ms total  {per:7.2f} ms/frame  "
              f"(+{per - prev:6.2f})")
        prev = per

    # kernel with routing hoisted out of the loop (batched prepass)
    @jax.jit
    def batched_routing(xs):
        return lax.map(lambda a: pose_routing(
            scene, compute_pose_shift(a[0], a[1], anchor, zoom, camera,
                                      w, h), a[1], h, w), xs)

    routings = jax.block_until_ready(batched_routing((steps, focals)))
    ms = timeit(batched_routing, (steps, focals))
    print(f"batched routing (outside loop): {ms:8.2f} ms total  "
          f"{ms / n_poses:7.2f} ms/frame")

    def body_pre(args):
        (step, focal), r = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        render, weight, overflow = render_scene_posed(
            scene, shift, focal, h, w, camera.baseline, routing=r)
        return jnp.sum(render[..., 0]) + overflow

    fn = jax.jit(lambda xs, rs: lax.map(body_pre, ((xs[0], xs[1]), rs)))
    ms = timeit(fn, (steps, focals), routings)
    print(f"render w/ precomputed routing: {ms:8.2f} ms total  "
          f"{ms / n_poses:7.2f} ms/frame")


if __name__ == "__main__":
    main()
