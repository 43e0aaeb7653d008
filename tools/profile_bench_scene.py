"""Amortized per-stage frame costs on the BENCH scene.

tools/profile_map.py measures the frame-body stages on a hand-built
"realistic" scene. This variant builds the cloud exactly the way
bench.py's pipeline does — random-weight CNN frontend + the two
inpaint-bootstrap extensions — so the stage numbers connect directly to
the headline frames/s. The banded kernel's cost scales with per-chunk
displacement *spread*, which depends on the depth statistics the nets
produce, not on any synthetic assumption.

Usage: python tools/profile_bench_scene.py [size] [n_poses]
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
        # tunnel backends may not block; force a host fetch
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_poses = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h = w = size

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.geometry import (apply_shift, depth_range,
                                      depth_to_points, disparity_to_depth)
    from kbe_tpu.ops.resize import (crop_rect_subpix_mm, resize_bilinear,
                                    resize_to_max)
    from kbe_tpu.ops.splat_banded import render_grids_banded
    from kbe_tpu.ops.discfill_pallas import (_fill_single_fused,
                                             _fill_single_pallas,
                                             fill_disocclusion_pallas)
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

    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics

    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)
    ctx_def = ContextNet(dtype=dtype)
    inp_def = Inpaint(dtype=dtype)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)

    @jax.jit
    def frontend(params, image):
        from functools import partial

        resized = resize_to_max(image, max(h, w) // 2)
        semantics = sem_def.apply(params.semantics, resized)
        disp_half = disp_def.apply(params.disparity, resized, semantics)
        disparity = refine_def.apply(params.refine, image, disp_half)
        disparity = disparity - jnp.minimum(jnp.min(disparity), 0.0)
        disparity = disparity / jnp.max(disparity) * camera.baseline
        depth = disparity_to_depth(disparity, camera.focal, camera.baseline)
        points = depth_to_points(depth[..., 0], camera.focal)
        anchor = depth_range(depth[0, ..., 0], effect.depth_range_margin)

        grids_xyz = [points]
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
    print(f"frontend compile+run: {time.perf_counter() - t0:.1f} s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(frontend(params, image))
        _ = float(jnp.sum(out[0][:, ::256, ::256, 0]))
        ts.append(time.perf_counter() - t0)
    print(f"frontend: {min(ts) * 1e3:.1f} ms")

    # spread statistics of the bench scene (what the kernel cost tracks)
    from kbe_tpu.ops import splat_banded as sb
    from kbe_tpu.ops.geometry import project_points

    @jax.jit
    def spread_stats(xyz, valid, step):
        focal = jnp.float32(camera.focal)
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        xyz = apply_shift(xyz, shift)
        u, v, ok = project_points(xyz, h, w, focal)
        ok = ok & (valid > 0.0)
        hp = sb._ceil_to(h, sb.CHUNK_H)
        wp = sb._ceil_to(w, sb.CHUNK_W)
        padding = ((0, 0), (0, hp - h), (0, wp - w))
        yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        dyf = jnp.floor(v) - yy
        dxf = jnp.floor(u) - xx
        okp = jnp.pad(ok, padding)
        pad_dy = jnp.pad(jnp.where(ok, dyf, 0.0), padding)
        pad_dx = jnp.pad(jnp.where(ok, dxf, 0.0), padding)
        big = jnp.float32(3e38)
        dy_lo = sb._chunk_minmax(pad_dy, okp, jnp.min, big)
        dy_hi = sb._chunk_minmax(pad_dy, okp, jnp.max, -big)
        dx_lo = sb._chunk_minmax(pad_dx, okp, jnp.min, big)
        dx_hi = sb._chunk_minmax(pad_dx, okp, jnp.max, -big)
        empty = dy_lo > 1e38
        sy = jnp.where(empty, 0.0, dy_hi - dy_lo)
        sx = jnp.where(empty, 0.0, dx_hi - dx_lo)
        y_cnt = jnp.maximum(sy + 2, 0)
        xw_cnt = jnp.where(empty, 0.0, (sx + 1) // sb.BAND_W + 1)
        work = y_cnt * xw_cnt
        return (jnp.sum(work), jnp.max(work), jnp.mean(sy), jnp.max(sy),
                jnp.mean(sx), jnp.max(sx))

    for step in (0.0, 0.5, 1.0):
        tot, mx, msy, xsy, msx, xsx = [
            float(x) for x in spread_stats(cloud_xyz, cloud_valid, step)]
        print(f"step {step}: window-rows total {tot:.0f} max/chunk {mx:.0f}"
              f"  spread_y mean {msy:.1f} max {xsy:.0f}"
              f"  spread_x mean {msx:.1f} max {xsx:.0f}")

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

    def body(args, upto):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        xyz = apply_shift(cloud_xyz, shift)
        if upto == "shift":
            return jnp.sum(xyz[..., 0])
        data = jnp.concatenate([cloud_data[..., 0:3], cloud_data[..., 4:5]],
                               axis=-1)
        render, weight, overflow = render_grids_banded(
            xyz, data, h, w, focal, camera.baseline, valid=cloud_valid)
        if upto == "render":
            return jnp.sum(render[..., 0]) + overflow
        render_depth = render[..., 3:4] * (weight > 0.0)
        if upto == "fillp1":
            f1, unresolved = _fill_single_fused(
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

    print(f"== amortized map profile (bench scene), size {size}, "
          f"{n_poses} poses, {cloud_xyz.shape[0]} grids ==")
    prev = 0.0
    for upto in ("shift", "render", "fillp1", "fill", "full"):
        fn = jax.jit(lambda xs, u=upto: lax.map(
            lambda a: body(a, u), xs, batch_size=None))
        ms = timeit(fn, (steps, focals))
        per = ms / n_poses
        print(f"upto {upto:8s}: {ms:8.2f} ms total  {per:7.2f} ms/frame  "
              f"(+{per - prev:6.2f})")
        prev = per

    # overflow / phase-2 incidence across the trajectory
    def flags(args):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        xyz = apply_shift(cloud_xyz, shift)
        data = jnp.concatenate([cloud_data[..., 0:3], cloud_data[..., 4:5]],
                               axis=-1)
        render, weight, overflow = render_grids_banded(
            xyz, data, h, w, focal, camera.baseline, valid=cloud_valid)
        render_depth = render[..., 3:4] * (weight > 0.0)
        _, unr = _fill_single_fused(render[0], render_depth[0],
                                    effect.fill_march_phase1, False, roi)
        return overflow, jnp.sum(unr.astype(jnp.int32))
    ov, tiles = jax.jit(
        lambda xs: lax.map(flags, xs))((steps, focals))
    print(f"overflow frames: {int(np.sum(np.asarray(ov)))}/{n_poses}  "
          f"phase-2 tiles/frame: {np.asarray(tiles).tolist()}")


if __name__ == "__main__":
    main()
