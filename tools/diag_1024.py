"""Bisect the 1024^2 TPU worker crash: run pipeline stages one at a time.

Usage: python tools/diag_1024.py STAGE [SIZE]
  STAGE in {frontend, cloud, render1, fill1, frame1, noinpaint, full}
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    stage = sys.argv[1]
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.pipeline.kenburns import (KenBurnsPipeline,
                                           build_effect_fn,
                                           compute_pose_shift)

    h = w = size
    effect = EffectConfig(num_steps=75)
    camera = CameraConfig()
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), h, w,
                                   effect=effect, dtype=jnp.bfloat16)
    zoom = ZoomSettings.default_3d(w, h)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    params = pipe.params

    from kbe_tpu.models import Disparity, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.geometry import (apply_shift, depth_range,
                                      depth_to_points, disparity_to_depth)
    from kbe_tpu.ops.resize import resize_to_max

    dtype = jnp.bfloat16
    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)

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
        return disparity, depth, points, anchor

    def sync(x):
        return [np.asarray(l.ravel()[:1]) if hasattr(l, 'ravel') else l
                for l in jax.tree_util.tree_leaves(x)]

    t0 = time.perf_counter()
    if stage == "frontend":
        out = frontend(params, image)
        sync(out)
        print("frontend OK", time.perf_counter() - t0)
        disparity, depth, points, anchor = out
        print("disp range", float(jnp.min(out[0])), float(jnp.max(out[0])))
        print("depth range", float(jnp.min(out[1])), float(jnp.max(out[1])))
        print("anchor", [float(a) for a in out[3]])
        return

    disparity, depth, points, anchor = frontend(params, image)
    sync((disparity, anchor))
    print("frontend done", time.perf_counter() - t0)

    cloud_xyz = points.reshape(1, h, w, 3)
    cloud_data = jnp.concatenate(
        [image[0], disparity[0], depth[0]], axis=-1)[None]
    cloud_valid = jnp.ones((1, h, w), jnp.float32)

    if stage == "cloud":
        print("cloud OK")
        return

    shift = compute_pose_shift(0.5, camera.focal, anchor, zoom, camera,
                               w, h)

    if stage in ("render1", "fill1", "frame1"):
        from kbe_tpu.ops.splat_banded import render_grids_banded

        @jax.jit
        def one_render(xyz, data, valid, shift):
            sxyz = apply_shift(xyz, shift)
            d4 = jnp.concatenate([data[..., 0:3], data[..., 4:5]], -1)
            return render_grids_banded(sxyz, d4, h, w, camera.focal,
                                       camera.baseline, valid=valid)

        t0 = time.perf_counter()
        render, weight, overflow = one_render(cloud_xyz, cloud_data,
                                              cloud_valid, shift)
        sync(render)
        print("render1 OK", time.perf_counter() - t0,
              "overflow", bool(overflow))
        if stage == "render1":
            for _ in range(3):
                t0 = time.perf_counter()
                sync(one_render(cloud_xyz, cloud_data, cloud_valid, shift))
                print("render1 repeat", time.perf_counter() - t0)
            return
        from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas

        @jax.jit
        def one_fill(render, weight):
            rd = render[..., 3:4] * (weight > 0.0)
            return fill_disocclusion_pallas(render, rd,
                                            effect.fill_march_steps,
                                            phase1_steps=16)

        t0 = time.perf_counter()
        filled = one_fill(render, weight)
        sync(filled)
        print("fill1 OK", time.perf_counter() - t0)
        return

    if stage == "render3":
        from kbe_tpu.ops.splat_banded import render_grids_banded

        xyz3 = jnp.concatenate([cloud_xyz] * 3, axis=0)
        data3 = jnp.concatenate([cloud_data] * 3, axis=0)
        # second/third grids: perturb + partial validity like inpaint grids
        xyz3 = xyz3.at[1:, ..., 2].multiply(1.01)
        val3 = jnp.concatenate(
            [cloud_valid,
             (jnp.arange(h * w).reshape(1, h, w) % 7 == 0).astype(
                 jnp.float32),
             (jnp.arange(h * w).reshape(1, h, w) % 11 == 0).astype(
                 jnp.float32)], axis=0)

        @jax.jit
        def one_render3(xyz, data, valid, shift):
            sxyz = apply_shift(xyz, shift)
            d4 = jnp.concatenate([data[..., 0:3], data[..., 4:5]], -1)
            return render_grids_banded(sxyz, d4, h, w, camera.focal,
                                       camera.baseline, valid=valid)

        t0 = time.perf_counter()
        render, weight, overflow = one_render3(xyz3, data3, val3, shift)
        sync(render)
        print("render3 OK", time.perf_counter() - t0,
              "overflow", bool(overflow))
        for _ in range(3):
            t0 = time.perf_counter()
            sync(one_render3(xyz3, data3, val3, shift))
            print("render3 repeat", time.perf_counter() - t0)
        return

    if stage == "bootstrap":
        from kbe_tpu.models import Inpaint
        from kbe_tpu.models.gridnet import ContextNet
        from kbe_tpu.pipeline.inpaint_flow import (InpaintModels,
                                                   pointcloud_inpainting)
        from functools import partial

        ctx_def = ContextNet(dtype=dtype)
        inp_def = Inpaint(dtype=dtype)

        def _net_apply(p, data, masks):
            img, dsp = inp_def.apply(p, data, masks)
            return img, dsp, masks

        models = InpaintModels(
            context=partial(ctx_def.apply, params.context),
            net=partial(_net_apply, params.inpaint))

        @jax.jit
        def boot(image, disparity, shift):
            return pointcloud_inpainting(
                models, image, disparity, 1.1 * shift, camera,
                camera.focal, effect.validity_threshold,
                splat_method="routed")

        t0 = time.perf_counter()
        out = boot(image, disparity, shift)
        sync(out)
        print("bootstrap OK", time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            sync(boot(image, disparity, shift))
            print("bootstrap repeat", time.perf_counter() - t0)
        return

    if stage == "realcloud":
        from functools import partial

        from kbe_tpu.models import Inpaint
        from kbe_tpu.models.gridnet import ContextNet
        from kbe_tpu.ops.splat_banded import render_grids_banded
        from kbe_tpu.pipeline.inpaint_flow import (InpaintModels,
                                                   pointcloud_inpainting)

        ctx_def = ContextNet(dtype=dtype)
        inp_def = Inpaint(dtype=dtype)

        def _net_apply(p, data, masks):
            img, dsp = inp_def.apply(p, data, masks)
            return img, dsp, masks

        models = InpaintModels(
            context=partial(ctx_def.apply, params.context),
            net=partial(_net_apply, params.inpaint))

        @jax.jit
        def build_cloud(image, disparity, depth, points, anchor):
            gx = [points.reshape(1, h, w, 3)]
            gd = [jnp.concatenate([image[0], disparity[0], depth[0]],
                                  -1)[None]]
            gv = [jnp.ones((1, h, w), jnp.float32)]
            for s in (0.0, 1.0):
                sh = compute_pose_shift(s, camera.focal, anchor, zoom,
                                        camera, w, h)
                inp = pointcloud_inpainting(
                    models, image, disparity, 1.1 * sh, camera,
                    camera.focal, effect.validity_threshold,
                    splat_method="routed")
                gx.append(inp["points"].reshape(1, h, w, 3))
                gd.append(jnp.concatenate(
                    [inp["image"][0], inp["disparity"][0],
                     inp["depth"][0]], -1)[None])
                gv.append((inp["existing"][0, ..., 0] == 0.0).astype(
                    jnp.float32)[None])
            return (jnp.concatenate(gx), jnp.concatenate(gd),
                    jnp.concatenate(gv))

        cx, cd, cv = build_cloud(image, disparity, depth, points, anchor)
        sync(cv)
        print("cloud built; novel counts",
              [float(jnp.sum(cv[i])) for i in range(3)])
        import kbe_tpu.ops.splat_banded as sb
        u_, v_, ok_ = None, None, None
        from kbe_tpu.ops.geometry import project_points

        sh = compute_pose_shift(0.5, camera.focal, anchor, zoom, camera,
                                w, h)
        sxyz = apply_shift(cx, sh)
        u_, v_, ok_ = project_points(sxyz, h, w, camera.focal)
        ok_ = ok_ & (cv > 0.0)
        # per-chunk spread stats like the prepass computes
        x0 = jnp.floor(u_); y0 = jnp.floor(v_)
        yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        dyf = jnp.where(ok_, y0 - yy, jnp.nan)
        dxf = jnp.where(ok_, x0 - xx, jnp.nan)
        for g in range(3):
            dy = dyf[g]; dx = dxf[g]
            print(f"grid{g} dy[min,max]",
                  float(jnp.nanmin(dy)), float(jnp.nanmax(dy)),
                  "dx", float(jnp.nanmin(dx)), float(jnp.nanmax(dx)))
        # chunk spreads
        hp = sb._ceil_to(h, sb.CHUNK_H); wp = sb._ceil_to(w, sb.CHUNK_W)
        okp = jnp.pad(ok_, ((0, 0), (0, hp - h), (0, wp - w)))
        pdy = jnp.pad(jnp.where(ok_, y0 - yy, 0.0),
                      ((0, 0), (0, hp - h), (0, wp - w)))
        pdx = jnp.pad(jnp.where(ok_, x0 - xx, 0.0),
                      ((0, 0), (0, hp - h), (0, wp - w)))
        big = jnp.float32(3e38)
        dy_lo = sb._chunk_minmax(pdy, okp, jnp.min, big)
        dy_hi = sb._chunk_minmax(pdy, okp, jnp.max, -big)
        dx_lo = sb._chunk_minmax(pdx, okp, jnp.min, big)
        dx_hi = sb._chunk_minmax(pdx, okp, jnp.max, -big)
        sy = jnp.where(dy_lo > 1e38, 0.0, dy_hi - dy_lo)
        sx = jnp.where(dx_lo > 1e38, 0.0, dx_hi - dx_lo)
        work = (sy + 2) * ((sx + 1) // sb.BAND_W + 1)
        print("chunk y-spread max/mean", float(jnp.max(sy)),
              float(jnp.mean(sy)))
        print("chunk x-spread max/mean", float(jnp.max(sx)),
              float(jnp.mean(sx)))
        print("window-rows: total", float(jnp.sum(work)),
              "max/chunk", float(jnp.max(work)))

        @jax.jit
        def one_render(xyz, data, valid, shift):
            sxyz = apply_shift(xyz, shift)
            d4 = jnp.concatenate([data[..., 0:3], data[..., 4:5]], -1)
            return render_grids_banded(sxyz, d4, h, w, camera.focal,
                                       camera.baseline, valid=valid)

        t0 = time.perf_counter()
        render, weight, overflow = one_render(cx, cd, cv, sh)
        sync(render)
        print("realcloud render OK", time.perf_counter() - t0,
              "overflow", bool(overflow))
        for _ in range(2):
            t0 = time.perf_counter()
            sync(one_render(cx, cd, cv, sh))
            print("realcloud repeat", time.perf_counter() - t0)
        return

    if stage == "noinpaint":
        eff2 = EffectConfig(num_steps=75, inpaint=False)
        fn = jax.jit(build_effect_fn(h, w, zoom, camera, eff2,
                                     dtype=jnp.bfloat16))
        t0 = time.perf_counter()
        frames = fn(params, image)
        print("noinpaint sum", float(jnp.sum(frames[:, ::128, ::128, 0])),
              time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            frames = fn(params, image)
            float(jnp.sum(frames[:, ::128, ::128, 0]))
            print("noinpaint repeat", time.perf_counter() - t0)
        return

    if stage == "full":
        fn = jax.jit(build_effect_fn(h, w, zoom, camera, effect,
                                     dtype=jnp.bfloat16))
        t0 = time.perf_counter()
        frames = fn(params, image)
        print("full sum", float(jnp.sum(frames[:, ::128, ::128, 0])),
              time.perf_counter() - t0)
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
