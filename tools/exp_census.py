"""Window census of the posed renderer on the trained bench scene.

Counts, per pose, what the kernel actually iterates: routed entry-visits,
total (dly, xw) windows, and the y_cnt / xw_cnt histograms — the data
needed to size a fast-path window unroll.

Usage: python tools/exp_census.py [size]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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
    from kbe_tpu.ops.splat_posed import (pose_routing, prepare_banded_scene)
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

    for step in (0.0, 0.5, 1.0):
        shift = compute_pose_shift(jnp.float32(step),
                                   jnp.float32(camera.focal), anchor, zoom,
                                   camera, w, h)
        r = pose_routing(scene, shift, jnp.float32(camera.focal), h, w,
                         overflow_cap=256)
        n = int(np.asarray(r.offsets)[-1])
        ids = np.asarray(r.chunk_ids)[:n]
        m2 = np.asarray(r.meta2)[ids]
        y_cnt = (m2 >> 8) & 0xff
        xw_cnt = m2 & 0xff
        wins = y_cnt * xw_cnt
        print(f"step {step}: visits={n} windows={int(wins.sum())} "
              f"overwork={int(np.asarray(r.n_over))}", flush=True)
        for name, v in (("y_cnt", y_cnt), ("xw_cnt", xw_cnt),
                        ("wins", wins)):
            hist = np.bincount(np.clip(v, 0, 20))
            print(f"  {name:6s} mean={v.mean():5.2f} p95="
                  f"{np.percentile(v, 95):4.0f} max={v.max():4d} "
                  f"hist[0..12]={hist[:13].tolist()}", flush=True)


if __name__ == "__main__":
    main()
