"""Split the disocclusion fill's per-frame cost on the trained bench scene.

Renders one mid-trajectory frame with the posed kernel (the pipeline's
configuration), then times, each as its own jitted program:
  * planes build + hole-tile ordering (the gated phase-1's XLA prologue)
  * the gated phase-1 fill on a hole-FREE depth (fixed overhead:
    prologue + zero-count kernel + scatter merge)
  * the gated phase-1 fill on the real frame
  * the full two-phase schedule (fill_disocclusion_pallas, pipeline args)
and reports the hole-tile count so the march cost can be read per tile.

Usage: python tools/profile_fill.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# shared helper: forces the scalar host fetch that actually synchronizes
# on the axon backend (plain block_until_ready under-measures there)
from tools.bench_scene import timeit  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = w = size
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.ops import discfill_pallas as dp
    from kbe_tpu.ops.geometry import (depth_range, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.ops.splat_posed import (prepare_banded_scene,
                                         render_scene_posed)
    from kbe_tpu.pipeline.kenburns import (build_effect_fn,
                                           compute_pose_shift)
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image
    from kbe_tpu.models import Disparity, Refine, Semantics
    from kbe_tpu.ops.resize import resize_to_max

    camera = CameraConfig()
    effect = EffectConfig()
    zoom = ZoomSettings.default_3d(w, h)
    image = jnp.asarray(demo_scene_image(h, w), jnp.float32)[None]
    ckpt = find_bench_weights()
    params = jax.device_put(load_pipeline_params(ckpt))

    dtype = jnp.bfloat16
    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)

    @jax.jit
    def front(params, image):
        resized = resize_to_max(image, max(h, w) // 2)
        semantics = sem_def.apply(params.semantics, resized)
        disp_half = disp_def.apply(params.disparity, resized, semantics)
        disparity = refine_def.apply(params.refine, image, disp_half)
        disparity = disparity - jnp.minimum(jnp.min(disparity), 0.0)
        disparity = disparity / jnp.max(disparity) * camera.baseline
        depth = disparity_to_depth(disparity, camera.focal, camera.baseline)
        points = depth_to_points(depth[..., 0], camera.focal)
        anchor = depth_range(depth[0, ..., 0], effect.depth_range_margin)
        data = jnp.concatenate([image[0], depth[0]], axis=-1)
        return points, data, anchor

    points, data, anchor = front(params, image)   # points: (1, H, W, 3)
    scene = jax.block_until_ready(prepare_banded_scene(
        points, data[None], jnp.ones((1, h, w), jnp.float32)))

    @jax.jit
    def render_mid(scene, anchor):
        shift = compute_pose_shift(0.5, camera.focal, anchor, zoom, camera,
                                   w, h)
        render, weight, _ = render_scene_posed(
            scene, shift, camera.focal, h, w, camera.baseline,
            overflow_cap=effect.splat_overflow_chunks)
        return render, render[..., 3:4] * (weight > 0.0)

    render, rdepth = jax.block_until_ready(render_mid(scene, anchor))

    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)
    rx0 = max(0, int(np.floor(w / 2.0 - (max_cw - 1) / 2.0)) - 2)
    rx1 = min(w, int(np.floor(w / 2.0 + (max_cw - 1) / 2.0)) + 3)
    ry0 = max(0, int(np.floor(h / 2.0 - (max_ch - 1) / 2.0)) - 2)
    ry1 = min(h, int(np.floor(h / 2.0 + (max_ch - 1) / 2.0)) + 3)
    roi = (ry0, ry1, rx0, rx1)

    n_ty = dp._ceil_to(h, dp.TILE_H) // dp.TILE_H
    n_tx = dp._ceil_to(w, dp.TILE_W) // dp.TILE_W
    img0 = render[0]
    dep0 = rdepth[0]
    hole = np.asarray(dep0[..., 0] <= 0.0)
    yy, xx = np.mgrid[0:h, 0:w]
    in_roi = (yy >= ry0) & (yy < ry1) & (xx >= rx0) & (xx < rx1)
    hole_roi = hole & in_roi
    ht = hole_roi.reshape(n_ty, dp.TILE_H, n_tx, dp.TILE_W).any((1, 3))
    print(f"hole pixels in ROI: {hole_roi.sum()}  hole tiles: {ht.sum()}"
          f" / {n_ty * n_tx}")

    p1 = effect.fill_march_phase1
    steps = effect.fill_march_steps

    @jax.jit
    def prologue(img, dep):
        planes, _, _ = dp._build_planes(img, dep, p1, dp._ceil_to(h, dp.TILE_H),
                                        dp._ceil_to(w, dp.TILE_W), n_ty, n_tx)
        order, count = dp._hole_tile_order(dep, roi, h, w, n_ty, n_tx)
        return planes, order, count

    # every row is jitted and reduced ON DEVICE to a scalar before the
    # timing fetch — a raw array return pays the axon tunnel's ~10 MB/s
    # host transfer (1.6 s for one 1024^2 x4ch frame) and an unjitted
    # call dispatches op-by-op through the tunnel; both swamp the
    # millisecond-scale kernel costs this tool exists to read
    def row(name, fn, *args):
        f = jax.jit(lambda *a: jax.tree_util.tree_map(jnp.sum, fn(*a)))
        print(f"{name:28s}{timeit(f, *args):8.2f} ms", flush=True)

    row("planes build + tile order:", prologue, img0, dep0)

    nohole = jnp.ones_like(dep0)
    row("gated phase1, zero holes:",
        lambda a, b: dp._fill_single_gated(a, b, p1, False, roi),
        img0, nohole)
    row("gated phase1, real frame:",
        lambda a, b: dp._fill_single_gated(a, b, p1, False, roi),
        img0, dep0)
    row("two-phase full schedule:",
        lambda a, b: dp.fill_disocclusion_pallas(
            a, b, steps, phase1_steps=p1, roi=roi), render, rdepth)
    row("census-gated (pipeline):",
        lambda a, b: dp.fill_disocclusion_pallas(
            a, b, steps, phase1_steps=p1, roi=roi,
            phase0_steps=effect.fill_phase0 or 2,
            phase0_gate=effect.fill_phase0_gate or 0.25), render, rdepth)
    row("phase0 always-on:",
        lambda a, b: dp.fill_disocclusion_pallas(
            a, b, steps, phase1_steps=p1, roi=roi,
            phase0_steps=effect.fill_phase0 or 2, phase0_gate=0.0),
        render, rdepth)


if __name__ == "__main__":
    main()
