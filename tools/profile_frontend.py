"""Frontend sub-stage attribution on the trained bench scene.

bench.py's 1024^2 video spends ~0.37 s before the pose loop; this
breaks that down: semantics/disparity (half-res), refine (full-res),
then per inpaint extension the context net, the 68-channel banded
bootstrap render, the median-filtered coverage mask, and the inpaint
grid-net. Each stage is timed as its own jitted program (so stage
boundaries are real device fences; the fused pipeline overlaps some of
this, making the sum an upper bound on the fused cost).

Usage: python tools/profile_frontend.py [size]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = w = size
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kbe_tpu.config import CameraConfig
    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.models.layers import normalize_sample
    from kbe_tpu.ops.filters import median_filter
    from kbe_tpu.ops.layout import relayout
    from kbe_tpu.ops.resize import resize_to_max
    from kbe_tpu.ops.splat_banded import render_grids_fast_banded
    from kbe_tpu.ops.geometry import (depth_to_points, disparity_to_depth)
    from kbe_tpu.ops.filters import validity_mask
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image

    camera = CameraConfig()
    # production precision mix (bench.py): f32 depth path, bf16 inpaint
    dtype = jnp.bfloat16
    depth_dtype = jnp.float32
    ckpt = find_bench_weights()
    assert ckpt, "run tools/make_bench_weights.py first"
    params = jax.device_put(load_pipeline_params(ckpt))
    image = jnp.asarray(demo_scene_image(h, w), jnp.float32)[None]

    sem_def = Semantics(dtype=depth_dtype)
    disp_def = Disparity(dtype=depth_dtype)
    refine_def = Refine(dtype=depth_dtype)
    ctx_def = ContextNet(dtype=dtype)
    inp_def = Inpaint(dtype=dtype)

    resized = jax.jit(lambda im: resize_to_max(im, max(h, w) // 2))(image)

    # params as ARGS, not jit-captured constants: constants embed in
    # the HLO and overflow the axon remote-compile request (HTTP 413)
    f_sem = jax.jit(lambda p, im: sem_def.apply(p, im))
    semantics = jax.block_until_ready(f_sem(params.semantics, resized))
    f_disp = jax.jit(lambda p, im, s: disp_def.apply(p, im, s))
    disp_half = jax.block_until_ready(
        f_disp(params.disparity, resized, semantics))
    f_ref = jax.jit(lambda p, im, d: refine_def.apply(p, im, d))
    disparity = jax.block_until_ready(f_ref(params.refine, image, disp_half))
    disparity = disparity - jnp.minimum(jnp.min(disparity), 0.0)
    disparity = disparity / jnp.max(disparity) * camera.baseline

    print(f"semantics (half-res): {timeit(f_sem, params.semantics, resized):8.1f} ms")
    print(f"disparity (half-res): {timeit(f_disp, params.disparity, resized, semantics):8.1f} ms")
    print(f"refine  (full-res):   {timeit(f_ref, params.refine, image, disp_half):8.1f} ms")

    image_n, _ = normalize_sample(image)
    disp_n, _ = normalize_sample(disparity)

    f_ctx = jax.jit(lambda p, a, b: relayout(ctx_def.apply(p, a, b)))
    context = jax.block_until_ready(f_ctx(params.context, image_n, disp_n))
    print(f"context (full-res):   {timeit(f_ctx, params.context, image_n, disp_n):8.1f} ms")

    depth = disparity_to_depth(disparity, camera.focal, camera.baseline)
    valid = validity_mask(disparity, 0.03)
    points = depth_to_points((depth * valid)[..., 0], camera.focal)
    shift = jnp.asarray([20.0, 10.0, 5.0], jnp.float32)

    payload = jnp.concatenate([image_n, disp_n, context], axis=-1)

    f_render = jax.jit(lambda pts, pay: render_grids_fast_banded(
        (pts + shift).reshape(1, h, w, 3), pay.reshape(1, h, w, -1),
        h, w, camera.focal, camera.baseline))
    render, weight = jax.block_until_ready(f_render(points, payload))
    print(f"bootstrap render 68ch:{timeit(f_render, points, payload):8.1f} ms")

    f_med = jax.jit(lambda wgt: median_filter(
        (wgt > 0.0).astype(jnp.float32), 5))
    _ = jax.block_until_ready(f_med(weight))
    print(f"median filter:        {timeit(f_med, weight):8.1f} ms")

    existing = (weight > 0.0).astype(jnp.float32)
    existing = existing * f_med(weight)
    masked = render * existing

    f_inp = jax.jit(lambda p_, r, e: inp_def.apply(p_, r, e))
    _ = jax.block_until_ready(f_inp(params.inpaint, masked, existing))
    print(f"inpaint net:          {timeit(f_inp, params.inpaint, masked, existing):8.1f} ms")


if __name__ == "__main__":
    main()
