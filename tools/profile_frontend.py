"""Per-stage timing of the CNN front-end at full resolution.

Times: half-res resize, Semantics (VGG19-bn), Disparity grid-net, Refine,
and one pointcloud_inpainting bootstrap call, each as its own jitted
call on the real chip (dispatch adds ~30 ms; stage costs are 100s of ms
so the split stays meaningful). Usage:
python tools/profile_frontend.py [size] [dtype]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.bfloat16 if (len(sys.argv) > 2 and
                             sys.argv[2] == "bf16") else jnp.float32
    h = w = size

    from kbe_tpu.config import CameraConfig, EffectConfig
    from kbe_tpu.models import Disparity, Inpaint, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.ops.geometry import disparity_to_depth
    from kbe_tpu.ops.resize import resize_to_max
    from kbe_tpu.pipeline.inpaint_flow import (InpaintModels,
                                               pointcloud_inpainting)

    camera = CameraConfig()
    effect = EffectConfig()
    rng = jax.random.PRNGKey(0)
    image = jax.random.uniform(rng, (1, h, w, 3), jnp.float32)

    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)
    ctx_def = ContextNet(dtype=dtype)
    inp_def = Inpaint(dtype=dtype)

    half = np.asarray(resize_to_max(image, size // 2))
    k = jax.random.split(rng, 5)
    p_sem = sem_def.init(k[0], half)
    sem = np.asarray(sem_def.apply(p_sem, half))
    p_disp = disp_def.init(k[1], half, sem)
    p_ref = refine_def.init(k[2], image,
                            disp_def.apply(p_disp, half, sem))
    disp_half = np.asarray(disp_def.apply(p_disp, half, sem))

    print(f"== frontend profile, size {size}, dtype "
          f"{jnp.dtype(dtype).name} ==")
    f_resize = jax.jit(lambda im: resize_to_max(im, size // 2))
    print(f"resize half:     {timeit(f_resize, image):8.2f} ms")
    f_sem = jax.jit(sem_def.apply)
    print(f"semantics(VGG):  {timeit(f_sem, p_sem, half):8.2f} ms")
    f_disp = jax.jit(disp_def.apply)
    print(f"disparity net:   {timeit(f_disp, p_disp, half, sem):8.2f} ms")
    f_ref = jax.jit(refine_def.apply)
    print(f"refine net:      {timeit(f_ref, p_ref, image, disp_half):8.2f}"
          " ms")

    # one inpainting bootstrap call (of the two in the frontend)
    refined = refine_def.apply(p_ref, image, disp_half)
    refined = refined - jnp.minimum(jnp.min(refined), 0.0)
    disparity = refined / jnp.max(refined) * camera.baseline
    p_ctx = ctx_def.init(k[3], image, disparity)
    ctx = ctx_def.apply(p_ctx, image, disparity)
    data = jnp.concatenate([image, disparity / camera.baseline, ctx], -1)
    p_inp = inp_def.init(k[4], data, jnp.ones((1, h, w, 1), jnp.float32))

    def _net_apply(params, data, masks):
        img, dsp = inp_def.apply(params, data, masks)
        return img, dsp, masks

    models = InpaintModels(context=partial(ctx_def.apply, p_ctx),
                           net=partial(_net_apply, p_inp))
    shift = jnp.asarray([80.0, 80.0, 0.0], jnp.float32)

    f_boot = jax.jit(lambda im, dsp: pointcloud_inpainting(
        models, im, dsp, shift, camera, camera.focal,
        effect.validity_threshold, splat_method="banded",
        relayout_context=(dtype == jnp.bfloat16)))
    print(f"inpaint boot:    {timeit(f_boot, image, disparity):8.2f} ms")


if __name__ == "__main__":
    main()
