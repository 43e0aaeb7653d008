"""Calibrate axon-tunnel sync overhead and loop-timed costs of small ops."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    return float(jnp.sum(x.ravel()[:4].astype(jnp.float32)))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


h = w = 1024
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32))

# 1. trivial op -> pure roundtrip cost
triv = jax.jit(lambda x: x[0, :2, :2, 0] + 1.0)
print(f"trivial op:      {timeit(triv, img):8.2f} ms")

# 2. crop+resize x20 chained in one jit
from kbe_tpu.config import ZoomSettings
from kbe_tpu.ops.resize import crop_rect_subpix, resize_bilinear
zoom = ZoomSettings.default_3d(w, h)
max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)

def crop20(r):
    def body(i, acc):
        patch = crop_rect_subpix(r[0, ..., :3] + acc[0, 0, 0], max_cw,
                                 max_ch, w / 2, h / 2)
        return resize_bilinear(patch[None], h, w)
    return lax.fori_loop(0, 20, body, jnp.zeros((1, h, w, 3)))

cr = jax.jit(crop20)
t = timeit(cr, img)
print(f"crop+resize x20: {t:8.2f} ms -> {t/20:6.2f} ms each")

# 3. fill x10 chained
from kbe_tpu.config import EffectConfig
from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas
effect = EffectConfig()
holes = jnp.asarray((rng.uniform(0, 1, (1, h, w, 1)) > 0.05)
                    .astype(np.float32))

def fill10(r, hl):
    def body(i, acc):
        rd = (r[..., 3:4] + acc[0, 0, 0, 0] * 0.0) * hl
        return fill_disocclusion_pallas(r, rd, effect.fill_march_steps)
    return lax.fori_loop(0, 10, body, jnp.zeros((1, h, w, 4)))

fl = jax.jit(fill10)
t = timeit(fl, img, holes)
print(f"fill x10:        {t:8.2f} ms -> {t/10:6.2f} ms each")
