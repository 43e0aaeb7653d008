"""One-config posed-renderer timing on the trained bench scene.

Times the full renderer ("ab") per frame under a lax.map, honoring the
KBE_TILE_H / KBE_TILE_W / KBE_BAND_W env overrides — the lean harness for
geometry sweeps (one compile per config instead of profile_posed_split's
six).

Usage: [KBE_BAND_W=4 ...] python tools/exp_sweep.py [size] [n_poses]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tools.bench_scene import build_bench_cloud, enable_cache, timeit


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_poses = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    h = w = size
    enable_cache()

    from kbe_tpu.ops.splat_posed import (prepare_banded_scene,
                                         render_scene_posed)
    from kbe_tpu.pipeline.kenburns import compute_pose_shift

    (cloud_xyz, cloud_data, cloud_valid, anchor, camera, effect,
     zoom) = build_bench_cloud(size)
    frame_data = jnp.concatenate([cloud_data[..., 0:3],
                                  cloud_data[..., 4:5]], axis=-1)
    scene = prepare_banded_scene(cloud_xyz, frame_data, cloud_valid)

    steps = jnp.linspace(0.0, 1.0, n_poses)
    focals = jnp.full((n_poses,), camera.focal, jnp.float32)

    def body(args):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        render, weight, overflow = render_scene_posed(
            scene, shift, focal, h, w, camera.baseline, overflow_cap=256)
        return jnp.sum(render[..., 0]) + jnp.sum(weight) + overflow

    fn = jax.jit(lambda xs: lax.map(body, xs))
    base = jax.jit(lambda xs: lax.map(
        lambda a: jnp.sum(compute_pose_shift(a[0], a[1], anchor, zoom,
                                             camera, w, h)), xs))
    ms = timeit(fn, (steps, focals)) / n_poses
    ms0 = timeit(base, (steps, focals)) / n_poses
    cfg = (os.environ.get("KBE_TILE_H", "64"),
           os.environ.get("KBE_TILE_W", "512"),
           os.environ.get("KBE_BAND_W", "8"))
    print(f"tile=({cfg[0]},{cfg[1]}) band={cfg[2]} size={size}: "
          f"render {ms - ms0:8.2f} ms/frame (raw {ms:.2f}, floor {ms0:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
