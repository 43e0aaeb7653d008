"""Window census of the posed renderer on the trained bench scene.

Counts, per pose, what the kernel actually iterates: routed entry-visits,
total (dly, xw) windows, and the y_cnt / xw_cnt histograms — the data
needed to size a fast-path window unroll.

Usage: python tools/exp_census.py [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_scene import build_bench_cloud, enable_cache


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = w = size
    enable_cache()

    from kbe_tpu.ops.splat_posed import pose_routing, prepare_banded_scene
    from kbe_tpu.pipeline.kenburns import compute_pose_shift

    # shared scene builder (same jit program as exp_sweep / bench_scene,
    # so the compile cache is hit instead of re-tracing a private copy)
    cloud_xyz, cloud_data, cloud_valid, anchor, camera, effect, zoom = \
        build_bench_cloud(size)
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
