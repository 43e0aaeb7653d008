"""Split pose_routing's per-frame cost: per-point bounds math vs CSR build.

The posed renderer's XLA prepass measured 7.87 ms/frame at 1024^2
(tools/profile_posed_split.py, round 5) — half the splat stage. This
times its two halves as separate jitted programs over an 8-pose lax.map:

  * bounds: the fused per-point projection + 8 valid-masked per-chunk
    reductions (reads the 5 (G, Hp, Wp) planes per pose)
  * csr: _build_csr + meta packing from precomputed bounds
  * overflow epilogue prep: _overflow_points gather+projection (runs
    unconditionally per pose in render_scene_posed)

Usage: python tools/exp_routing_split.py [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tools.bench_scene import build_bench_cloud, enable_cache, timeit


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_poses = 8
    h = w = size
    enable_cache()

    import kbe_tpu.ops.splat_posed as sp
    from kbe_tpu.ops.splat_posed import (_EPS, _ZMIN, _chunk_red,
                                         prepare_banded_scene)
    from kbe_tpu.ops.splat_routed import _INF, _build_csr
    from kbe_tpu.ops.splat_banded import BAND_W, CHUNK_H, CHUNK_W
    from kbe_tpu.ops.splat_posed import TILE_H, TILE_W
    from kbe_tpu.pipeline.kenburns import compute_pose_shift

    cloud_xyz, cloud_data, cloud_valid, anchor, camera, effect, zoom = \
        build_bench_cloud(size)
    frame_data = jnp.concatenate([cloud_data[..., 0:3],
                                  cloud_data[..., 4:5]], axis=-1)
    scene = jax.block_until_ready(
        prepare_banded_scene(cloud_xyz, frame_data, cloud_valid))

    steps = jnp.linspace(0.0, 1.0, n_poses)
    focals = jnp.full((n_poses,), camera.focal, jnp.float32)

    def shift_of(step, focal):
        return compute_pose_shift(step, focal, anchor, zoom, camera, w, h)

    def bounds_of(shift, focal):
        px, py, pz, pv, pcl = (scene.px, scene.py, scene.pz, scene.pv,
                               scene.pcl)
        g, hp, wp = px.shape
        sx, sy, sz = shift[0], shift[1], shift[2]
        xs_ = px + sx
        ys_ = py + sy
        zs = pz + sz
        okb = (zs >= _ZMIN - 1e-6) & (pv > 0.0)
        safez = jnp.where(okb, zs, 1.0)
        yyg = lax.broadcasted_iota(jnp.float32, (g, hp, wp), 1)
        xxg = lax.broadcasted_iota(jnp.float32, (g, hp, wp), 2)
        u = (xs_ * focal / safez + (0.5 * w)) - 0.5
        v = (ys_ * focal / safez + (0.5 * h)) - 0.5
        cdx = u - xxg
        cdy = v - yyg
        big = jnp.float32(3e38)

        def cluster_bounds(want):
            ok_c = okb & (pcl == want)
            return (_chunk_red(cdx, ok_c, jnp.min, big),
                    _chunk_red(cdx, ok_c, jnp.max, -big),
                    _chunk_red(cdy, ok_c, jnp.min, big),
                    _chunk_red(cdy, ok_c, jnp.max, -big))

        b0 = cluster_bounds(0.0)
        b1 = cluster_bounds(1.0)
        return [jnp.stack([a, b], axis=1).reshape(-1)
                for a, b in zip(b0, b1)]

    def csr_of(dx_lo, dx_hi, dy_lo, dy_hi):
        empty = dx_lo > 1e37
        overwork = jnp.zeros_like(empty)
        exx0 = jnp.repeat(scene.xx0, 2)
        eyy0 = jnp.repeat(scene.yy0, 2)
        minu = jnp.where(empty | overwork, _INF, dx_lo - _EPS + exx0)
        maxu = jnp.where(empty | overwork, -_INF,
                         dx_hi + _EPS + exx0 + (CHUNK_W - 1))
        minv = jnp.where(empty | overwork, _INF, dy_lo - _EPS + eyy0)
        maxv = jnp.where(empty | overwork, -_INF,
                         dy_hi + _EPS + eyy0 + (CHUNK_H - 1))
        nc = scene.records.shape[0]
        n_ty = -(-h // TILE_H)
        n_tx = -(-w // TILE_W)
        ids, offs, ovf, _ = _build_csr(minu, maxu, minv, maxv, n_ty, n_tx,
                                       4 * nc, TILE_H, TILE_W)
        return jnp.sum(ids) + jnp.sum(offs) + ovf

    bounds0 = jax.block_until_ready(
        jax.jit(bounds_of)(shift_of(steps[4], focals[4]), focals[4]))

    def run_bounds(xs):
        def body(args):
            step, focal = args
            bs = bounds_of(shift_of(step, focal), focal)
            return sum(jnp.sum(b) for b in bs)
        return lax.map(body, xs)

    def run_csr(xs):
        def body(args):
            step, focal = args
            # perturb precomputed bounds by the pose scalar so XLA can't
            # hoist the build out of the map
            eps = step * 1e-6
            return csr_of(bounds0[0] + eps, bounds0[1] + eps,
                          bounds0[2], bounds0[3])
        return lax.map(body, xs)

    def run_full(xs):
        def body(args):
            step, focal = args
            r = sp.pose_routing(scene, shift_of(step, focal), focal, h, w,
                                overflow_cap=256)
            return (jnp.sum(r.offsets) + jnp.sum(r.chunk_ids)
                    + jnp.sum(r.meta1))
        return lax.map(body, xs)

    def run_overpts(xs):
        def body(args):
            step, focal = args
            r = sp.pose_routing(scene, shift_of(step, focal), focal, h, w,
                                overflow_cap=256)
            u, v, err, ok, pay = sp._overflow_points(
                scene, r, (0.0, 0.0, 0.0), focal,
                jnp.float32(camera.baseline), h, w, 4)
            return jnp.sum(u) + jnp.sum(err) + jnp.sum(pay)
        return lax.map(body, xs)

    xs = (steps, focals)
    for name, fn in (("bounds (per-point reduce)", run_bounds),
                     ("csr build + meta", run_csr),
                     ("full pose_routing", run_full),
                     ("routing + overflow gather", run_overpts)):
        ms = timeit(jax.jit(fn), xs) / n_poses
        print(f"{name:28s}{ms:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
