"""Per-stage timing of the banded frame budget on the real chip.

Breaks the default frame-loop body (banded render -> two-phase fill ->
quantize -> matmul crop -> resize) into stages on a realistic 3-grid
1024^2 scene, plus the CNN front-end, so perf work aims at the real
bottleneck. Usage: python tools/profile_banded.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return [np.asarray(l.ravel()[:1]) for l in leaves if hasattr(l, "ravel")]


def timeit(fn, *args, reps=6):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = w = size

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.ops.geometry import (apply_shift, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.pipeline.kenburns import compute_pose_shift

    camera = CameraConfig()
    zoom = ZoomSettings.default_3d(w, h)
    effect = EffectConfig()
    rng = np.random.default_rng(0)

    # realistic scene: smooth disparity + object discontinuities
    base = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    smooth = np.asarray(jax.image.resize(jnp.asarray(base), (h, w),
                                         "bicubic"))
    disparity = 20.0 + 60.0 * (smooth - smooth.min()) / np.ptp(smooth)
    for _ in range(6):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        hh, ww = rng.integers(h // 16, h // 4, 2)
        disparity[cy:cy + hh, cx:cx + ww] = rng.uniform(80, 120)
    disparity = disparity / disparity.max() * camera.baseline
    depth = np.asarray(disparity_to_depth(jnp.asarray(disparity),
                                          camera.focal, camera.baseline))
    points = np.asarray(depth_to_points(jnp.asarray(depth), camera.focal))

    g_xyz = [points]
    g_data = [np.concatenate(
        [rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
         depth[..., None]], axis=-1)]
    g_valid = [np.ones((h, w), np.float32)]
    for k in (1, 2):
        p2 = points.copy()
        p2[..., 0] += 2.0 * k
        g_xyz.append(p2)
        g_data.append(g_data[0])
        g_valid.append((rng.uniform(0, 1, (h, w)) < 0.15)
                       .astype(np.float32))
    xyz = jnp.asarray(np.stack(g_xyz))
    data = jnp.asarray(np.stack(g_data))
    valid = jnp.asarray(np.stack(g_valid))

    dmin = float(depth.min())
    anchor = (jnp.float32(dmin), jnp.float32(w * 0.45),
              jnp.float32(h * 0.55))
    shift = compute_pose_shift(0.5, camera.focal, anchor, zoom, camera,
                               w, h)
    xyz_s = jnp.asarray(apply_shift(xyz, shift))

    print(f"== banded frame profile, size {size}, 3 grids ==")

    from kbe_tpu.ops import splat_banded as sb

    full = jax.jit(lambda x, d, v: sb.render_grids_banded(
        x, d, h, w, camera.focal, camera.baseline, v))
    print(f"banded full:        {timeit(full, xyz_s, data, valid):8.2f} ms")

    # prepass: everything before pallas_call (mirrors render_grids_banded)
    from jax import lax
    from kbe_tpu.ops.geometry import project_points, splat_error

    def prepass(x, dat, v):
        g = x.shape[0]
        c = dat.shape[-1]
        u, vv, ok = project_points(x, h, w, camera.focal)
        ok = ok & (v > 0.0)
        key = lax.optimization_barrier(
            splat_error(x[..., 2], camera.focal, camera.baseline)) - sb._BIG
        hp = sb._ceil_to(h, sb.CHUNK_H)
        wp = sb._ceil_to(w, sb.CHUNK_W)
        padding = ((0, 0), (0, hp - h), (0, wp - w))
        yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        x0 = jnp.floor(u)
        y0 = jnp.floor(vv)
        dyf = y0 - yy
        dxf = x0 - xx
        fx = jnp.where(ok, u - x0, 0.0)
        fy = jnp.where(ok, vv - y0, 0.0)
        keyp = jnp.where(ok, key, sb._BIG)
        okp = jnp.pad(ok, padding)
        pad_dy = jnp.pad(jnp.where(ok, dyf, 0.0), padding)
        pad_dx = jnp.pad(jnp.where(ok, dxf, 0.0), padding)
        big = jnp.float32(3e38)
        dy_lo = sb._chunk_minmax(pad_dy, okp, jnp.min, big)
        dy_hi = sb._chunk_minmax(pad_dy, okp, jnp.max, -big)
        dx_lo = sb._chunk_minmax(pad_dx, okp, jnp.min, big)
        dx_hi = sb._chunk_minmax(pad_dx, okp, jnp.max, -big)
        empty = dy_lo > 1e38
        base_dy = jnp.where(empty, 0.0, dy_lo).astype(jnp.int32)
        base_dx = jnp.where(empty, 0.0, dx_lo).astype(jnp.int32)
        nc_y = hp // sb.CHUNK_H
        nc_x = wp // sb.CHUNK_W

        def bcast(per_chunk):
            return jnp.repeat(
                jnp.repeat(per_chunk.reshape(g, nc_y, nc_x)
                           .astype(jnp.float32), sb.CHUNK_H, axis=1),
                sb.CHUNK_W, axis=2)

        rdy = jnp.where(okp, pad_dy - bcast(base_dy), float(sb._RSENT))
        rdx = jnp.where(okp, pad_dx - bcast(base_dx), float(sb._RSENT))
        pad_fx = jnp.pad(fx, padding)
        pad_fy = jnp.pad(fy, padding)
        pad_k = jnp.pad(keyp, padding, constant_values=sb._BIG)
        ones = ok.astype(jnp.float32)[..., None]
        pay = jnp.concatenate([dat.astype(jnp.float32) * ones, ones],
                              axis=-1)
        pad_p = jnp.pad(pay, padding + ((0, 0),))
        records = sb._pack_records_banded(rdy, rdx, pad_fx, pad_fy, pad_k,
                                          pad_p)
        nc = records.shape[0]
        n_ty = -(-h // sb.TILE_H)
        n_tx = -(-w // sb.TILE_W)
        capacity = 4 * nc
        pad_u = jnp.pad(jnp.where(ok, u, -1e9).astype(jnp.float32),
                        padding, constant_values=-1e9)
        pad_v = jnp.pad(jnp.where(ok, vv, -1e9).astype(jnp.float32),
                        padding, constant_values=-1e9)
        minu, maxu, minv, maxv = sb._chunk_boxes(pad_u, pad_v, okp)
        chunk_ids, offsets, overflow, _ = sb._build_csr(
            minu, maxu, minv, maxv, n_ty, n_tx, capacity, sb.TILE_H,
            sb.TILE_W)
        return records, chunk_ids, offsets

    prep = jax.jit(prepass)
    print(f"banded prepass:     {timeit(prep, xyz_s, data, valid):8.2f} ms")

    # csr sort alone
    def csr_only(x, v):
        u, vv, ok = project_points(x, h, w, camera.focal)
        ok = ok & (v > 0.0)
        hp = sb._ceil_to(h, sb.CHUNK_H)
        wp = sb._ceil_to(w, sb.CHUNK_W)
        padding = ((0, 0), (0, hp - h), (0, wp - w))
        okp = jnp.pad(ok, padding)
        pad_u = jnp.pad(jnp.where(ok, u, -1e9).astype(jnp.float32),
                        padding, constant_values=-1e9)
        pad_v = jnp.pad(jnp.where(ok, vv, -1e9).astype(jnp.float32),
                        padding, constant_values=-1e9)
        n_ty = -(-h // sb.TILE_H)
        n_tx = -(-w // sb.TILE_W)
        nc = okp.shape[0] * (hp // sb.CHUNK_H) * (wp // sb.CHUNK_W)
        minu, maxu, minv, maxv = sb._chunk_boxes(pad_u, pad_v, okp)
        return sb._build_csr(minu, maxu, minv, maxv, n_ty, n_tx, 4 * nc,
                             sb.TILE_H, sb.TILE_W)[0]
    print(f"csr build alone:    "
          f"{timeit(jax.jit(csr_only), xyz_s, valid):8.2f} ms")

    # fill (phase-1 only + two-phase on a typical render)
    from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas

    render, weight, _ = jax.block_until_ready(full(xyz_s, data, valid))
    rdepth = render[..., 3:4] * (weight > 0.0)
    fill2 = jax.jit(lambda r, dd: fill_disocclusion_pallas(
        r, dd, effect.fill_march_steps,
        phase1_steps=effect.fill_march_phase1))
    print(f"fill two-phase:     {timeit(fill2, render, rdepth):8.2f} ms")

    # crop + resize + quantize
    from kbe_tpu.ops.resize import crop_rect_subpix_mm, resize_bilinear
    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)

    filled = jax.block_until_ready(fill2(render, rdepth))

    def tail(f):
        rgb = jnp.floor(jnp.clip(f[..., 0:3] * 255.0, 0.0, 255.0))
        patch = crop_rect_subpix_mm(rgb[0], max_cw, max_ch, w / 2.0,
                                    h / 2.0)
        patch = jnp.clip(jnp.round(patch), 0.0, 255.0)
        out = resize_bilinear(patch[None], h, w)[0]
        return jnp.clip(jnp.round(out), 0.0, 255.0)
    print(f"quant+crop+resize:  {timeit(jax.jit(tail), filled):8.2f} ms")

    # whole frame body (what lax.map runs per pose)
    def frame_body(x, d, v):
        r, we, _ = sb.render_grids_banded(x, d, h, w, camera.focal,
                                          camera.baseline, v)
        rd = r[..., 3:4] * (we > 0.0)
        f = fill_disocclusion_pallas(r, rd, effect.fill_march_steps,
                                     phase1_steps=effect.fill_march_phase1)
        return tail(f)
    print(f"frame body:         "
          f"{timeit(jax.jit(frame_body), xyz_s, data, valid):8.2f} ms")

    # frame body under lax.map over 8 poses (amortized per frame)
    steps8 = jnp.linspace(0.2, 0.8, 8)

    @jax.jit
    def loop8(x, d, v):
        def body(s):
            sh = compute_pose_shift(s, camera.focal, anchor, zoom, camera,
                                    w, h)
            return frame_body(apply_shift(x, sh), d, v)
        return lax.map(body, steps8)
    t8 = timeit(loop8, xyz, data, valid, reps=3)
    print(f"lax.map 8 poses:    {t8:8.2f} ms  ({t8/8:6.2f} ms/frame)")


if __name__ == "__main__":
    main()
