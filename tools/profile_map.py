"""Amortized per-stage frame costs via lax.map over poses.

Each wall-clock measurement of a single jitted call through the axon
tunnel carries ~30 ms dispatch latency, so single-stage timings lie.
Instead: build cumulative stage subsets of the default frame body
(banded render -> two-phase fill -> quantize -> crop -> resize), map
each over N poses in ONE jitted call, and difference the amortized
per-frame times. Usage: python tools/profile_map.py [size] [n_poses]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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
    n_poses = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h = w = size

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.ops.geometry import (apply_shift, depth_to_points,
                                      disparity_to_depth)
    from kbe_tpu.ops.splat_banded import render_grids_banded
    from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas
    from kbe_tpu.ops.resize import crop_rect_subpix_mm, resize_bilinear
    from kbe_tpu.pipeline.kenburns import compute_pose_shift

    camera = CameraConfig()
    zoom = ZoomSettings.default_3d(w, h)
    effect = EffectConfig()
    rng = np.random.default_rng(0)

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
    cloud_xyz = jnp.asarray(np.stack(g_xyz))
    cloud_data = jnp.asarray(np.stack(g_data))
    cloud_valid = jnp.asarray(np.stack(g_valid))

    dmin = float(depth.min())
    anchor = (jnp.float32(dmin), jnp.float32(w * 0.45),
              jnp.float32(h * 0.55))
    steps = jnp.linspace(0.0, 1.0, n_poses)
    focals = jnp.full((n_poses,), camera.focal, jnp.float32)
    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)

    # static fill ROI, mirroring kenburns.build_effect_fn
    rx0 = max(0, int(np.floor(w / 2.0 - (max_cw - 1) / 2.0)) - 2)
    rx1 = min(w, int(np.floor(w / 2.0 + (max_cw - 1) / 2.0)) + 3)
    ry0 = max(0, int(np.floor(h / 2.0 - (max_ch - 1) / 2.0)) - 2)
    ry1 = min(h, int(np.floor(h / 2.0 + (max_ch - 1) / 2.0)) + 3)
    roi = (ry0, ry1, rx0, rx1)
    if roi == (0, h, 0, w):
        roi = None
    print(f"fill roi: {roi}")

    from kbe_tpu.ops import splat_banded as sb
    from kbe_tpu.ops.discfill_pallas import (_fill_single_fused,
                                             _fill_single_pallas)
    from kbe_tpu.ops.geometry import project_points, splat_error

    def prepass_only(xyz, focal):
        """records + CSR, mirroring render_grids_banded's XLA prologue."""
        g = xyz.shape[0]
        u, v, ok = project_points(xyz, h, w, focal)
        ok = ok & (cloud_valid > 0.0)
        key = lax.optimization_barrier(
            splat_error(xyz[..., 2], focal, camera.baseline)) - sb._BIG
        hp = sb._ceil_to(h, sb.CHUNK_H)
        wp = sb._ceil_to(w, sb.CHUNK_W)
        padding = ((0, 0), (0, hp - h), (0, wp - w))
        yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        x0 = jnp.floor(u)
        y0 = jnp.floor(v)
        fx = jnp.where(ok, u - x0, 0.0)
        fy = jnp.where(ok, v - y0, 0.0)
        keyp = jnp.where(ok, key, sb._BIG)
        okp = jnp.pad(ok, padding)
        pad_dy = jnp.pad(jnp.where(ok, y0 - yy, 0.0), padding)
        pad_dx = jnp.pad(jnp.where(ok, x0 - xx, 0.0), padding)
        big = jnp.float32(3e38)
        dy_lo = sb._chunk_minmax(pad_dy, okp, jnp.min, big)
        dx_lo = sb._chunk_minmax(pad_dx, okp, jnp.min, big)
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
        pay = jnp.concatenate([cloud_data.astype(jnp.float32) * ones,
                               ones], -1)
        pad_p = jnp.pad(pay, padding + ((0, 0),))
        records = sb._pack_records_banded(rdy, rdx, pad_fx, pad_fy, pad_k,
                                          pad_p)
        nc = records.shape[0]
        n_ty = -(-h // sb.TILE_H)
        n_tx = -(-w // sb.TILE_W)
        pad_u = jnp.pad(jnp.where(ok, u, -1e9).astype(jnp.float32),
                        padding, constant_values=-1e9)
        pad_v = jnp.pad(jnp.where(ok, v, -1e9).astype(jnp.float32),
                        padding, constant_values=-1e9)
        minu, maxu, minv, maxv = sb._chunk_boxes(pad_u, pad_v, okp)
        chunk_ids, offsets, overflow, _ = sb._build_csr(
            minu, maxu, minv, maxv, n_ty, n_tx, 4 * nc, sb.TILE_H,
            sb.TILE_W)
        return (jnp.sum(records[0, 0]) + jnp.sum(chunk_ids[:8])
                + jnp.sum(offsets[:8]))

    def body(args, upto):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        xyz = apply_shift(cloud_xyz, shift)
        if upto == "shift":
            return jnp.sum(xyz[..., 0])
        data = cloud_data
        if upto == "prepass":
            return prepass_only(xyz, focal)
        render, weight, overflow = render_grids_banded(
            xyz, data, h, w, focal, camera.baseline,
            valid=cloud_valid)
        if upto == "render":
            return jnp.sum(render[..., 0])
        render_depth = render[..., 3:4] * (weight > 0.0)
        if upto == "fillp1":
            f1, unresolved = _fill_single_fused(
                render[0], render_depth[0], effect.fill_march_phase1,
                False, roi)
            return (jnp.sum(f1[..., 0])
                    + jnp.sum(unresolved.astype(jnp.float32)))
        if upto == "fillp2":
            f2 = _fill_single_pallas(render[0], render_depth[0],
                                     effect.fill_march_steps, False, roi)
            return jnp.sum(f2[..., 0])
        filled = fill_disocclusion_pallas(
            render, render_depth, effect.fill_march_steps,
            phase1_steps=effect.fill_march_phase1, roi=roi)
        if upto == "fill":
            return jnp.sum(filled[..., 0])
        rgb = jnp.floor(jnp.clip(filled[..., 0:3] * 255.0, 0.0, 255.0))
        patch = crop_rect_subpix_mm(rgb[0], max_cw, max_ch, w / 2.0,
                                    h / 2.0)
        patch = jnp.clip(jnp.round(patch), 0.0, 255.0)
        out = resize_bilinear(patch[None], h, w)[0]
        return jnp.sum(jnp.clip(jnp.round(out), 0.0, 255.0))

    print(f"== amortized map profile, size {size}, {n_poses} poses, "
          f"3 grids ==")
    prev = 0.0
    for upto in ("shift", "prepass", "render", "fillp1", "fillp2", "fill",
                 "full"):
        fn = jax.jit(lambda xs, u=upto: lax.map(
            lambda a: body(a, u), xs, batch_size=None))
        ms = timeit(fn, (steps, focals))
        per = ms / n_poses
        print(f"upto {upto:8s}: {ms:8.2f} ms total  {per:7.2f} ms/frame  "
              f"(+{per - prev:6.2f})")
        prev = per

    # how often does phase 1 fail to settle?
    def unresolved(args):
        step, focal = args
        shift = compute_pose_shift(step, focal, anchor, zoom, camera, w, h)
        xyz = apply_shift(cloud_xyz, shift)
        data = cloud_data
        render, weight, _ = render_grids_banded(
            xyz, data, h, w, focal, camera.baseline, valid=cloud_valid)
        render_depth = render[..., 3:4] * (weight > 0.0)
        _, unr = _fill_single_fused(render[0], render_depth[0],
                                    effect.fill_march_phase1, False, roi)
        return jnp.any(unr), jnp.sum(unr.astype(jnp.int32))
    frames_flagged, tiles = jax.jit(
        lambda xs: lax.map(unresolved, xs))((steps, focals))
    print(f"phase-2 frames: {int(np.sum(np.asarray(frames_flagged)))}"
          f"/{n_poses}  (flagged tiles per frame: "
          f"{np.asarray(tiles).tolist()})")


if __name__ == "__main__":
    main()
