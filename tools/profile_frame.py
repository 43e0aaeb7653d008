"""Per-stage timing of the 1024^2 frame budget on the real chip.

Times, separately: the CNN front-end, the routed-splat prepass (project +
pack + CSR build + gather), the routed Pallas kernel alone, the full
routed render, the delta render, the disocclusion fill, and crop+resize —
on a realistic synthetic scene (smooth depth + step discontinuities, the
actual default 3D trajectory's pose shifts, 3 stacked grids).

Usage: python tools/profile_frame.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
from kbe_tpu.ops.geometry import (apply_shift, depth_to_points,
                                  disparity_to_depth, solve_shift)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:16].astype(jnp.float32)))


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


def make_scene(size, seed=0):
    """Smooth depth + sharp object discontinuities, 3 grids like the real
    pipeline (base + two inpaint extensions with partial validity)."""
    rng = np.random.default_rng(seed)
    h = w = size
    # smooth background depth field
    base = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    import jax.image
    smooth = np.asarray(jax.image.resize(jnp.asarray(base), (h, w), "bicubic"))
    disparity = 20.0 + 60.0 * (smooth - smooth.min()) / np.ptp(smooth)
    # foreground objects: rectangles of high disparity (big displacement)
    for _ in range(6):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        hh, ww = rng.integers(h // 16, h // 4, 2)
        disparity[cy:cy + hh, cx:cx + ww] = rng.uniform(80, 120)
    camera = CameraConfig()
    disparity = disparity / disparity.max() * camera.baseline
    depth = np.asarray(disparity_to_depth(jnp.asarray(disparity), camera.focal,
                                          camera.baseline))
    return disparity, depth, camera


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = w = size
    disparity, depth, camera = make_scene(size)
    zoom = ZoomSettings.default_3d(w, h)
    effect = EffectConfig()

    points = np.asarray(depth_to_points(jnp.asarray(depth), camera.focal))
    rng = np.random.default_rng(1)

    # 3 grids: base + 2 pseudo-inpaint grids (shifted copies, partial valid)
    g_xyz = [points]
    g_data = [np.concatenate([rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
                              depth[..., None]], axis=-1)]
    g_valid = [np.ones((h, w), np.float32)]
    for k in (1, 2):
        p2 = points.copy()
        p2[..., 0] += 2.0 * k
        g_xyz.append(p2)
        g_data.append(g_data[0])
        g_valid.append((rng.uniform(0, 1, (h, w)) < 0.15).astype(np.float32))
    xyz = jnp.asarray(np.stack(g_xyz))
    data = jnp.asarray(np.stack(g_data))
    valid = jnp.asarray(np.stack(g_valid))

    # a middle-of-trajectory pose shift
    dmin = float(depth.min())
    anchor = (dmin, float(w * 0.45), float(h * 0.55))
    shift = solve_shift(zoom.src.center_u - w / 2 + 20.0,
                        zoom.src.center_v - h / 2 + 10.0,
                        dmin, dmin * 0.93, *anchor[0:1], anchor[1], anchor[2],
                        w, h, camera.focal) \
        if False else None
    # simpler: use kenburns compute_pose_shift
    from kbe_tpu.pipeline.kenburns import compute_pose_shift
    anchor_j = (jnp.float32(dmin), jnp.float32(w * 0.45), jnp.float32(h * 0.55))
    shift = compute_pose_shift(0.5, camera.focal, anchor_j, zoom, camera, w, h)
    xyz_s = jnp.asarray(apply_shift(xyz, shift))

    print(f"== size {size}, grids 3, trajectory default_3d ==")

    # ---- full routed render
    from kbe_tpu.ops import splat_routed as sr
    full = jax.jit(lambda x, d, v: sr.render_grids_routed(
        x, d, h, w, camera.focal, camera.baseline, v))
    print(f"routed full:     {timeit(full, xyz_s, data, valid):8.2f} ms")

    # ---- prepass only (everything before pallas_call)
    def prepass(x, dat, v):
        from jax import lax
        from kbe_tpu.ops.geometry import project_points, splat_error
        g = x.shape[0]
        c = dat.shape[-1]
        u, vv, ok = project_points(x, h, w, camera.focal)
        ok = ok & (v > 0.0)
        key = lax.optimization_barrier(
            splat_error(x[..., 2], camera.focal, camera.baseline)) - sr._BIG
        hp = sr._ceil_to(h, sr.CHUNK_H)
        wp = sr._ceil_to(w, sr.CHUNK_W)
        padding = ((0, 0), (0, hp - h), (0, wp - w))
        pad_u = jnp.pad(jnp.where(ok, u, -1e9).astype(jnp.float32), padding,
                        constant_values=-1e9)
        pad_v = jnp.pad(jnp.where(ok, vv, -1e9).astype(jnp.float32), padding,
                        constant_values=-1e9)
        pad_k = jnp.pad(jnp.where(ok, key, sr._BIG).astype(jnp.float32),
                        padding, constant_values=sr._BIG)
        ones = ok.astype(jnp.float32)[..., None]
        pay = jnp.concatenate([dat.astype(jnp.float32) * ones, ones], axis=-1)
        pad_p = jnp.pad(pay, padding + ((0, 0),))
        ok_p = jnp.pad(ok, padding)
        records = sr._pack_records(pad_u, pad_v, pad_k, pad_p)
        nc = records.shape[0]
        th, tw = sr.TILE_H, sr.TILE_W
        n_ty, n_tx = -(-h // th), -(-w // tw)
        capacity = 6 * nc
        minu, maxu, minv, maxv = sr._chunk_boxes(pad_u, pad_v, ok_p)
        chunk_ids, offsets, overflow, _dropped = sr._build_csr(
            minu, maxu, minv, maxv, n_ty, n_tx, capacity, th, tw)
        rec_csr = jnp.take(records, chunk_ids, axis=0)
        return rec_csr, offsets

    prep = jax.jit(prepass)
    print(f"routed prepass:  {timeit(prep, xyz_s, data, valid):8.2f} ms")
    rec_csr, offsets = jax.block_until_ready(prep(xyz_s, data, valid))
    n_used = int(offsets[-1])
    cap = rec_csr.shape[0]
    print(f"   CSR slots used: {n_used} / {cap} "
          f"({rec_csr.nbytes/1e6:.0f} MB csr buffer)")

    # ---- kernel only (prepass results precomputed)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    d = data.shape[-1] + 1
    th, tw = sr.TILE_H, sr.TILE_W
    n_ty, n_tx = -(-h // th), -(-w // tw)
    t = n_ty * n_tx
    rgh = th + sr._HALO_LO + sr._HALO_HI
    rgw = tw + sr._HALO_LO + sr._HALO_HI
    pp = rgh * rgw
    ppad = sr._ceil_to(pp, 128)
    rows_out = sr._ceil_to(4 * d, 8)
    flat = np.arange(ppad, dtype=np.int32)
    rowcol = jnp.asarray(np.stack([flat % rgw, flat // rgw])
                         .reshape(2, 1, ppad).repeat(4, axis=1)
                         .reshape(8, ppad))
    rec_rows = rec_csr.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, rec_rows, sr.CHUNK_W), jnp.float32),
                        pltpu.VMEM((rows_out, ppad), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())])
    kern = jax.jit(lambda o, r: pl.pallas_call(
        sr._build_kernel(rgh, rgw, ppad, d, rows_out, h, w, th, tw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, rows_out, ppad), jnp.float32))(
            o, rowcol, r))
    print(f"routed kernel:   {timeit(kern, offsets, rec_csr):8.2f} ms")

    # ---- delta full
    from kbe_tpu.ops.legacy import splat_delta as sd
    dfull = jax.jit(lambda x, dd, v: sd.render_grids_delta(
        x, dd, h, w, camera.focal, camera.baseline, v))
    print(f"delta full:      {timeit(dfull, xyz_s, data, valid):8.2f} ms")

    # ---- disocclusion fill
    from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas
    render = jnp.asarray(rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32))
    holes = jnp.asarray((rng.uniform(0, 1, (1, h, w, 1)) > 0.05)
                        .astype(np.float32))
    rdepth = render[..., 3:4] * holes
    fill = jax.jit(lambda r, dd: fill_disocclusion_pallas(r, dd,
                                                          effect.fill_march_steps))
    print(f"fill pallas:     {timeit(fill, render, rdepth):8.2f} ms")

    # ---- crop + resize
    from kbe_tpu.ops.resize import crop_rect_subpix, resize_bilinear
    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)

    def crop_resize(r):
        patch = crop_rect_subpix(r[0, ..., :3], max_cw, max_ch, w / 2, h / 2)
        return resize_bilinear(patch[None], h, w)[0]
    cr = jax.jit(crop_resize)
    print(f"crop+resize:     {timeit(cr, render):8.2f} ms")

    # ---- CNN front-end (semantics + disparity + refine at size)
    from kbe_tpu.models import Disparity, Refine, Semantics
    from kbe_tpu.models.gridnet import ContextNet
    sem_def = Semantics(dtype=jnp.bfloat16)
    disp_def = Disparity(dtype=jnp.bfloat16)
    ref_def = Refine(dtype=jnp.bfloat16)
    k0 = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    half = jax.image.resize(img, (1, h // 2, w // 2, 3), "linear")
    ps = sem_def.init(k0, half)
    sem_out = sem_def.apply(ps, half)
    pd = disp_def.init(k0, half, sem_out)
    disp_half = disp_def.apply(pd, half, sem_out)
    pr = ref_def.init(k0, img, disp_half)

    def cnns(img, half):
        s = sem_def.apply(ps, half)
        dh = disp_def.apply(pd, half, s)
        return ref_def.apply(pr, img, dh)
    cnn = jax.jit(cnns)
    print(f"cnn front-end:   {timeit(cnn, img, half):8.2f} ms")


if __name__ == "__main__":
    main()
