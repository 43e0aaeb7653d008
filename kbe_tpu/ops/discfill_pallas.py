"""Pallas TPU disocclusion fill — VMEM-window ray marching.

Same semantics as ops/discfill.py (the executable spec of the reference's
``kernel_discfill_updateOutput``, utils/common.py:833-937), reformulated
so the march never re-touches HBM:

  * the validity map is processed in (16, 256) tiles; each tile DMAs one
    (16 + 2K, 256-aligned + 2K) window into VMEM — every ray step of every
    pixel in the tile lands inside the window
  * the 32 rays (16 directions x both ways) march with a dynamic
    ``while_loop`` over k that exits as soon as every ray of every pixel
    has found its event (valid pixel or image border) — tiles without
    holes skip the march entirely, and real holes are usually a few
    pixels wide, so the loop runs ~10 steps instead of K
  * offsets come from the same c_round tables as the spec, scalar-
    prefetched to SMEM; the window reads are dynamic 2D VMEM slices
  * distance + first-strict-min direction selection and the from/to
    endpoint choice run in-kernel; the fused kernels also capture the
    endpoint payloads in-kernel so no XLA gather epilogue remains

Two-phase adaptive schedule (``phase1_steps``): a short fused march that
*proves* per-pixel stability and flags unresolved tiles; a second pass
re-marches ONLY the flagged tiles at the full ``steps`` bound (tile ids
scalar-prefetched, inactive grid slots skip all work) and scatters the
re-filled tiles over the phase-1 result. Bit-identical to the one-phase
march for every input.

``roi`` (static (y0, y1, x0, x1)): treat pixels outside the rectangle as
non-holes. The pipeline's final crop discards everything outside the
centered max-crop window, so border hole bands (camera shift exposing
unrendered margins) never need the expensive wide marches; in-ROI results
are bit-identical to the full fill because march *sources* are unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kbe_tpu.ops.discfill import _offset_tables

# Tile geometry, env-overridable for hardware sweeps (read once at
# import; baked into the kernels at trace time).
# Round-5 sweep at 1024^2/75 in the full pipeline: 16x256 tiles 55.1
# fps, 32x256 59.3, 64x256 61.5 (per-tile dispatch overhead dominated
# the gated march), 32x512 regressed to 55.4, 128x256 OOMs VMEM in the
# phase-2 K=128 march. Bigger tiles coarsen the hole-tile census that
# EffectConfig.fill_phase0_gate thresholds — recalibrate it if changed.
TILE_H = int(os.environ.get("KBE_FILL_TILE_H", "64"))
TILE_W = int(os.environ.get("KBE_FILL_TILE_W", "256"))
_KCHUNK = 4  # ray steps folded into one while-loop iteration


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _window_dims(steps: int) -> Tuple[int, int]:
    """VMEM window size for the aligned (16, 256)-superset reads."""
    wh = 2 * steps + 2 * TILE_H
    ww = _ceil_to(2 * steps, TILE_W) + 2 * TILE_W
    return wh, ww


def _roi_hole_mask(hole, gy0, gx0, roi):
    """Zero hole flags outside the static ROI rectangle.

    ``gy0``/``gx0``: (traced) image coords of the tile origin.
    """
    if roi is None:
        return hole
    y0, y1, x0, x1 = roi
    yy = gy0 + lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    xx = gx0 + lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    ins = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))
    return hole * ins.astype(jnp.int32)


def _build_kernel(steps, wh, ww, height, width):
    def kernel(oy_ref, ox_ref, vpad_hbm, out_ref, win, out_scr, win_sem,
               out_sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)

        cp = pltpu.make_async_copy(
            vpad_hbm.at[pl.ds(ty * TILE_H, wh), pl.ds(tx * TILE_W, ww)],
            win, win_sem)
        cp.start()
        cp.wait()

        center = win[steps:steps + TILE_H, steps:steps + TILE_W]
        hole = (center == 0).astype(jnp.int32)  # in-image invalid pixels

        zero_i = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        def march(r):
            """First event of ray r for every tile pixel: endpoint offsets
            and whether the endpoint is a valid pixel. Masks are carried as
            int32 0/1 (Mosaic rejects i1 vector carries)."""

            def cond(carry):
                k, found = carry[0], carry[1]
                return (k < steps) & (jnp.min(found) < 1)

            def body(carry):
                k, found, ev_oy, ev_ox, ev_valid = carry
                # _KCHUNK ray steps per iteration amortize the loop's
                # scalar overhead (cond reduce + branch).
                for j in range(_KCHUNK):
                    kj = jnp.minimum(k + j, steps - 1)
                    dy = oy_ref[r, kj]
                    dx = ox_ref[r, kj]
                    # Mosaic requires provably aligned dynamic vector
                    # loads: read an aligned 2x superset and shift the
                    # remainder in-register with dynamic rolls.
                    off_y = steps + dy
                    off_x = steps + dx
                    ybase = (off_y // TILE_H) * TILE_H
                    xbase = (off_x // TILE_W) * TILE_W
                    v = win[pl.ds(ybase, 2 * TILE_H),
                            pl.ds(xbase, 2 * TILE_W)]
                    v = pltpu.roll(v, -(off_y - ybase), axis=0)[:TILE_H]
                    blk = pltpu.roll(v, -(off_x - xbase),
                                     axis=1)[:, :TILE_W]
                    is_valid = (blk == 1).astype(jnp.int32)
                    event = ((is_valid | (blk == -1).astype(jnp.int32))
                             & (1 - found))
                    event = event * (k + j < steps)
                    ev_oy = jnp.where(event > 0, dy, ev_oy)
                    ev_ox = jnp.where(event > 0, dx, ev_ox)
                    ev_valid = jnp.where(event > 0, is_valid, ev_valid)
                    found = found | event
                return k + _KCHUNK, found, ev_oy, ev_ox, ev_valid

            # pixels that are not holes never need this ray: mark found
            _, _, ev_oy, ev_ox, ev_valid = lax.while_loop(
                cond, body, (0, 1 - hole, zero_i, zero_i, zero_i))
            return ev_oy, ev_ox, ev_valid

        best_dist = jnp.full((TILE_H, TILE_W), 3e38, jnp.float32)
        b_fy = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        b_fx = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        b_ty = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        b_tx = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        for d in range(16):
            t_oy, t_ox, t_ok = march(d)
            f_oy, f_ox, f_ok = march(d + 16)
            both = (t_ok & f_ok) > 0
            dx_d = (t_ox - f_ox).astype(jnp.float32)
            dy_d = (t_oy - f_oy).astype(jnp.float32)
            dist = jnp.sqrt(dx_d * dx_d + dy_d * dy_d)
            dist = jnp.where(both, dist, jnp.float32(3e38))
            better = dist < best_dist  # strict: first minimum wins
            best_dist = jnp.where(better, dist, best_dist)
            b_fy = jnp.where(better, f_oy, b_fy)
            b_fx = jnp.where(better, f_ox, b_fx)
            b_ty = jnp.where(better, t_oy, b_ty)
            b_tx = jnp.where(better, t_ox, b_tx)

        do_fill = hole * (best_dist < 1e38).astype(jnp.int32)
        out_scr[0:TILE_H, :] = b_fy
        out_scr[TILE_H:2 * TILE_H, :] = b_fx
        out_scr[2 * TILE_H:3 * TILE_H, :] = b_ty
        out_scr[3 * TILE_H:4 * TILE_H, :] = b_tx
        out_scr[4 * TILE_H:5 * TILE_H, :] = do_fill
        cp = pltpu.make_async_copy(out_scr, out_ref.at[ty, tx], out_sem)
        cp.start()
        cp.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("steps", "interpret", "roi"))
def _fill_single_pallas(image, depth, steps, interpret, roi=None):
    h, w, c = image.shape
    valid = depth[..., 0] > 0.0

    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    n_ty = hp // TILE_H
    n_tx = wp // TILE_W
    wh, ww = _window_dims(steps)

    # -1 = outside the image, 1 = valid, 0 = hole
    vmap_ = jnp.full((hp, wp), -1, jnp.int32)
    vmap_ = vmap_.at[:h, :w].set(valid.astype(jnp.int32))
    rows = (n_ty - 1) * TILE_H + wh
    lanes = (n_tx - 1) * TILE_W + ww
    vpad = jnp.full((rows, lanes), -1, jnp.int32)
    vpad = vpad.at[steps:steps + hp, steps:steps + wp].set(vmap_)

    ox_np, oy_np = _offset_tables(steps)
    oy = jnp.asarray(oy_np)
    ox = jnp.asarray(ox_np)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((wh, ww), jnp.int32),
            pltpu.VMEM((5 * TILE_H, TILE_W), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _build_kernel(steps, wh, ww, h, w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ty, n_tx, 5 * TILE_H, TILE_W),
                                       jnp.int32),
        interpret=interpret,
    )(oy, ox, vpad)

    # (n_ty, n_tx, 5*TILE_H, TILE_W) -> five (H, W) maps
    maps = out.reshape(n_ty, n_tx, 5, TILE_H, TILE_W)
    maps = jnp.transpose(maps, (2, 0, 3, 1, 4)).reshape(
        5, hp, wp)[:, :h, :w]
    o_fy, o_fx, o_ty, o_tx, do_fill = (maps[0], maps[1], maps[2], maps[3],
                                       maps[4] > 0)

    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if roi is not None:
        y0, y1, x0, x1 = roi
        do_fill = do_fill & ((yy >= y0) & (yy < y1) & (xx >= x0)
                             & (xx < x1))
    bfy, bfx = yy + o_fy, xx + o_fx
    bty, btx = yy + o_ty, xx + o_tx

    dflat = depth[..., 0].reshape(-1)
    d_from = dflat[jnp.clip(bfy * w + bfx, 0, h * w - 1)]
    d_to = dflat[jnp.clip(bty * w + btx, 0, h * w - 1)]
    use_to = d_from < d_to  # farther endpoint (background) wins
    fill_y = jnp.where(use_to, bty, bfy)
    fill_x = jnp.where(use_to, btx, bfx)

    flat = jnp.clip(fill_y * w + fill_x, 0, h * w - 1)
    filled = image.reshape(-1, c)[flat]
    return jnp.where(do_fill[..., None], filled, image)


def _tile_fill_core(oy_ref, ox_ref, win, cap_scr, steps, c, hole):
    """March + endpoint-payload capture + selection for ONE tile.

    ``win``: (2+c, wh, ww) planes in VMEM (0 validity, 1 depth, 2+ image);
    ``hole``: (TILE_H, TILE_W) int32 0/1 — which pixels need filling.
    Returns (filled channel tiles [c x (TILE_H, TILE_W)], unresolved mask).
    The event offset is uniform across the tile, so every capture is the
    same aligned-window read + roll as the validity probe.
    """
    npl = 1 + c  # captured planes per ray: depth + image channels
    zero_i = jnp.zeros((TILE_H, TILE_W), jnp.int32)

    def window_at(p, off_y, off_x, ybase, xbase):
        v = win[p, pl.ds(ybase, 2 * TILE_H), pl.ds(xbase, 2 * TILE_W)]
        v = pltpu.roll(v, -(off_y - ybase), axis=0)[:TILE_H]
        return pltpu.roll(v, -(off_x - xbase), axis=1)[:, :TILE_W]

    def march(r, slot):
        """First event of ray r; captures endpoint depth+image into
        cap_scr slot. Returns (ev_oy, ev_ox, ev_valid, found_all)."""

        # zero this slot's captures
        row0 = slot * npl * TILE_H
        cap_scr[pl.ds(row0, npl * TILE_H), :] = jnp.zeros(
            (npl * TILE_H, TILE_W), jnp.float32)

        def cond(carry):
            k, found = carry[0], carry[1]
            return (k < steps) & (jnp.min(found) < 1)

        def body(carry):
            k, found, ev_oy, ev_ox, ev_valid = carry
            for j in range(_KCHUNK):
                kj = jnp.minimum(k + j, steps - 1)
                dy = oy_ref[r, kj]
                dx = ox_ref[r, kj]
                off_y = steps + dy
                off_x = steps + dx
                ybase = (off_y // TILE_H) * TILE_H
                xbase = (off_x // TILE_W) * TILE_W
                blk = window_at(0, off_y, off_x, ybase, xbase)
                is_valid = (blk == 1.0).astype(jnp.int32)
                event = ((is_valid | (blk == -1.0).astype(jnp.int32))
                         & (1 - found))
                event = event * (k + j < steps)
                evv = event * is_valid

                @pl.when(jnp.max(evv) > 0)
                def _():
                    for p in range(npl):
                        blkp = window_at(1 + p, off_y, off_x, ybase,
                                         xbase)
                        rr = row0 + p * TILE_H
                        cur = cap_scr[pl.ds(rr, TILE_H), :]
                        cap_scr[pl.ds(rr, TILE_H), :] = jnp.where(
                            evv > 0, blkp, cur)

                ev_oy = jnp.where(event > 0, dy, ev_oy)
                ev_ox = jnp.where(event > 0, dx, ev_ox)
                ev_valid = jnp.where(event > 0, is_valid, ev_valid)
                found = found | event
            return k + _KCHUNK, found, ev_oy, ev_ox, ev_valid

        _, found, ev_oy, ev_ox, ev_valid = lax.while_loop(
            cond, body, (0, 1 - hole, zero_i, zero_i, zero_i))
        return ev_oy, ev_ox, ev_valid, found

    def captures(slot):
        row0 = slot * npl * TILE_H
        d = cap_scr[pl.ds(row0, TILE_H), :]
        img = [cap_scr[pl.ds(row0 + (1 + ch) * TILE_H, TILE_H), :]
               for ch in range(c)]
        return d, img

    best_dist = jnp.full((TILE_H, TILE_W), 3e38, jnp.float32)
    bd_from = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    bd_to = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    bimg_from = [jnp.zeros((TILE_H, TILE_W), jnp.float32)
                 for _ in range(c)]
    bimg_to = [jnp.zeros((TILE_H, TILE_W), jnp.float32)
               for _ in range(c)]
    all_evented = jnp.ones((TILE_H, TILE_W), jnp.int32)

    for d in range(16):
        t_oy, t_ox, t_ok, t_any = march(d, 0)
        d_to, img_to = captures(0)
        f_oy, f_ox, f_ok, f_any = march(d + 16, 1)
        d_from, img_from = captures(1)
        all_evented = all_evented & t_any & f_any

        both = (t_ok & f_ok) > 0
        dx_d = (t_ox - f_ox).astype(jnp.float32)
        dy_d = (t_oy - f_oy).astype(jnp.float32)
        dist = jnp.sqrt(dx_d * dx_d + dy_d * dy_d)
        dist = jnp.where(both, dist, jnp.float32(3e38))
        better = dist < best_dist  # strict: first minimum wins
        best_dist = jnp.where(better, dist, best_dist)
        bd_from = jnp.where(better, d_from, bd_from)
        bd_to = jnp.where(better, d_to, bd_to)
        for ch in range(c):
            bimg_from[ch] = jnp.where(better, img_from[ch],
                                      bimg_from[ch])
            bimg_to[ch] = jnp.where(better, img_to[ch], bimg_to[ch])

    do_fill = (hole > 0) & (best_dist < 1e38)
    use_to = bd_from < bd_to  # farther endpoint (background) wins
    rows = []
    for ch in range(c):
        fill_ch = jnp.where(use_to, bimg_to[ch], bimg_from[ch])
        cimg = win[2 + ch, steps:steps + TILE_H, steps:steps + TILE_W]
        rows.append(jnp.where(do_fill, fill_ch, cimg))

    # a resolved hole either has a provably-final winner (its pair
    # distance can't be beaten by any ray that has not evented within
    # `steps`, whose eventual pair distance is > steps - 1) or has no
    # ray left to event at all
    stable = (do_fill & (best_dist <= jnp.float32(steps - 1))) \
        | (all_evented > 0)
    unresolved = ((hole > 0) & ~stable).astype(jnp.int32)
    return rows, unresolved


def _build_fused_kernel(steps, wh, ww, c, roi):
    """Phase-1 fused fill over the full tile grid + per-tile flags."""

    def kernel(oy_ref, ox_ref, planes_hbm, out_ref, flag_ref, win, cap_scr,
               out_scr, flag_scr, win_sem, out_sem, flag_sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)

        cp = pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(ty * TILE_H, wh), pl.ds(tx * TILE_W, ww)],
            win, win_sem)
        cp.start()
        cp.wait()

        center = win[0, steps:steps + TILE_H, steps:steps + TILE_W]
        hole = (center == 0.0).astype(jnp.int32)
        hole = _roi_hole_mask(hole, ty * TILE_H, tx * TILE_W, roi)

        rows, unresolved = _tile_fill_core(oy_ref, ox_ref, win, cap_scr,
                                           steps, c, hole)
        for ch in range(c):
            out_scr[pl.ds(ch * TILE_H, TILE_H), :] = rows[ch]
        flag_scr[:, :] = jnp.full((8, 128), jnp.max(unresolved), jnp.int32)

        cp2 = pltpu.make_async_copy(out_scr, out_ref.at[ty, tx], out_sem)
        cp2.start()
        cp3 = pltpu.make_async_copy(flag_scr, flag_ref.at[ty, tx], flag_sem)
        cp3.start()
        cp2.wait()
        cp3.wait()

    return kernel


def _build_gated_kernel(steps, wh, ww, c, roi, n_tx):
    """Phase-2 fused fill over a scalar-prefetched unresolved-tile list.

    Grid slot i handles tile ``ids_ref[i]`` when ``i < cnt_ref[0]``;
    inactive slots skip all work (their output rows are dropped by the
    caller's scatter merge).
    """

    def kernel(oy_ref, ox_ref, ids_ref, cnt_ref, planes_hbm, out_ref, win,
               cap_scr, out_scr, win_sem, out_sem):
        i = pl.program_id(0)

        @pl.when(i < cnt_ref[0])
        def _():
            tid = ids_ref[i]
            ty = tid // n_tx
            tx = tid - ty * n_tx

            cp = pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(ty * TILE_H, wh),
                              pl.ds(tx * TILE_W, ww)],
                win, win_sem)
            cp.start()
            cp.wait()

            center = win[0, steps:steps + TILE_H, steps:steps + TILE_W]
            hole = (center == 0.0).astype(jnp.int32)
            hole = _roi_hole_mask(hole, ty * TILE_H, tx * TILE_W, roi)

            rows, _ = _tile_fill_core(oy_ref, ox_ref, win, cap_scr, steps,
                                      c, hole)
            for ch in range(c):
                out_scr[pl.ds(ch * TILE_H, TILE_H), :] = rows[ch]

            cp2 = pltpu.make_async_copy(out_scr, out_ref.at[i], out_sem)
            cp2.start()
            cp2.wait()

    return kernel


def _build_gated_flagging_kernel(steps, wh, ww, c, roi, n_tx):
    """Gated fused fill that ALSO reports per-slot unresolved flags —
    the phase-1 kernel of the hole-tile-gated schedule. Identical tile
    work to _build_fused_kernel, but only over the scalar-prefetched
    hole-tile list: hole-free tiles (the vast majority of a rendered
    frame once the fill ROI is applied) never DMA a window or run the
    march/selection arithmetic at all."""

    def kernel(oy_ref, ox_ref, ids_ref, cnt_ref, planes_hbm, out_ref,
               flag_ref, win, cap_scr, out_scr, flag_scr, win_sem, out_sem,
               flag_sem):
        i = pl.program_id(0)

        @pl.when(i < cnt_ref[0])
        def _():
            tid = ids_ref[i]
            ty = tid // n_tx
            tx = tid - ty * n_tx

            cp = pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(ty * TILE_H, wh),
                              pl.ds(tx * TILE_W, ww)],
                win, win_sem)
            cp.start()
            cp.wait()

            center = win[0, steps:steps + TILE_H, steps:steps + TILE_W]
            hole = (center == 0.0).astype(jnp.int32)
            hole = _roi_hole_mask(hole, ty * TILE_H, tx * TILE_W, roi)

            rows, unresolved = _tile_fill_core(oy_ref, ox_ref, win,
                                               cap_scr, steps, c, hole)
            for ch in range(c):
                out_scr[pl.ds(ch * TILE_H, TILE_H), :] = rows[ch]
            flag_scr[:, :] = jnp.full((8, 128), jnp.max(unresolved),
                                      jnp.int32)

            cp2 = pltpu.make_async_copy(out_scr, out_ref.at[i], out_sem)
            cp2.start()
            cp3 = pltpu.make_async_copy(flag_scr, flag_ref.at[i], flag_sem)
            cp3.start()
            cp2.wait()
            cp3.wait()

    return kernel


def _hole_tile_order(depth, roi, h, w, n_ty, n_tx):
    """Hole-tile list for the gated phase-1: (order (T,) i32 — flagged
    tiles first in tile order, count). Hole definition matches the
    kernels': in-image invalid (depth <= 0) pixels inside the ROI."""
    hole = depth[..., 0] <= 0.0
    if roi is not None:
        y0, y1, x0, x1 = roi
        yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        hole = hole & ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))
    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    pad = jnp.zeros((hp, wp), jnp.bool_).at[:h, :w].set(hole)
    flags = jnp.any(pad.reshape(n_ty, TILE_H, n_tx, TILE_W), axis=(1, 3))
    flags_flat = flags.reshape(-1)
    order = jnp.argsort(jnp.logical_not(flags_flat)).astype(jnp.int32)
    return order, jnp.sum(flags_flat.astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("steps", "interpret", "roi"))
def _fill_single_gated(image, depth, steps, interpret, roi=None):
    """Hole-tile-gated phase-1 fill.

    Returns (filled (H, W, C), unresolved per-tile flags (n_ty * n_tx,)).
    Bit-identical to _fill_single_fused: untouched tiles have no in-ROI
    holes, so their fill output equals the input image.
    """
    h, w = image.shape[0], image.shape[1]
    n_ty = _ceil_to(h, TILE_H) // TILE_H
    n_tx = _ceil_to(w, TILE_W) // TILE_W
    order, count = _hole_tile_order(depth, roi, h, w, n_ty, n_tx)
    return _gated_flagging_run(image, depth, image, order, count, steps,
                               interpret, roi)


def _tile_flags(mask, h, w, n_ty, n_tx):
    """(H, W) bool pixel mask -> (n_ty * n_tx,) any-per-tile flags."""
    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    pad = jnp.zeros((hp, wp), jnp.bool_).at[:h, :w].set(mask)
    return jnp.any(pad.reshape(n_ty, TILE_H, n_tx, TILE_W),
                   axis=(1, 3)).reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("steps", "interpret", "roi"))
def _fill_gated_from_flags(image, depth, base, flags, steps, interpret,
                           roi=None):
    """Gated flagging fill of the tiles in ``flags``, merged over ``base``
    (the phase-0 output). Flagged tiles re-march EVERY in-ROI hole they
    contain from the original planes — phase-0-resolved pixels refill to
    bit-identical values (provably-global winners don't move under a
    longer march), unresolved ones get their phase-1 values."""
    flags_flat = flags.reshape(-1)
    order = jnp.argsort(jnp.logical_not(flags_flat)).astype(jnp.int32)
    count = jnp.sum(flags_flat.astype(jnp.int32))
    return _gated_flagging_run(image, depth, base, order, count, steps,
                               interpret, roi)


def _gated_flagging_run(image, depth, base, order, count, steps, interpret,
                        roi):
    """Run the gated flagging kernel over the first ``count`` tiles of
    ``order``; scatter outputs over ``base``. Returns (filled,
    unresolved per-tile flags (n_ty, n_tx))."""
    h, w, c = image.shape
    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    n_ty = hp // TILE_H
    n_tx = wp // TILE_W
    t = n_ty * n_tx
    planes, wh, ww = _build_planes(image, depth, steps, hp, wp, n_ty, n_tx)
    ox_np, oy_np = _offset_tables(steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 + c, wh, ww), jnp.float32),
            pltpu.VMEM((2 * (1 + c) * TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((c * TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, slot_flags = pl.pallas_call(
        _build_gated_flagging_kernel(steps, wh, ww, c, roi, n_tx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, c * TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((t, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(oy_np), jnp.asarray(ox_np), order, count.reshape(1),
      planes)

    # scatter filled tiles + flags over the base (inactive slots drop)
    tiles2 = jnp.transpose(out.reshape(t, c, TILE_H, TILE_W), (0, 2, 3, 1))
    pad1 = jnp.zeros((hp, wp, c), base.dtype).at[:h, :w].set(base)
    tiled1 = jnp.transpose(
        pad1.reshape(n_ty, TILE_H, n_tx, TILE_W, c),
        (0, 2, 1, 3, 4)).reshape(t, TILE_H, TILE_W, c)
    slot = jnp.arange(t, dtype=jnp.int32)
    scatter_ids = jnp.where(slot < count, order, t)
    merged = tiled1.at[scatter_ids].set(tiles2, mode="drop")
    flags = jnp.zeros((t,), jnp.int32).at[scatter_ids].set(
        slot_flags[:, 0, 0], mode="drop")
    return (_tiles_to_image(merged, n_ty, n_tx, c, h, w),
            flags.reshape(n_ty, n_tx) > 0)


def _build_planes(image, depth, steps, hp, wp, n_ty, n_tx):
    """Padded (2+c, rows, lanes) planes so the window DMA of any tile is a
    plain dynamic slice: 0 validity (-1 outside, 0 hole, 1 valid),
    1 depth, 2+ image channels."""
    h, w, c = image.shape
    wh, ww = _window_dims(steps)
    rows = (n_ty - 1) * TILE_H + wh
    lanes = (n_tx - 1) * TILE_W + ww
    valid = depth[..., 0] > 0.0
    vmap_ = jnp.full((hp, wp), -1.0, jnp.float32)
    vmap_ = vmap_.at[:h, :w].set(valid.astype(jnp.float32))
    planes = jnp.zeros((2 + c, rows, lanes), jnp.float32)
    planes = planes.at[0].set(-1.0)
    planes = planes.at[0, steps:steps + hp, steps:steps + wp].set(vmap_)
    planes = planes.at[1, steps:steps + h, steps:steps + w].set(
        depth[..., 0])
    planes = planes.at[2:, steps:steps + h, steps:steps + w].set(
        jnp.moveaxis(image, -1, 0))
    return planes, wh, ww


def _tiles_to_image(tiles, n_ty, n_tx, c, h, w):
    """(n_ty*n_tx, TILE_H, TILE_W, c) tile-major -> (h, w, c)."""
    img = tiles.reshape(n_ty, n_tx, TILE_H, TILE_W, c)
    img = jnp.transpose(img, (0, 2, 1, 3, 4))
    return img.reshape(n_ty * TILE_H, n_tx * TILE_W, c)[:h, :w]


@functools.partial(jax.jit,
                   static_argnames=("steps", "interpret", "roi"))
def _fill_single_fused(image, depth, steps, interpret, roi=None):
    """Phase-1 fused fill.

    Returns (filled (H, W, C), unresolved per-tile flags (n_ty, n_tx)).
    """
    h, w, c = image.shape
    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    n_ty = hp // TILE_H
    n_tx = wp // TILE_W
    planes, wh, ww = _build_planes(image, depth, steps, hp, wp, n_ty, n_tx)
    ox_np, oy_np = _offset_tables(steps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 + c, wh, ww), jnp.float32),
            pltpu.VMEM((2 * (1 + c) * TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((c * TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, flags = pl.pallas_call(
        _build_fused_kernel(steps, wh, ww, c, roi),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_ty, n_tx, c * TILE_H, TILE_W),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_ty, n_tx, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(oy_np), jnp.asarray(ox_np), planes)

    img = out.reshape(n_ty, n_tx, c, TILE_H, TILE_W)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(c, hp, wp)[:, :h, :w]
    img = jnp.moveaxis(img, 0, -1)
    return img, flags[:, :, 0, 0] > 0


@functools.partial(jax.jit,
                   static_argnames=("steps", "interpret", "roi"))
def _fill_phase2_gated(image, depth, filled1, flags, steps, interpret,
                       roi=None):
    """Re-march ONLY the flagged tiles at the full ``steps`` bound and
    scatter their refilled tiles over the phase-1 result."""
    h, w, c = image.shape
    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    n_ty = hp // TILE_H
    n_tx = wp // TILE_W
    t = n_ty * n_tx

    planes, wh, ww = _build_planes(image, depth, steps, hp, wp, n_ty, n_tx)
    ox_np, oy_np = _offset_tables(steps)

    flags_flat = flags.reshape(-1)
    # stable argsort puts flagged tiles first, in tile order
    order = jnp.argsort(jnp.logical_not(flags_flat)).astype(jnp.int32)
    count = jnp.sum(flags_flat.astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 + c, wh, ww), jnp.float32),
            pltpu.VMEM((2 * (1 + c) * TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((c * TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _build_gated_kernel(steps, wh, ww, c, roi, n_tx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, c * TILE_H, TILE_W),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(oy_np), jnp.asarray(ox_np), order,
      count.reshape(1), planes)

    # merge: inactive slots scatter out of bounds and are dropped
    tiles2 = jnp.transpose(out.reshape(t, c, TILE_H, TILE_W),
                           (0, 2, 3, 1))
    pad1 = jnp.zeros((hp, wp, c), filled1.dtype).at[:h, :w].set(filled1)
    tiled1 = jnp.transpose(
        pad1.reshape(n_ty, TILE_H, n_tx, TILE_W, c),
        (0, 2, 1, 3, 4)).reshape(t, TILE_H, TILE_W, c)
    slot = jnp.arange(t, dtype=jnp.int32)
    scatter_ids = jnp.where(slot < count, order, t)
    merged = tiled1.at[scatter_ids].set(tiles2, mode="drop")
    return _tiles_to_image(merged, n_ty, n_tx, c, h, w)


def fill_disocclusion_pallas(image: jax.Array, depth: jax.Array,
                             steps: int = 128,
                             phase1_steps: int = 0,
                             roi: Optional[Tuple[int, int, int, int]] = None,
                             interpret: bool | None = None,
                             phase0_steps: int = 0,
                             phase0_gate: float = 0.0) -> jax.Array:
    """Drop-in Pallas implementation of ops/discfill.py:fill_disocclusion.

    ``image``: (B, H, W, C); ``depth``: (B, H, W, 1); holes are depth <= 0.

    With ``phase1_steps > 0`` runs the two-phase adaptive fill: a fused
    short march (phase1_steps) that captures endpoint payloads in-kernel
    and *proves* per-pixel stability, plus an exact ``steps``-bound
    re-march of ONLY the unresolved tiles (scalar-prefetched tile list)
    scattered over the phase-1 result. Bit-identical to the one-phase fill
    for every input.

    With ``phase0_steps > 0`` additionally runs the vectorized-XLA
    radius-``phase0_steps`` thin-hole resolver first
    (ops/discfill.py::resolve_thin_holes — provably-global winners only),
    and the phase-1 march visits ONLY tiles with unresolved pixels. On
    scattered-thin-hole frames (noisy depth) this replaces the saturated
    per-tile march with ~32*phase0_steps shifted compares. Bit-identical
    by the resolver's soundness bound.

    ``phase0_gate`` (0 disables) makes phase 0 a runtime ``lax.cond`` on a
    cheap hole census: the resolver — whose full-image epilogue costs a
    flat ~20 ms at 1024² — runs only when the fraction of hole-bearing
    tiles exceeds the gate (the regime where it pays: a saturated march
    is linear in hole tiles, the resolver is flat), so realistic scenes
    (few hole tiles) keep the plain gated-march cost and noisy scenes get
    the resolver win, in one compiled program. Bit-identical either way.

    ``roi``: static (y0, y1, x0, x1) — pixels outside are treated as
    non-holes (left untouched); in-ROI results stay bit-identical to the
    full fill because march sources are unchanged.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def one(img_b, depth_b):
        if phase1_steps <= 0 or phase1_steps >= steps:
            return _fill_single_pallas(img_b, depth_b, steps, interpret,
                                       roi)
        if phase0_steps > 0:
            from kbe_tpu.ops.discfill import resolve_thin_holes

            h, w = img_b.shape[0], img_b.shape[1]
            n_ty = _ceil_to(h, TILE_H) // TILE_H
            n_tx = _ceil_to(w, TILE_W) // TILE_W

            hole = depth_b[..., 0] <= 0.0
            if roi is not None:
                y0, y1, x0, x1 = roi
                yy_r = lax.broadcasted_iota(jnp.int32, (h, w), 0)
                xx_r = lax.broadcasted_iota(jnp.int32, (h, w), 1)
                hole = hole & ((yy_r >= y0) & (yy_r < y1) & (xx_r >= x0)
                               & (xx_r < x1))

            if phase0_gate > 0.0:
                # hole census: fraction of ROI-intersecting tiles holding
                # a hole — the quantity the gated march's cost is linear
                # in (the resolver's epilogue is flat, so it only pays in
                # the saturated-march regime). The cond picks resolver vs
                # passthrough ONLY; the march kernels below are compiled
                # once and consume either result (a cond over two whole
                # fill programs doubled XLA compile and crashed the CPU
                # backend at full size).
                if roi is not None:
                    n_roi = (((min(y1, h) - 1) // TILE_H - y0 // TILE_H
                              + 1) * ((min(x1, w) - 1) // TILE_W
                                      - x0 // TILE_W + 1))
                else:
                    n_roi = n_ty * n_tx
                frac = (jnp.sum(_tile_flags(hole, h, w, n_ty, n_tx))
                        / float(max(n_roi, 1)))
                # passthrough: nothing resolved — every in-ROI hole goes
                # to the gated march, which re-marches flagged tiles from
                # the ORIGINAL planes (== the plain two-phase schedule)
                filled0, unresolved = lax.cond(
                    frac > phase0_gate,
                    lambda: resolve_thin_holes(img_b, depth_b,
                                               phase0_steps, roi),
                    lambda: (img_b, hole))
            else:
                filled0, unresolved = resolve_thin_holes(img_b, depth_b,
                                                         phase0_steps, roi)
            flags0 = _tile_flags(unresolved, h, w, n_ty, n_tx)

            def run_marches(_):
                filled1, flags1 = _fill_gated_from_flags(
                    img_b, depth_b, filled0, flags0, phase1_steps,
                    interpret, roi)
                return lax.cond(
                    jnp.any(flags1),
                    lambda: _fill_phase2_gated(img_b, depth_b, filled1,
                                               flags1, steps, interpret,
                                               roi),
                    lambda: filled1)

            return lax.cond(jnp.any(flags0), run_marches,
                            lambda _: filled0, operand=None)
        filled1, flags = _fill_single_gated(img_b, depth_b, phase1_steps,
                                            interpret, roi)
        return lax.cond(
            jnp.any(flags),
            lambda: _fill_phase2_gated(img_b, depth_b, filled1, flags,
                                       steps, interpret, roi),
            lambda: filled1)

    return jnp.stack([one(image[b], depth[b])
                      for b in range(image.shape[0])])
