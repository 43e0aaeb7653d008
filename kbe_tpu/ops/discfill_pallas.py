"""Pallas TPU disocclusion fill — VMEM-window ray marching.

Same semantics as ops/discfill.py (the executable spec of the reference's
``kernel_discfill_updateOutput``, utils/common.py:833-937), reformulated
so the march never re-touches HBM:

  * the validity map is processed in (8, 128) tiles; each tile DMAs one
    (8 + 2K, 128 + 2K) window into VMEM — every ray step of every pixel
    in the tile lands inside the window
  * the 32 rays (16 directions x both ways) march with a dynamic
    ``while_loop`` over k that exits as soon as every ray of every pixel
    has found its event (valid pixel or image border) — tiles without
    holes skip the march entirely, and real holes are usually a few
    pixels wide, so the loop runs ~10 steps instead of K
  * offsets come from the same c_round tables as the spec, scalar-
    prefetched to SMEM; the window reads are dynamic 2D VMEM slices
  * distance + first-strict-min direction selection and the from/to
    endpoint choice run in-kernel; the XLA epilogue only does the two
    depth gathers (background test) and the final channel gather, which
    are global irregular reads

Compile is seconds and runtime ~10x the XLA formulation's at 1024^2 (the
XLA version re-slices the full map 32 times per step: ~16 GB of HBM
traffic at K=128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kbe_tpu.ops.discfill import _offset_tables

TILE_H = 16
TILE_W = 256
_KCHUNK = 4  # ray steps folded into one while-loop iteration


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


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


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def _fill_single_pallas(image, depth, steps, interpret):
    h, w, c = image.shape
    valid = depth[..., 0] > 0.0

    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    n_ty = hp // TILE_H
    n_tx = wp // TILE_W
    # window sized for the aligned (16, 256) reads: dynamic aligned bases
    # reach down-rounded 2*steps plus the superset extent
    wh = 2 * steps + 2 * TILE_H
    ww = _ceil_to(2 * steps, TILE_W) + 2 * TILE_W

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


def _build_fused_kernel(steps, wh, ww, c, height, width):
    """March + endpoint-payload capture + selection + fill, all in-kernel.

    Eliminates the XLA epilogue's three per-pixel gathers (~9.5 ms at
    1024^2) by capturing depth and image channels at each ray's event step
    (the event offset is uniform across the tile, so the capture is the
    same aligned-window read + roll as the validity probe). Also emits a
    per-tile "unresolved" flag used by the two-phase wrapper.
    """
    npl = 1 + c  # captured planes per ray: depth + image channels

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
        zero_i = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        def window_at(p, off_y, off_x, ybase, xbase):
            v = win[p, pl.ds(ybase, 2 * TILE_H), pl.ds(xbase, 2 * TILE_W)]
            v = pltpu.roll(v, -(off_y - ybase), axis=0)[:TILE_H]
            return pltpu.roll(v, -(off_x - xbase), axis=1)[:, :TILE_W]

        def march(r, slot):
            """First event of ray r; captures endpoint depth+image into
            cap_scr slot. Returns (ev_oy, ev_ox, ev_valid, found_any)."""

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
        for ch in range(c):
            fill_ch = jnp.where(use_to, bimg_to[ch], bimg_from[ch])
            cimg = win[2 + ch, steps:steps + TILE_H, steps:steps + TILE_W]
            out_scr[pl.ds(ch * TILE_H, TILE_H), :] = jnp.where(
                do_fill, fill_ch, cimg)

        # a resolved hole either has a provably-final winner (its pair
        # distance can't be beaten by any ray that has not evented within
        # `steps`, whose eventual pair distance is > steps - 1) or has no
        # ray left to event at all
        stable = (do_fill & (best_dist <= jnp.float32(steps - 1))) \
            | (all_evented > 0)
        unresolved = (hole > 0) & ~stable
        flag_scr[:, :] = jnp.full((8, 128), jnp.max(
            unresolved.astype(jnp.int32)), jnp.int32)

        cp2 = pltpu.make_async_copy(out_scr, out_ref.at[ty, tx], out_sem)
        cp2.start()
        cp3 = pltpu.make_async_copy(flag_scr, flag_ref.at[ty, tx], flag_sem)
        cp3.start()
        cp2.wait()
        cp3.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def _fill_single_fused(image, depth, steps, interpret):
    """Phase-1 fused fill. Returns (filled (H, W, C), unresolved_any)."""
    h, w, c = image.shape
    valid = depth[..., 0] > 0.0

    hp = _ceil_to(h, TILE_H)
    wp = _ceil_to(w, TILE_W)
    n_ty = hp // TILE_H
    n_tx = wp // TILE_W
    wh = 2 * steps + 2 * TILE_H
    ww = _ceil_to(2 * steps, TILE_W) + 2 * TILE_W

    rows = (n_ty - 1) * TILE_H + wh
    lanes = (n_tx - 1) * TILE_W + ww
    # plane 0: validity (-1 outside, 0 hole, 1 valid); 1: depth; 2+: image
    vmap_ = jnp.full((hp, wp), -1.0, jnp.float32)
    vmap_ = vmap_.at[:h, :w].set(valid.astype(jnp.float32))
    planes = jnp.zeros((2 + c, rows, lanes), jnp.float32)
    planes = planes.at[0].set(-1.0)
    planes = planes.at[0, steps:steps + hp, steps:steps + wp].set(vmap_)
    planes = planes.at[1, steps:steps + h, steps:steps + w].set(
        depth[..., 0])
    planes = planes.at[2:, steps:steps + h, steps:steps + w].set(
        jnp.moveaxis(image, -1, 0))

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
        _build_fused_kernel(steps, wh, ww, c, h, w),
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
    return img, jnp.max(flags[:, :, 0, 0]) > 0


def fill_disocclusion_pallas(image: jax.Array, depth: jax.Array,
                             steps: int = 128,
                             phase1_steps: int = 0,
                             interpret: bool | None = None) -> jax.Array:
    """Drop-in Pallas implementation of ops/discfill.py:fill_disocclusion.

    ``image``: (B, H, W, C); ``depth``: (B, H, W, 1); holes are depth <= 0.

    With ``phase1_steps > 0`` runs the two-phase adaptive fill: a fused
    short march (phase1_steps) that captures endpoint payloads in-kernel,
    plus an exact ``steps``-bound re-run under a ``lax.cond`` for frames
    containing holes too wide for phase 1 to settle. Bit-identical to the
    one-phase fill for every input; ~10x cheaper on typical frames whose
    holes are a few pixels wide.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def one(img_b, depth_b):
        if phase1_steps <= 0 or phase1_steps >= steps:
            return _fill_single_pallas(img_b, depth_b, steps, interpret)
        filled1, unresolved = _fill_single_fused(img_b, depth_b,
                                                 phase1_steps, interpret)
        return lax.cond(
            unresolved,
            lambda: _fill_single_pallas(img_b, depth_b, steps, interpret),
            lambda: filled1)

    return jnp.stack([one(image[b], depth[b])
                      for b in range(image.shape[0])])
