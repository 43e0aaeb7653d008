"""Banded static-residual Pallas splat renderer (4th generation).

Same semantics as the reference CUDA point renderer (utils/common.py:
``kernel_pointrender_updateZee`` :434-521, ``updateDegrid`` :524-582,
``updateOutput`` :585-686), golden-tested against ops/splat.py. Successor
to ops/legacy/splat_delta.py, designed from its measured cost profile: the delta
kernel spends most of its time in *per-delta dynamic-offset placements*
(scalar loop overhead + two dynamic rolls + a VMEM read-modify-write per
(delta_y, delta_x) pair, times channels), so chunks whose points spread
over many integer displacements pay hundreds of cycles per displacement.

Key changes vs delta:

  * (32, 256) tiles — a (8, 128) source chunk typically overlaps 1-2
    tiles instead of ~5, halving the number of (tile, chunk) visits.
  * per-chunk displacement REBASING in the XLA prepass: records carry
    residuals rdy/rdx = floor-displacement minus the chunk's valid-masked
    minimum, so in-kernel residuals start at 0.
  * the x-residual dimension is handled by a STATIC 16-wide window of
    lane shifts (no scalar loop, no dynamic rolls): for one y-value the
    whole band accumulates with 16 statically-unrolled masked shifts into
    an (8, 256) register band, then ONE dynamic placement merges the band
    into the tile buffer. Chunks with x-spread > 16 iterate
    ceil(spread/16) windows — cost grows linearly with actual spread,
    never with the rectangle area, and there is no separate "incoherent"
    code path.
  * records are NOT gathered into CSR order (the delta/routed gather
    materializes capacity * 40 KB ~ 600 MB of HBM traffic per frame);
    the kernel DMAs each chunk's record block directly from the original
    (NC, R, 128) array via a scalar-prefetched chunk-id list.
  * no per-point in-image tests: a band lands exactly at its points'
    target cells, so out-of-image writes only ever hit buffer cells that
    the post-pass-A mask disqualifies (z-buffer) or the core crop drops
    (accumulate) — matching the reference's per-point bounds checks.

Shared with delta/routed: offset-removed z-keys behind an optimization
barrier, spec-rounded degrid averaging, the aligned read-modify-write
placement trick, CSR routing via one sort.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kbe_tpu.ops.geometry import project_points, splat_error
from kbe_tpu.ops.splat_routed import _BIG, _DISQ, _INF, _build_csr, \
    _ceil_to, _chunk_boxes

CHUNK_H = 8
CHUNK_W = 128
# Tile/band geometry, overridable from the environment for hardware
# sweeps (read once at import; constants are baked into the kernels at
# trace time). Defaults are the measured-best v5e configuration.
TILE_H = int(os.environ.get("KBE_TILE_H", "64"))
TILE_W = int(os.environ.get("KBE_TILE_W", "512"))
_HALO_LO = 3
_HALO_HI = 4
BAND_W = int(os.environ.get("KBE_BAND_W", "8"))
# static x-residual window width: lower means fewer static combos per
# window-row but more windows for wide-spread chunks; typical chunks
# (x-spread <= 6) still need a single window at 8
PAD_Y = CHUNK_H        # buffer spill margins for dynamic placement
PAD_X = 2 * CHUNK_W
_RSENT = 20000         # invalid-point residual sentinel
_CLMARK = 10000        # depth-cluster-1 rdy label offset (see
                       # _depth_clusters; kernels subtract want*_CLMARK)

_RGH = TILE_H + _HALO_LO + _HALO_HI
_RGW = TILE_W + _HALO_LO + _HALO_HI
_BH = _ceil_to(_RGH + PAD_Y + CHUNK_H, CHUNK_H)
_BW = _ceil_to(_RGW + PAD_X + 2 * CHUNK_W, 2 * CHUNK_W)

# Wide-payload variant: pads sized so the tile core starts at sublane 16
# and lane 512 — the per-(tile, group) core DMA out is then aligned to
# Mosaic's (8, 128) VMEM tiling.
PAD_YW = 2 * CHUNK_H - _HALO_LO                        # 13
PAD_XW = 4 * CHUNK_W - _HALO_LO                        # 509
_BHW = _ceil_to(_RGH + PAD_YW + CHUNK_H, CHUNK_H)
_BWW = _ceil_to(_RGW + PAD_XW + 2 * CHUNK_W, 2 * CHUNK_W)
_GRP = 8               # payload planes accumulated per group pass


def _shift_band(x, s, fill):
    """Place (8, 128) source-lane values into a (8, 256) band at static
    lane offset s (band lane = source lane + s)."""
    if s == 0:
        return jnp.concatenate(
            [x, jnp.full((CHUNK_H, CHUNK_W), fill, jnp.float32)], axis=1)
    return jnp.concatenate(
        [jnp.full((CHUNK_H, s), fill, jnp.float32), x,
         jnp.full((CHUNK_H, CHUNK_W - s), fill, jnp.float32)], axis=1)


def _degrid_zee(zee, inimg, bh, bw):
    """Spec-rounded degrid averaging over a raw z buffer (2D array math,
    reference utils/common.py:524-582 semantics; out-of-image cells
    disqualified then zeroed)."""
    zee = jnp.where(inimg, zee, _DISQ)

    def shift2(a, dy_, dx_):
        out = a
        if dy_ > 0:
            out = jnp.concatenate(
                [out[dy_:], jnp.full((dy_, bw), _DISQ, jnp.float32)], 0)
        elif dy_ < 0:
            out = jnp.concatenate(
                [jnp.full((-dy_, bw), _DISQ, jnp.float32), out[:dy_]], 0)
        if dx_ > 0:
            out = jnp.concatenate(
                [out[:, dx_:], jnp.full((bh, dx_), _DISQ, jnp.float32)], 1)
        elif dx_ < 0:
            out = jnp.concatenate(
                [jnp.full((bh, -dx_), _DISQ, jnp.float32), out[:, :dx_]],
                1)
        return out

    total = jnp.zeros((bh, bw), jnp.float32)
    count = jnp.zeros((bh, bw), jnp.float32)
    for dx_, dy_ in ((1, 0), (0, 1), (1, 1), (1, -1)):
        one = shift2(zee, dy_, dx_)
        two = shift2(zee, -dy_, -dx_)
        good = (zee >= one + 1.0) & (zee >= two + 1.0)
        total = total + jnp.where(good, (one + _BIG) + (two + _BIG), 0.0)
        count = count + jnp.where(good, 2.0, 0.0)
    avg = total / jnp.maximum(count, 1.0) - _BIG
    zee_d = jnp.where(count > 0.0, jnp.minimum(zee, avg), zee)
    return jnp.where(inimg, zee_d, 0.0)


def _pack_records_banded(rdy, rdx, fx, fy, key, pay):
    """Planes (G, Hp, Wp) + payload (G, Hp, Wp, D) -> (NC, R, 128) records.

    Row layout per chunk: rdy(8), rdx(8), fx(8), fy(8), key(8), pay ch*(8).
    """
    g, hp, wp = rdy.shape
    d = pay.shape[-1]
    planes = [rdy, rdx, fx, fy, key] + [pay[..., i] for i in range(d)]
    stacked = jnp.stack(planes, axis=0)
    p = stacked.shape[0]
    stacked = stacked.reshape(p, g, hp // CHUNK_H, CHUNK_H, wp // CHUNK_W,
                              CHUNK_W)
    rec = jnp.transpose(stacked, (1, 2, 4, 0, 3, 5))
    nc = g * (hp // CHUNK_H) * (wp // CHUNK_W)
    return rec.reshape(nc, p * CHUNK_H, CHUNK_W)


def _chunk_minmax(x, ok, red, fill):
    """Valid-masked per-chunk reduction. (G, Hp, Wp) -> (NC,)."""
    g, hp, wp = x.shape
    x = jnp.where(ok, x, fill)
    x = x.reshape(g, hp // CHUNK_H, CHUNK_H, wp // CHUNK_W, CHUNK_W)
    return red(x, axis=(2, 4)).reshape(-1)


def _depth_clusters(pz, pv):
    """Static per-chunk 2-cluster split at the largest 1/z gap.

    (G, Hp, Wp) z/valid planes -> (G, Hp, Wp) 0/1 labels. Displacement
    tracks 1/z (u = x*f/z + ...), so the largest disparity gap separates
    the two surfaces of a chunk straddling a depth edge — whose UNION
    displacement window is mostly empty work at every pose (and
    overflows the budget on hard edges). Splitting routes each chunk as
    two tight per-cluster windows; uniform-depth chunks produce an empty
    cluster 1 (strict > threshold at the max) and route as one entry.
    """
    g, hp, wp = pz.shape
    inv = 1.0 / (pz + 1e-7)
    nc_y, nc_x = hp // CHUNK_H, wp // CHUNK_W
    cv = inv.reshape(g, nc_y, CHUNK_H, nc_x, CHUNK_W)
    mk = (pv > 0.0).reshape(g, nc_y, CHUNK_H, nc_x, CHUNK_W)
    cv = jnp.transpose(cv, (0, 1, 3, 2, 4)).reshape(-1, CHUNK_H * CHUNK_W)
    mk = jnp.transpose(mk, (0, 1, 3, 2, 4)).reshape(-1, CHUNK_H * CHUNK_W)
    # invalid points inherit the chunk's valid min so they never form
    # the largest gap (their label is irrelevant — they are masked out)
    lo = jnp.min(jnp.where(mk, cv, jnp.inf), axis=1, keepdims=True)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    vals = jnp.where(mk, cv, lo)
    s = jnp.sort(vals, axis=1)
    gaps = s[:, 1:] - s[:, :-1]
    i = jnp.argmax(gaps, axis=1)
    take = lambda a: jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]
    thresh = 0.5 * (take(s[:, :-1]) + take(s[:, 1:]))
    cl = (vals > thresh[:, None]).astype(jnp.float32)
    cl = cl.reshape(g, nc_y, nc_x, CHUNK_H, CHUNK_W)
    cl = jnp.transpose(cl, (0, 1, 3, 2, 4)).reshape(g, hp, wp)
    return cl


def _build_banded_kernel(d, height, width, per_grid, wc):
    """Fused zee + degrid + accumulate with banded static-x placement."""
    bh, bw = _BH, _BW
    rgh, rgw = _RGH, _RGW

    def kernel(off_ref, ids_ref, meta1_ref, meta2_ref, rec_hbm, out_ref,
               rec_vmem, zee_buf, acc_buf, copy_sem, out_sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        t = ty * pl.num_programs(1) + tx
        start = off_ref[t]
        cnt = off_ref[t + 1] - start
        toy = ty * TILE_H - _HALO_LO
        tox = tx * TILE_W - _HALO_LO

        def get_dma(slot, j):
            # routing entries are (chunk, depth-cluster) pairs: e=cid*2+cl
            return pltpu.make_async_copy(
                rec_hbm.at[ids_ref[start + j] // 2], rec_vmem.at[slot],
                copy_sem.at[slot])

        def stream(body):
            @pl.when(cnt > 0)
            def _():
                get_dma(0, 0).start()

            def loop(j, carry):
                slot = j % 2

                @pl.when(j + 1 < cnt)
                def _():
                    get_dma((j + 1) % 2, j + 1).start()

                get_dma(slot, j).wait()
                body(slot, j)
                return carry

            lax.fori_loop(0, cnt, loop, 0)

        def chunk_meta(j):
            e = ids_ref[start + j]
            cid = e // 2
            want = e - 2 * cid
            m1 = meta1_ref[start + j]
            m2 = meta2_ref[start + j]
            base_dy = m1 >> 16
            base_dx = ((m1 & 0xffff) ^ 0x8000) - 0x8000
            y_cnt = (m2 >> 8) & 0xff
            xw_cnt = m2 & 0xff
            return cid, want, base_dy, base_dx, y_cnt, xw_cnt

        def chunk_fields(slot, want):
            """Cluster-1 rdy rows carry the +_CLMARK label offset (see
            render_grids_banded); subtracting want*_CLMARK restores this
            entry's own cluster and pushes the sibling's points (and the
            _RSENT invalids) out of any window match range."""
            rec = rec_vmem
            rdyi = (rec[slot, 0:CHUNK_H, :].astype(jnp.int32)
                    - want * _CLMARK)
            rdxi = rec[slot, CHUNK_H:2 * CHUNK_H, :].astype(jnp.int32)
            fx = rec[slot, 2 * CHUNK_H:3 * CHUNK_H, :]
            fy = rec[slot, 3 * CHUNK_H:4 * CHUNK_H, :]
            kk = rec[slot, 4 * CHUNK_H:5 * CHUNK_H, :]
            return rdyi, rdxi, fx, fy, kk

        shift_into_band = _shift_band

        def place(buf, row_off, by, bx, block, merge, fill):
            """Merge a (8, 256) block into buf at buffer position
            (row_off + by, bx) via an aligned (16, 512) RMW."""
            ybase = (by // CHUNK_H) * CHUNK_H
            xbase = (bx // (2 * CHUNK_W)) * (2 * CHUNK_W)
            oy = by - ybase
            ox = bx - xbase
            blk = jnp.pad(block, ((0, CHUNK_H), (0, 2 * CHUNK_W)),
                          constant_values=fill)
            blk = pltpu.roll(blk, oy, axis=0)
            blk = pltpu.roll(blk, ox, axis=1)
            cur = buf[pl.ds(row_off + ybase, 2 * CHUNK_H),
                      pl.ds(xbase, 4 * CHUNK_W)]
            buf[pl.ds(row_off + ybase, 2 * CHUNK_H),
                pl.ds(xbase, 4 * CHUNK_W)] = merge(cur, blk)

        def window_loop(j, body):
            """Run body(dly, xw_px, rdx_shift) over the entry's clamped
            (y-value, x-window) iteration space."""
            cid, _, base_dy, base_dx, y_cnt, xw_cnt = chunk_meta(j)
            py_base = (cid % per_grid) // wc * CHUNK_H + base_dy - toy
            px_base = (cid % wc) * CHUNK_W + base_dx - tox
            dly_lo = jnp.maximum(0, -CHUNK_H + 1 - py_base)
            dly_hi = jnp.minimum(y_cnt - 1, rgh - 1 - py_base)
            # band cols [px, px + 256) overlap the region iff
            # -256 < px < rgw
            xw_lo = jnp.maximum(0, (-2 * CHUNK_W - px_base) // BAND_W + 1)
            xw_hi = jnp.minimum(xw_cnt - 1, (rgw - 1 - px_base) // BAND_W)

            def xw_body(xw, _):
                px = px_base + xw * BAND_W

                def y_body(dly, __):
                    body(dly, py_base + dly, px, xw * BAND_W)
                    return 0

                lax.fori_loop(dly_lo, dly_hi + 1, y_body, 0)
                return 0

            lax.fori_loop(xw_lo, xw_hi + 1, xw_body, 0)

        # ---- pass A: raw zee via banded nearest-corner min-merges ----
        def zee_chunk(slot, j):
            want = chunk_meta(j)[1]
            rdyi, rdxi, fx, fy, kk = chunk_fields(slot, want)
            rdyn = rdyi + (fy > 0.5)
            rdxn = rdxi + (fx > 0.5)

            def body(dly, py, px, xs):
                rdl = rdxn - xs
                my = rdyn == dly
                band = jnp.full((CHUNK_H, 2 * CHUNK_W), _BIG, jnp.float32)
                for s in range(BAND_W):
                    vals = jnp.where(my & (rdl == s), kk, _BIG)
                    band = jnp.minimum(band, shift_into_band(vals, s, _BIG))
                place(zee_buf, 0, py + PAD_Y, px + PAD_X, band,
                      jnp.minimum, _BIG)

            window_loop(j, body)

        zee_buf[:, :] = jnp.zeros((bh, bw), jnp.float32)  # hole == spec 1e6
        stream(zee_chunk)

        # ---- degrid on the 2D buffer (spec-rounded averaging) ----
        zee = zee_buf[:, :]
        by_iota = lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        bx_iota = lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        gy_img = by_iota - PAD_Y + toy
        gx_img = bx_iota - PAD_X + tox
        inimg = ((gy_img >= 0) & (gy_img < height) & (gx_img >= 0)
                 & (gx_img < width))
        zee_buf[:, :] = _degrid_zee(zee, inimg, bh, bw)

        # ---- pass B: banded bilinear accumulation with in-band z-test ----
        acc_buf[:, :] = jnp.zeros((d * bh, bw), jnp.float32)

        def acc_chunk(slot, j):
            want = chunk_meta(j)[1]
            rdyi, rdxi, fx, fy, kk = chunk_fields(slot, want)

            def body(dly, py, px, xs):
                rdl = rdxi - xs
                wy = ((rdyi == dly).astype(jnp.float32) * (1.0 - fy)
                      + (rdyi == dly - 1).astype(jnp.float32) * fy)

                # z at target cells, read back into band layout
                by = py + PAD_Y
                bx = px + PAD_X
                ybase = (by // CHUNK_H) * CHUNK_H
                xbase = (bx // (2 * CHUNK_W)) * (2 * CHUNK_W)
                oy = by - ybase
                ox = bx - xbase
                zwin = zee_buf[pl.ds(ybase, 2 * CHUNK_H),
                               pl.ds(xbase, 4 * CHUNK_W)]
                zwin = pltpu.roll(zwin, -oy, axis=0)
                zband = pltpu.roll(zwin, -ox,
                                   axis=1)[:CHUNK_H, :2 * CHUNK_W]

                bands = [jnp.zeros((CHUNK_H, 2 * CHUNK_W), jnp.float32)
                         for _ in range(d)]
                for s in range(BAND_W):
                    wx = ((rdl == s).astype(jnp.float32) * (1.0 - fx)
                          + (rdl == s - 1).astype(jnp.float32) * fx)
                    # z-test against the target cell of this x-offset
                    zs = zband[:, s:s + CHUNK_W]
                    vis = kk <= zs + 1.0
                    w = jnp.where(vis, wy * wx, 0.0)
                    for ch in range(d - 1):
                        pay = rec_vmem[slot,
                                       (5 + ch) * CHUNK_H:(6 + ch)
                                       * CHUNK_H, :]
                        bands[ch] = bands[ch] + shift_into_band(
                            w * pay, s, 0.0)
                    # ones channel: invalid points already carry zero
                    # weight (their sentinel residual fails the wy mask),
                    # so the weight itself is the contribution
                    bands[d - 1] = bands[d - 1] + shift_into_band(w, s,
                                                                 0.0)
                for ch in range(d):
                    place(acc_buf, ch * bh, by, bx, bands[ch],
                          lambda c, b: c + b, 0.0)

            window_loop(j, body)

        stream(acc_chunk)

        cp = pltpu.make_async_copy(acc_buf, out_ref.at[t], out_sem)
        cp.start()
        cp.wait()

    return kernel


def _build_banded_wide_kernel(n_g, height, width, per_grid, wc):
    """Banded splat for wide payloads (grid dim 2 = payload group).

    Grid (n_ty, n_tx, n_g), groups innermost: the z-buffer pass + degrid
    run once per tile at g == 0 and persist in the zee scratch for the
    remaining group passes (sequential TPU grid execution). Each group
    pass streams only its ``_GRP`` payload planes' record rows (second
    DMA alongside the 5 geometry planes) and accumulates them, then DMAs
    the lane-aligned tile core out — so HBM output traffic is
    O(C * H * W), not O(C * buffer area).
    """
    bh, bw = _BHW, _BWW
    rgh, rgw = _RGH, _RGW
    geom_rows = 5 * CHUNK_H
    grp_rows = _GRP * CHUNK_H
    y0c = PAD_YW + _HALO_LO          # == 16, sublane-aligned
    x0c = PAD_XW + _HALO_LO          # == 512, lane-aligned
    assert y0c % (2 * CHUNK_H) == 0 and x0c % (2 * CHUNK_W) == 0

    def kernel(off_ref, ids_ref, meta1_ref, meta2_ref, rec_hbm, out_ref,
               rec_vmem, zee_buf, acc_buf, copy_sem, out_sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        g = pl.program_id(2)
        t = ty * pl.num_programs(1) + tx
        start = off_ref[t]
        cnt = off_ref[t + 1] - start
        toy = ty * TILE_H - _HALO_LO
        tox = tx * TILE_W - _HALO_LO

        def geom_dma(slot, j):
            # routing entries are (chunk, depth-cluster) pairs: e=cid*2+cl
            return pltpu.make_async_copy(
                rec_hbm.at[ids_ref[start + j] // 2, pl.ds(0, geom_rows)],
                rec_vmem.at[slot, pl.ds(0, geom_rows)],
                copy_sem.at[slot, 0])

        def grp_dma(slot, j):
            return pltpu.make_async_copy(
                rec_hbm.at[ids_ref[start + j] // 2,
                           pl.ds(geom_rows + g * grp_rows, grp_rows)],
                rec_vmem.at[slot, pl.ds(geom_rows, grp_rows)],
                copy_sem.at[slot, 1])

        def stream(body, with_payload):
            def start_dmas(slot, j):
                geom_dma(slot, j).start()
                if with_payload:
                    grp_dma(slot, j).start()

            def wait_dmas(slot, j):
                geom_dma(slot, j).wait()
                if with_payload:
                    grp_dma(slot, j).wait()

            @pl.when(cnt > 0)
            def _():
                start_dmas(0, 0)

            def loop(j, carry):
                slot = j % 2

                @pl.when(j + 1 < cnt)
                def _():
                    start_dmas((j + 1) % 2, j + 1)

                wait_dmas(slot, j)
                body(slot, j)
                return carry

            lax.fori_loop(0, cnt, loop, 0)

        def chunk_meta(j):
            e = ids_ref[start + j]
            cid = e // 2
            want = e - 2 * cid
            m1 = meta1_ref[start + j]
            m2 = meta2_ref[start + j]
            base_dy = m1 >> 16
            base_dx = ((m1 & 0xffff) ^ 0x8000) - 0x8000
            y_cnt = (m2 >> 8) & 0xff
            xw_cnt = m2 & 0xff
            return cid, want, base_dy, base_dx, y_cnt, xw_cnt

        def chunk_fields(slot, want):
            # cluster-1 rdy carries +_CLMARK (see render_grids_banded)
            rec = rec_vmem
            rdyi = (rec[slot, 0:CHUNK_H, :].astype(jnp.int32)
                    - want * _CLMARK)
            rdxi = rec[slot, CHUNK_H:2 * CHUNK_H, :].astype(jnp.int32)
            fx = rec[slot, 2 * CHUNK_H:3 * CHUNK_H, :]
            fy = rec[slot, 3 * CHUNK_H:4 * CHUNK_H, :]
            kk = rec[slot, 4 * CHUNK_H:5 * CHUNK_H, :]
            return rdyi, rdxi, fx, fy, kk

        def place2(buf, by, bx, block, merge, fill):
            ybase = (by // CHUNK_H) * CHUNK_H
            xbase = (bx // (2 * CHUNK_W)) * (2 * CHUNK_W)
            blk = jnp.pad(block, ((0, CHUNK_H), (0, 2 * CHUNK_W)),
                          constant_values=fill)
            blk = pltpu.roll(blk, by - ybase, axis=0)
            blk = pltpu.roll(blk, bx - xbase, axis=1)
            cur = buf[pl.ds(ybase, 2 * CHUNK_H), pl.ds(xbase, 4 * CHUNK_W)]
            buf[pl.ds(ybase, 2 * CHUNK_H),
                pl.ds(xbase, 4 * CHUNK_W)] = merge(cur, blk)

        def place3(ch, by, bx, block):
            ybase = (by // CHUNK_H) * CHUNK_H
            xbase = (bx // (2 * CHUNK_W)) * (2 * CHUNK_W)
            blk = jnp.pad(block, ((0, CHUNK_H), (0, 2 * CHUNK_W)),
                          constant_values=0.0)
            blk = pltpu.roll(blk, by - ybase, axis=0)
            blk = pltpu.roll(blk, bx - xbase, axis=1)
            cur = acc_buf[ch, pl.ds(ybase, 2 * CHUNK_H),
                          pl.ds(xbase, 4 * CHUNK_W)]
            acc_buf[ch, pl.ds(ybase, 2 * CHUNK_H),
                    pl.ds(xbase, 4 * CHUNK_W)] = cur + blk

        def window_loop(j, body):
            cid, _, base_dy, base_dx, y_cnt, xw_cnt = chunk_meta(j)
            py_base = (cid % per_grid) // wc * CHUNK_H + base_dy - toy
            px_base = (cid % wc) * CHUNK_W + base_dx - tox
            dly_lo = jnp.maximum(0, -CHUNK_H + 1 - py_base)
            dly_hi = jnp.minimum(y_cnt - 1, rgh - 1 - py_base)
            xw_lo = jnp.maximum(0, (-2 * CHUNK_W - px_base) // BAND_W + 1)
            xw_hi = jnp.minimum(xw_cnt - 1, (rgw - 1 - px_base) // BAND_W)

            def xw_body(xw, _):
                px = px_base + xw * BAND_W

                def y_body(dly, __):
                    body(dly, py_base + dly, px, xw * BAND_W)
                    return 0

                lax.fori_loop(dly_lo, dly_hi + 1, y_body, 0)
                return 0

            lax.fori_loop(xw_lo, xw_hi + 1, xw_body, 0)

        # ---- pass A + degrid: once per tile, persists across groups ----
        @pl.when(g == 0)
        def _():
            def zee_chunk(slot, j):
                rdyi, rdxi, fx, fy, kk = chunk_fields(slot,
                                                      chunk_meta(j)[1])
                rdyn = rdyi + (fy > 0.5)
                rdxn = rdxi + (fx > 0.5)

                def body(dly, py, px, xs):
                    rdl = rdxn - xs
                    my = rdyn == dly
                    band = jnp.full((CHUNK_H, 2 * CHUNK_W), _BIG,
                                    jnp.float32)
                    for s in range(BAND_W):
                        vals = jnp.where(my & (rdl == s), kk, _BIG)
                        band = jnp.minimum(band,
                                           _shift_band(vals, s, _BIG))
                    place2(zee_buf, py + PAD_YW, px + PAD_XW, band,
                           jnp.minimum, _BIG)

                window_loop(j, body)

            zee_buf[:, :] = jnp.zeros((bh, bw), jnp.float32)
            stream(zee_chunk, with_payload=False)

            zee = zee_buf[:, :]
            by_iota = lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
            bx_iota = lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
            gy_img = by_iota - PAD_YW + toy
            gx_img = bx_iota - PAD_XW + tox
            inimg = ((gy_img >= 0) & (gy_img < height) & (gx_img >= 0)
                     & (gx_img < width))
            zee_buf[:, :] = _degrid_zee(zee, inimg, bh, bw)

        # ---- pass B: this group's planes only ----
        acc_buf[:, :, :] = jnp.zeros((_GRP, bh, bw), jnp.float32)

        def acc_chunk(slot, j):
            rdyi, rdxi, fx, fy, kk = chunk_fields(slot, chunk_meta(j)[1])

            def body(dly, py, px, xs):
                rdl = rdxi - xs
                wy = ((rdyi == dly).astype(jnp.float32) * (1.0 - fy)
                      + (rdyi == dly - 1).astype(jnp.float32) * fy)

                by = py + PAD_YW
                bx = px + PAD_XW
                ybase = (by // CHUNK_H) * CHUNK_H
                xbase = (bx // (2 * CHUNK_W)) * (2 * CHUNK_W)
                zwin = zee_buf[pl.ds(ybase, 2 * CHUNK_H),
                               pl.ds(xbase, 4 * CHUNK_W)]
                zwin = pltpu.roll(zwin, -(by - ybase), axis=0)
                zband = pltpu.roll(zwin, -(bx - xbase),
                                   axis=1)[:CHUNK_H, :2 * CHUNK_W]

                bands = [jnp.zeros((CHUNK_H, 2 * CHUNK_W), jnp.float32)
                         for _ in range(_GRP)]
                for s in range(BAND_W):
                    wx = ((rdl == s).astype(jnp.float32) * (1.0 - fx)
                          + (rdl == s - 1).astype(jnp.float32) * fx)
                    zs = zband[:, s:s + CHUNK_W]
                    vis = kk <= zs + 1.0
                    w = jnp.where(vis, wy * wx, 0.0)
                    for p in range(_GRP):
                        pay = rec_vmem[slot,
                                       geom_rows + p * CHUNK_H:
                                       geom_rows + (p + 1) * CHUNK_H, :]
                        bands[p] = bands[p] + _shift_band(w * pay, s, 0.0)
                for p in range(_GRP):
                    place3(p, by, bx, bands[p])

            window_loop(j, body)

        stream(acc_chunk, with_payload=True)

        cp = pltpu.make_async_copy(
            acc_buf.at[:, pl.ds(y0c, TILE_H), pl.ds(x0c, TILE_W)],
            out_ref.at[t, g], out_sem)
        cp.start()
        cp.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("height", "width", "capacity_factor",
                              "work_limit", "interpret"))
def render_grids_banded(
    xyz: jax.Array,
    data: jax.Array,
    height: int,
    width: int,
    focal,
    baseline,
    valid: jax.Array | None = None,
    capacity_factor: int = 4,
    work_limit: int = 256,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Render grid-structured clouds by banded static-residual splatting.

    Same surface as splat_routed.render_grids_routed. Payloads with more
    than 8 channels take the wide kernel: the z-buffer is built once per
    tile and payload planes stream through in groups of 8 (an extra grid
    dimension), so cost grows linearly in C with no VMEM blow-up — this
    is what makes the 68-channel inpainting-bootstrap render
    (models/pointcloud_inpainting.py:201 in the reference) run on the
    fast path instead of the routed one-hot kernel.
    Returns (rendered (1, H, W, C), existing (1, H, W, 1), overflow).

    ``work_limit`` bounds the in-kernel iteration count per chunk visit
    (window-rows = y-values x x-windows). The kernel's cost scales with
    each chunk's *actual displacement spread*, so a pathologically
    incoherent cloud (e.g. depth from an untrained net) could otherwise
    take minutes per frame and trip the TPU watchdog. Chunks whose spread
    exceeds the limit are excluded from routing and raise the overflow
    flag — exact results via fallback='scatter', bounded graceful
    degradation (dropped splats become fill-able holes) with 'clip'.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g, h, w = xyz.shape[0], xyz.shape[1], xyz.shape[2]
    c = data.shape[-1]
    wide = c > 8   # > 8 payload channels: group-streamed wide kernel
    if valid is None:
        valid = jnp.ones((g, h, w), xyz.dtype)

    u, v, ok = project_points(xyz, height, width, focal)
    ok = ok & (valid > 0.0)
    key = lax.optimization_barrier(
        splat_error(xyz[..., 2], focal, baseline)) - _BIG

    hp = _ceil_to(h, CHUNK_H)
    wp = _ceil_to(w, CHUNK_W)
    padding = ((0, 0), (0, hp - h), (0, wp - w))

    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    dyf = y0 - yy
    dxf = x0 - xx
    fx = jnp.where(ok, u - x0, 0.0)
    fy = jnp.where(ok, v - y0, 0.0)
    keyp = jnp.where(ok, key, _BIG)

    okp = jnp.pad(ok, padding)
    pad_dy = jnp.pad(jnp.where(ok, dyf, 0.0), padding)
    pad_dx = jnp.pad(jnp.where(ok, dxf, 0.0), padding)

    # static depth-cluster labels: routing ENTRIES are (chunk, cluster)
    # pairs e = cid*2 + cl, so edge-straddling chunks iterate two tight
    # windows instead of one union window (see _depth_clusters)
    pad_z = jnp.pad(xyz[..., 2].astype(jnp.float32), padding)
    clp = _depth_clusters(pad_z, okp.astype(jnp.float32))

    # per-entry valid-masked floor-displacement bounds -> bases + ranges
    big = jnp.float32(3e38)

    def cluster_bounds(okc):
        return (_chunk_minmax(pad_dy, okc, jnp.min, big),
                _chunk_minmax(pad_dy, okc, jnp.max, -big),
                _chunk_minmax(pad_dx, okc, jnp.min, big),
                _chunk_minmax(pad_dx, okc, jnp.max, -big))

    b0 = cluster_bounds(okp & (clp == 0.0))
    b1 = cluster_bounds(okp & (clp == 1.0))
    dy_lo, dy_hi, dx_lo, dx_hi = [
        jnp.stack([a, b], axis=1).reshape(-1) for a, b in zip(b0, b1)]
    empty = dy_lo > 1e38
    base_dy = jnp.where(empty, 0.0, dy_lo).astype(jnp.int32)
    base_dx = jnp.where(empty, 0.0, dx_lo).astype(jnp.int32)
    spread_y = jnp.where(empty, -1.0, dy_hi - dy_lo).astype(jnp.int32)
    spread_x = jnp.where(empty, -1.0, dx_hi - dx_lo).astype(jnp.int32)
    # dly values 0..spread_y+1 (floor + top corner); x windows cover
    # residuals 0..spread_x+1
    y_cnt_full = jnp.maximum(spread_y + 2, 0)
    xw_cnt_full = jnp.where(empty, 0, (spread_x + 1) // BAND_W + 1)
    # per-entry work bound: window-rows the kernel would iterate. Entries
    # over the limit (or past the 8-bit meta packing) are excluded from
    # routing below and flagged as overflow — this also turns what used
    # to be a silent 255-clip truncation into a reported condition.
    overwork = ((y_cnt_full * xw_cnt_full > work_limit)
                | (y_cnt_full > 255) | (xw_cnt_full > 255))
    y_cnt = jnp.clip(y_cnt_full, 0, 255)
    xw_cnt = jnp.clip(xw_cnt_full, 0, 255)
    base_dy = jnp.clip(base_dy, -32767, 32767)
    base_dx = jnp.clip(base_dx, -32767, 32767)
    meta1 = (base_dy << 16) | (base_dx & 0xffff)
    meta2 = (y_cnt << 8) | xw_cnt

    # residual planes rebased against each point's OWN cluster base;
    # cluster-1 rdy carries +_CLMARK so an entry's kernel pass can mask
    # the sibling cluster out (sentinel for invalid points)
    nc_y = hp // CHUNK_H
    nc_x = wp // CHUNK_W

    def bcast2(per_entry):
        pe = per_entry.reshape(g, nc_y, nc_x, 2).astype(jnp.float32)
        exp = lambda a: jnp.repeat(jnp.repeat(a, CHUNK_H, axis=1),
                                   CHUNK_W, axis=2)
        return jnp.where(clp == 0.0, exp(pe[..., 0]), exp(pe[..., 1]))

    rdy = jnp.where(okp, pad_dy - bcast2(base_dy) + float(_CLMARK) * clp,
                    float(_RSENT))
    rdx = jnp.where(okp, pad_dx - bcast2(base_dx), float(_RSENT))
    pad_fx = jnp.pad(fx, padding)
    pad_fy = jnp.pad(fy, padding)
    pad_k = jnp.pad(keyp, padding, constant_values=_BIG)
    ones = ok.astype(jnp.float32)[..., None]
    pay = jnp.concatenate([data.astype(jnp.float32) * ones, ones], axis=-1)

    d = c + 1
    n_g = -(-d // _GRP)
    if wide and n_g * _GRP > d:
        # zero-pad payload planes to a whole number of groups
        pay = jnp.concatenate(
            [pay, jnp.zeros(pay.shape[:-1] + (n_g * _GRP - d,),
                            jnp.float32)], axis=-1)
    pad_p = jnp.pad(pay, padding + ((0, 0),))

    records = _pack_records_banded(rdy, rdx, pad_fx, pad_fy, pad_k, pad_p)
    nc = records.shape[0]
    rec_rows = records.shape[1]

    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    t = n_ty * n_tx
    capacity = int(capacity_factor) * nc

    pad_u = jnp.pad(jnp.where(ok, u, -1e9).astype(jnp.float32), padding,
                    constant_values=-1e9)
    pad_v = jnp.pad(jnp.where(ok, v, -1e9).astype(jnp.float32), padding,
                    constant_values=-1e9)
    bx0 = _chunk_boxes(pad_u, pad_v, okp & (clp == 0.0))
    bx1 = _chunk_boxes(pad_u, pad_v, okp & (clp == 1.0))
    minu, maxu, minv, maxv = [
        jnp.stack([a, b], axis=1).reshape(-1) for a, b in zip(bx0, bx1)]
    # over-limit entries hit no tile (empty bbox) — kernel never sees them
    minu = jnp.where(overwork, _INF, minu)
    maxu = jnp.where(overwork, -_INF, maxu)
    chunk_ids, offsets, csr_overflow, _dropped = _build_csr(
        minu, maxu, minv, maxv, n_ty, n_tx, capacity, TILE_H, TILE_W)
    overflow = csr_overflow | jnp.any(overwork)

    if wide:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_ty, n_tx, n_g),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, (5 + _GRP) * CHUNK_H, CHUNK_W),
                           jnp.float32),
                pltpu.VMEM((_BHW, _BWW), jnp.float32),
                pltpu.VMEM((_GRP, _BHW, _BWW), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        cores = pl.pallas_call(
            _build_banded_wide_kernel(n_g, height, width, nc_y * nc_x,
                                      nc_x),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, n_g, _GRP, TILE_H, TILE_W),
                                           jnp.float32),
            interpret=interpret,
        )(offsets, chunk_ids, jnp.take(meta1, chunk_ids),
          jnp.take(meta2, chunk_ids), records)
        img = cores.reshape(n_ty, n_tx, n_g * _GRP, TILE_H, TILE_W)
        img = jnp.transpose(img, (0, 3, 1, 4, 2)).reshape(
            n_ty * TILE_H, n_tx * TILE_W, n_g * _GRP)[:height, :width, :d]
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_ty, n_tx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, rec_rows, CHUNK_W), jnp.float32),
                pltpu.VMEM((_BH, _BW), jnp.float32),
                pltpu.VMEM((d * _BH, _BW), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        acc_flat = pl.pallas_call(
            _build_banded_kernel(d, height, width, nc_y * nc_x, nc_x),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, d * _BH, _BW), jnp.float32),
            interpret=interpret,
        )(offsets, chunk_ids, jnp.take(meta1, chunk_ids),
          jnp.take(meta2, chunk_ids), records)

        # ---- epilogue: crop each tile's core, normalize ----
        acc = acc_flat.reshape(n_ty, n_tx, d, _BH, _BW)
        y0c = PAD_Y + _HALO_LO
        x0c = PAD_X + _HALO_LO
        core = acc[:, :, :, y0c:y0c + TILE_H, x0c:x0c + TILE_W]
        img = jnp.transpose(core, (0, 3, 1, 4, 2)).reshape(
            n_ty * TILE_H, n_tx * TILE_W, d)[:height, :width]

    rendered = img[..., :c] / (img[..., c:] + 1e-7)
    existing = img[..., c]
    return rendered[None], existing[None, ..., None], overflow


def render_grids_fast_banded(xyz, data, height, width, focal, baseline,
                             valid=None, capacity_factor: int = 4,
                             work_limit: int = 256,
                             interpret=None, fallback: str = "clip"):
    """Banded renderer with the overflow-fallback surface of
    splat_routed.render_grids_fast."""
    from kbe_tpu.ops.splat import render_pointcloud

    g = xyz.shape[0]
    if valid is None:
        valid = jnp.ones(xyz.shape[:3], xyz.dtype)
    rendered, existing, overflow = render_grids_banded(
        xyz, data, height, width, focal, baseline, valid,
        capacity_factor=capacity_factor, work_limit=work_limit,
        interpret=interpret)
    if fallback == "clip":
        return rendered, existing

    def do_fallback(_):
        return render_pointcloud(
            xyz.reshape(1, -1, 3),
            data.reshape(1, g * xyz.shape[1] * xyz.shape[2], -1),
            height, width, focal, baseline, valid=valid.reshape(1, -1),
            method="scatter")

    return lax.cond(overflow, do_fallback,
                    lambda _: (rendered, existing), operand=None)
