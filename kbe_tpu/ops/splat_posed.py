"""Pose-parameterized banded splat renderer (5th generation).

Same rendering semantics as ops/splat_banded.py (the reference CUDA point
renderer: utils/common.py ``kernel_pointrender_updateZee`` :434-521,
``updateDegrid`` :524-582, ``updateOutput`` :585-686) but built for the
75-pose frame loop (utils/common.py:222-260): the camera pose only
*translates* the cloud (apply_shift is xyz + shift — the reference's
perspective rescale at utils/common.py:104-109 is an exact identity), so
everything except the projected coordinates is pose-invariant.

splat_banded re-packs a full (NC, 80, 128) record array per frame — the
rebased residuals, corner fractions and z-keys all depend on the pose, so
~250 MB of HBM traffic per frame goes into re-materializing records whose
payload planes never change. Here:

  * ``prepare_banded_scene`` packs STATIC records once per video:
    camera-space (x, y, z), validity, and the raw payload planes;
  * ``render_scene_posed`` takes the pose as four scalars
    (shift_x, shift_y, shift_z, focal). The per-frame XLA prepass shrinks
    to fused elementwise projection + per-chunk min/max reductions + the
    CSR routing sort; the kernel recomputes u, v, corner fractions,
    residuals and z-keys in-register from the static planes and the
    scalar-prefetched pose — ~20 VPU ops per chunk visit, paid once and
    amortized over the band loop.

Consistency note: the prepass chunk bounds (which size the kernel's
clamped window iteration) and the kernel's floors are computed from the
same f32 expression tree, but by different compilers (XLA vs Mosaic). The
bounds are therefore widened by ``_EPS`` before flooring: any kernel value
within 1 ulp of the prepass value stays covered, and the widening only
costs an extra window-row when a chunk's true bound sits within _EPS of
an integer (rare, and then only +1 iteration for that chunk).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kbe_tpu.ops.splat_routed import _BIG, _DISQ, _INF, _build_csr, \
    _ceil_to
from kbe_tpu.ops.splat_banded import (
    BAND_W,
    CHUNK_H,
    CHUNK_W,
    PAD_X,
    PAD_Y,
    _HALO_HI,
    _HALO_LO,
    _RSENT,
    _depth_clusters,
    _shift_band,
)

# Tile geometry of the POSED kernel, decoupled from splat_banded's
# TILE_H/W (the wide-payload bootstrap kernel shares those and its
# group-looped VMEM scratch OOMs past 64-row tiles at 1024^2; the posed
# kernel's d=5 scratch has headroom). Bigger tiles shrink the CSR
# routing sort — the measured prepass bottleneck (~6.5 ms of the 7.9 ms
# per-frame routing cost at 16x2 tiles is lax.sort over t*nc keys) —
# and halve the per-program grid overhead. Defaults are the measured
# v5e best; KBE_POSED_TILE_H/W override for sweeps (falling back to
# KBE_TILE_H/W, then 128x512).
import os as _os

TILE_H = int(_os.environ.get("KBE_POSED_TILE_H",
                             _os.environ.get("KBE_TILE_H", "128")))
TILE_W = int(_os.environ.get("KBE_POSED_TILE_W",
                             _os.environ.get("KBE_TILE_W", "1024")))
from kbe_tpu.ops.splat_routed import _ceil_to as __ceil

_RGH = TILE_H + _HALO_LO + _HALO_HI
_RGW = TILE_W + _HALO_LO + _HALO_HI
_BH = __ceil(_RGH + PAD_Y + CHUNK_H, CHUNK_H)
_BW = __ceil(_RGW + PAD_X + 2 * CHUNK_W, 2 * CHUNK_W)

_EPS = 5e-3   # prepass-vs-kernel f32 divergence margin (see module doc)
_ZMIN = 1e-3  # z cutoff of the reference kernels (utils/common.py:453-455)


def _degrid_zee_raw(zee, inimg, bh, bw):
    """Degrid averaging in the RAW z-key domain — the exact arithmetic of
    the spec's _degrid_pass (ops/splat.py:75-103): opposing-pair average
    replaces the center via min when both neighbors are >= 1.0 closer.
    Out-of-image cells are disqualified with _DISQ (> any key + 1, same
    exclusion as the spec's +inf padding) and restored to the hole
    sentinel afterward."""
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
        total = total + jnp.where(good, one + two, 0.0)
        count = count + jnp.where(good, 2.0, 0.0)
    avg = total / jnp.maximum(count, 1.0)
    zee_d = jnp.where(count > 0.0, jnp.minimum(zee, avg), zee)
    return jnp.where(inimg, zee_d, _BIG)


class BandedScene(NamedTuple):
    """Pose-invariant render state, packed once per video.

    ``records``: (NC, (5 + C) * 8, 128) chunk records — row layout
    x(8), y(8), z(8), valid(8), cluster(8), payload ch0(8) .. chC-1(8).
    x and y are PRE-SCALED by z/(z+1e-7): apply_shift (ops/geometry.py:
    168-182) materializes that multiply before adding the shift, and
    materializing it here too keeps the kernel's ``x + sx`` a lone f32
    add — otherwise the compiler may contract mul+add into an fma and
    flip floor() at corner boundaries vs the scatter spec.

    ``cluster``: static 0/1 depth-cluster label per point (largest
    1/z-gap split per chunk). A chunk that straddles a depth edge has a
    displacement spread spanning BOTH surfaces at every pose, so its
    window iteration is mostly empty work (and overflows the budget on
    hard edges); splitting by z — pose-invariant — routes it as two
    tight per-cluster windows instead. Chunks with uniform depth get one
    occupied cluster and route exactly as before.

    ``px/py/pz/pv/pcl``: (G, Hp, Wp) padded planes (same pre-scaling),
    kept for the per-frame bounds prepass (reductions fuse into reads).
    ``xx0/yy0``: (NC,) f32 pixel-column/row origin of each chunk.
    """

    records: jax.Array
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    pv: jax.Array
    pcl: jax.Array
    xx0: jax.Array
    yy0: jax.Array


def _pack_static_records(px, py, pz, pv, pcl, pay):
    """Planes (G, Hp, Wp) + payload (G, Hp, Wp, C) -> (NC, R, 128)."""
    g, hp, wp = px.shape
    c = pay.shape[-1]
    planes = [px, py, pz, pv, pcl] + [pay[..., i] for i in range(c)]
    stacked = jnp.stack(planes, axis=0)
    p = stacked.shape[0]
    stacked = stacked.reshape(p, g, hp // CHUNK_H, CHUNK_H, wp // CHUNK_W,
                              CHUNK_W)
    rec = jnp.transpose(stacked, (1, 2, 4, 0, 3, 5))
    nc = g * (hp // CHUNK_H) * (wp // CHUNK_W)
    return rec.reshape(nc, p * CHUNK_H, CHUNK_W)


@jax.jit
def prepare_banded_scene(xyz: jax.Array, data: jax.Array,
                         valid: jax.Array) -> BandedScene:
    """Pack the pose-invariant records of a grid-structured cloud.

    ``xyz``: (G, H, W, 3) camera-space points; ``data``: (G, H, W, C)
    payload; ``valid``: (G, H, W) float mask.
    """
    g, h, w = xyz.shape[0], xyz.shape[1], xyz.shape[2]
    hp = _ceil_to(h, CHUNK_H)
    wp = _ceil_to(w, CHUNK_W)
    padding = ((0, 0), (0, hp - h), (0, wp - w))

    z = xyz[..., 2].astype(jnp.float32)
    scale = z / (z + 1e-7)
    px = jnp.pad(xyz[..., 0].astype(jnp.float32) * scale, padding)
    py = jnp.pad(xyz[..., 1].astype(jnp.float32) * scale, padding)
    pz = jnp.pad(z, padding)
    pv = jnp.pad((valid > 0.0).astype(jnp.float32), padding)
    pad_pay = jnp.pad(data.astype(jnp.float32), padding + ((0, 0),))
    pcl = _depth_clusters(pz, pv)

    records = _pack_static_records(px, py, pz, pv, pcl, pad_pay)

    nc_y = hp // CHUNK_H
    nc_x = wp // CHUNK_W
    cid = jnp.arange(g * nc_y * nc_x, dtype=jnp.int32)
    yy0 = (((cid % (nc_y * nc_x)) // nc_x) * CHUNK_H).astype(jnp.float32)
    xx0 = ((cid % nc_x) * CHUNK_W).astype(jnp.float32)
    return BandedScene(records, px, py, pz, pv, pcl, xx0, yy0)


def _build_posed_kernel(c, height, width, per_grid, wc, with_extra=False,
                        passes="ab"):
    """Fused zee + degrid + accumulate; per-pose geometry in-register.

    ``with_extra``: the bounded-overflow variant — the z-buffer is seeded
    from a precomputed padded plane (the overwork chunks' exact XLA
    scatter-min contribution) instead of the hole sentinel, and the
    DEGRIDDED z-buffer is written out per tile so the epilogue can run
    the spec's visibility test for the overflow points' accumulation.

    ``passes``: PROFILING ONLY — "a" streams just the zee pass (the
    accumulator stays zero), "b" just the accumulate pass against a
    sentinel z-buffer (everything visible). Output is wrong for either;
    "ab" (default) is the renderer.
    """
    d = c + 1
    bh, bw = _BH, _BW
    rgh, rgw = _RGH, _RGW
    # two-step constants: geometry.project_points evaluates
    # ``x*f/z + (0.5*w) - 0.5`` left-to-right; folding the adds would
    # change f32 rounding and flip floor() at corner boundaries
    hw = 0.5 * width
    hh = 0.5 * height

    def kernel(off_ref, ids_ref, meta1_ref, meta2_ref, pose_ref, rec_hbm,
               *rest):
        if with_extra:
            (extra_hbm, out_ref, zee_out, rec_vmem, zee_buf, acc_buf,
             copy_sem, out_sem, zee_sem) = rest
        else:
            (out_ref, rec_vmem, zee_buf, acc_buf, copy_sem,
             out_sem) = rest
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        t = ty * pl.num_programs(1) + tx
        start = off_ref[t]
        cnt = off_ref[t + 1] - start
        toy = ty * TILE_H - _HALO_LO
        tox = tx * TILE_W - _HALO_LO

        sx = pose_ref[0]
        sy = pose_ref[1]
        sz = pose_ref[2]
        focal = pose_ref[3]
        fb = pose_ref[4]  # focal * baseline

        def get_dma(slot, j):
            # routing entries are (chunk, cluster) pairs: e = cid*2 + cl
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
            want = e - 2 * cid  # cluster bit
            m1 = meta1_ref[start + j]
            m2 = meta2_ref[start + j]
            base_dy = m1 >> 16
            base_dx = ((m1 & 0xffff) ^ 0x8000) - 0x8000
            y_cnt = (m2 >> 8) & 0xff
            xw_cnt = m2 & 0xff
            return cid, want, base_dy, base_dx, y_cnt, xw_cnt

        def chunk_fields(slot, j):
            """Per-pose projection of this entry's static records:
            (rdyi, rdxi, fx, fy, kk) exactly as splat_banded's prepass
            computes them (ops/splat_banded.py:622-677); points of the
            OTHER depth cluster get the sentinel residual (they belong
            to the sibling entry)."""
            cid, want, base_dy, base_dx, _, _ = chunk_meta(j)
            rec = rec_vmem
            x = rec[slot, 0:CHUNK_H, :]
            y = rec[slot, CHUNK_H:2 * CHUNK_H, :]
            z = rec[slot, 2 * CHUNK_H:3 * CHUNK_H, :]
            val = rec[slot, 3 * CHUNK_H:4 * CHUNK_H, :]
            cl = rec[slot, 4 * CHUNK_H:5 * CHUNK_H, :]

            # x, y arrive pre-scaled by z/(z+1e-7) (see BandedScene)
            xs_ = x + sx
            ys_ = y + sy
            zs = z + sz
            ok = ((zs >= _ZMIN) & (val > 0.0)
                  & (cl == want.astype(jnp.float32)))
            safez = jnp.where(ok, zs, 1.0)
            u = (xs_ * focal / safez + hw) - 0.5
            v = (ys_ * focal / safez + hh) - 0.5
            x0 = jnp.floor(u)
            y0 = jnp.floor(v)
            fx = jnp.where(ok, u - x0, 0.0)
            fy = jnp.where(ok, v - y0, 0.0)
            # RAW-domain z-key: the spec's key is quantized by the f32
            # rounding of ``1e6 - t`` (splat_error, ops/geometry.py:
            # 96-102). splat_banded re-bases keys to the offset domain
            # (key - 1e6) behind an optimization barrier so the compiler
            # can't fold the round-trip; Mosaic has no such barrier, so
            # this kernel keeps the whole z pipeline (buffer, degrid,
            # visibility test) in the raw domain — the quantization is
            # then structural and nothing is foldable.
            kk = jnp.where(ok, 1000000.0 - fb / (zs + 1e-7), _DISQ)

            py0 = (cid % per_grid) // wc * CHUNK_H
            px0 = (cid % wc) * CHUNK_W
            yy = (py0 + lax.broadcasted_iota(jnp.int32,
                                             (CHUNK_H, CHUNK_W), 0))
            xx = (px0 + lax.broadcasted_iota(jnp.int32,
                                             (CHUNK_H, CHUNK_W), 1))
            rdyi = jnp.where(ok, y0.astype(jnp.int32) - yy - base_dy,
                             _RSENT)
            rdxi = jnp.where(ok, x0.astype(jnp.int32) - xx - base_dx,
                             _RSENT)
            return rdyi, rdxi, fx, fy, kk

        def place(buf, row_off, by, bx, block, merge, fill):
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
            cid, _, base_dy, base_dx, y_cnt, xw_cnt = chunk_meta(j)
            py_base = (cid % per_grid) // wc * CHUNK_H + base_dy - toy
            px_base = (cid % wc) * CHUNK_W + base_dx - tox
            dly_lo = jnp.maximum(0, -CHUNK_H + 1 - py_base)
            dly_hi = jnp.minimum(y_cnt - 1, rgh - 1 - py_base)
            xw_lo = jnp.maximum(0, (-2 * CHUNK_W - px_base) // BAND_W + 1)
            xw_hi = jnp.minimum(xw_cnt - 1, (rgw - 1 - px_base) // BAND_W)

            def xw_body(xw, _):
                px_ = px_base + xw * BAND_W

                def y_body(dly, __):
                    body(dly, py_base + dly, px_, xw * BAND_W)
                    return 0

                lax.fori_loop(dly_lo, dly_hi + 1, y_body, 0)
                return 0

            lax.fori_loop(xw_lo, xw_hi + 1, xw_body, 0)

        # ---- pass A: raw zee via banded nearest-corner min-merges ----
        def zee_chunk(slot, j):
            rdyi, rdxi, fx, fy, kk = chunk_fields(slot, j)
            rdyn = rdyi + (fy > 0.5)
            rdxn = rdxi + (fx > 0.5)

            def body(dly, py, px, xs):
                rdl = rdxn - xs
                my = rdyn == dly
                band = jnp.full((CHUNK_H, 2 * CHUNK_W), _DISQ, jnp.float32)
                for s in range(BAND_W):
                    vals = jnp.where(my & (rdl == s), kk, _DISQ)
                    band = jnp.minimum(band, _shift_band(vals, s, _DISQ))
                place(zee_buf, 0, py + PAD_Y, px + PAD_X, band,
                      jnp.minimum, _DISQ)

            window_loop(j, body)

        # hole sentinel == the spec's _ZFAR (raw domain); the overflow
        # variant seeds from the overwork chunks' scatter-min plane so
        # both point subsets share ONE z-buffer (min is exact/associative)
        if with_extra:
            cpz = pltpu.make_async_copy(
                extra_hbm.at[pl.ds(ty * TILE_H, bh),
                             pl.ds(tx * TILE_W, bw)],
                zee_buf, zee_sem)
            cpz.start()
            cpz.wait()
        else:
            zee_buf[:, :] = jnp.full((bh, bw), _BIG, jnp.float32)
        if "a" in passes:
            stream(zee_chunk)

            # ---- degrid on the 2D buffer (raw-domain spec averaging) ----
            zee = zee_buf[:, :]
            by_iota = lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
            bx_iota = lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
            gy_img = by_iota - PAD_Y + toy
            gx_img = bx_iota - PAD_X + tox
            inimg = ((gy_img >= 0) & (gy_img < height) & (gx_img >= 0)
                     & (gx_img < width))
            zee_buf[:, :] = _degrid_zee_raw(zee, inimg, bh, bw)
        if with_extra:
            cpz2 = pltpu.make_async_copy(zee_buf, zee_out.at[t], zee_sem)
            cpz2.start()
            cpz2.wait()

        # ---- pass B: banded bilinear accumulation with in-band z-test ----
        acc_buf[:, :] = jnp.zeros((d * bh, bw), jnp.float32)

        def acc_chunk(slot, j):
            rdyi, rdxi, fx, fy, kk = chunk_fields(slot, j)

            def body(dly, py, px, xs):
                rdl = rdxi - xs
                wy = ((rdyi == dly).astype(jnp.float32) * (1.0 - fy)
                      + (rdyi == dly - 1).astype(jnp.float32) * fy)

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
                    zs_ = zband[:, s:s + CHUNK_W]
                    vis = kk <= zs_ + 1.0
                    w = jnp.where(vis, wy * wx, 0.0)
                    for ch in range(c):
                        pay = rec_vmem[slot,
                                       (5 + ch) * CHUNK_H:(6 + ch)
                                       * CHUNK_H, :]
                        bands[ch] = bands[ch] + _shift_band(
                            w * pay, s, 0.0)
                    # ones channel: invalid points carry zero weight
                    # (their sentinel residual fails the wy mask)
                    bands[d - 1] = bands[d - 1] + _shift_band(w, s, 0.0)
                for ch in range(d):
                    place(acc_buf, ch * bh, by, bx, bands[ch],
                          lambda cu, bl: cu + bl, 0.0)

            window_loop(j, body)

        if "b" in passes:
            stream(acc_chunk)

        cp = pltpu.make_async_copy(acc_buf, out_ref.at[t], out_sem)
        cp.start()
        cp.wait()

    return kernel


def _chunk_red(x, ok, red, fill):
    """Valid-masked per-chunk reduction. (G, Hp, Wp) -> (NC,)."""
    g, hp, wp = x.shape
    x = jnp.where(ok, x, fill)
    x = x.reshape(g, hp // CHUNK_H, CHUNK_H, wp // CHUNK_W, CHUNK_W)
    return red(x, axis=(2, 4)).reshape(-1)


class PoseRouting(NamedTuple):
    """Per-pose CSR routing + chunk meta for one camera pose."""

    chunk_ids: jax.Array   # (capacity,)
    offsets: jax.Array     # (T + 1,)
    meta1: jax.Array       # (NC,) packed base_dy/base_dx
    meta2: jax.Array       # (NC,) packed y_cnt/xw_cnt
    overflow: jax.Array    # () bool
    over_ids: Any = None   # (overflow_cap,) overwork chunk ids (cap > 0)
    n_over: Any = None     # () number of overwork chunks (cap > 0)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "capacity_factor",
                              "work_limit", "overflow_cap"))
def pose_routing(
    scene: BandedScene,
    shift: jax.Array,
    focal,
    height: int,
    width: int,
    capacity_factor: int = 4,
    work_limit: int = 256,
    overflow_cap: int = 0,
) -> PoseRouting:
    """The per-pose XLA prepass: per-(chunk, depth-cluster) displacement
    bounds -> meta packing + CSR tile routing (separated from the kernel
    so it can be profiled and batched over poses independently).

    Routing ENTRIES are (chunk, cluster) pairs: entry e = cid * 2 + cl.
    An edge chunk routes as two tight windows instead of one straddling
    window; an unoccupied cluster produces an empty entry that routes
    nowhere.
    """
    px, py, pz, pv, pcl = scene.px, scene.py, scene.pz, scene.pv, scene.pcl
    g, hp, wp = px.shape
    sx, sy, sz = shift[0], shift[1], shift[2]
    focal = jnp.asarray(focal, jnp.float32)

    # --- per-pose bounds prepass (fused elementwise + chunk reductions);
    # the same expression tree as the kernel's chunk_fields, with a
    # slightly permissive z-cut so every point the kernel might accept is
    # covered (floor-boundary divergence is absorbed by _EPS)
    xs_ = px + sx
    ys_ = py + sy
    zs = pz + sz
    okb = (zs >= _ZMIN - 1e-6) & (pv > 0.0)
    safez = jnp.where(okb, zs, 1.0)
    yyg = lax.broadcasted_iota(jnp.float32, (g, hp, wp), 1)
    xxg = lax.broadcasted_iota(jnp.float32, (g, hp, wp), 2)
    u = (xs_ * focal / safez + (0.5 * width)) - 0.5
    v = (ys_ * focal / safez + (0.5 * height)) - 0.5
    cdx = u - xxg
    cdy = v - yyg

    big = jnp.float32(3e38)

    def cluster_bounds(want):
        ok_c = okb & (pcl == want)
        return (_chunk_red(cdx, ok_c, jnp.min, big),
                _chunk_red(cdx, ok_c, jnp.max, -big),
                _chunk_red(cdy, ok_c, jnp.min, big),
                _chunk_red(cdy, ok_c, jnp.max, -big))

    # (NC, 2) entry-minor stacking -> entry id = cid * 2 + cluster
    b0 = cluster_bounds(0.0)
    b1 = cluster_bounds(1.0)
    dx_lo, dx_hi, dy_lo, dy_hi = [
        jnp.stack([a, b], axis=1).reshape(-1) for a, b in zip(b0, b1)]
    empty = dx_lo > 1e37

    base_dx = jnp.floor(dx_lo - _EPS)
    top_dx = jnp.floor(dx_hi + _EPS)
    base_dy = jnp.floor(dy_lo - _EPS)
    top_dy = jnp.floor(dy_hi + _EPS)
    spread_y = jnp.where(empty, -1.0, top_dy - base_dy).astype(jnp.int32)
    spread_x = jnp.where(empty, -1.0, top_dx - base_dx).astype(jnp.int32)
    base_dy = jnp.where(empty, 0.0, base_dy).astype(jnp.int32)
    base_dx = jnp.where(empty, 0.0, base_dx).astype(jnp.int32)
    y_cnt_full = jnp.maximum(spread_y + 2, 0)
    xw_cnt_full = jnp.where(empty, 0, (spread_x + 1) // BAND_W + 1)
    overwork = ((y_cnt_full * xw_cnt_full > work_limit)
                | (y_cnt_full > 255) | (xw_cnt_full > 255))
    y_cnt = jnp.clip(y_cnt_full, 0, 255)
    xw_cnt = jnp.clip(xw_cnt_full, 0, 255)
    base_dy = jnp.clip(base_dy, -32767, 32767)
    base_dx = jnp.clip(base_dx, -32767, 32767)
    meta1 = (base_dy << 16) | (base_dx & 0xffff)
    meta2 = (y_cnt << 8) | xw_cnt

    # --- CSR routing from conservative per-entry bboxes
    exx0 = jnp.repeat(scene.xx0, 2)
    eyy0 = jnp.repeat(scene.yy0, 2)
    minu = jnp.where(empty | overwork, _INF, dx_lo - _EPS + exx0)
    maxu = jnp.where(empty | overwork, -_INF,
                     dx_hi + _EPS + exx0 + (CHUNK_W - 1))
    minv = jnp.where(empty | overwork, _INF, dy_lo - _EPS + eyy0)
    maxv = jnp.where(empty | overwork, -_INF,
                     dy_hi + _EPS + eyy0 + (CHUNK_H - 1))

    nc = scene.records.shape[0]
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    # capacity stays proportional to NC, not entries: per-entry bboxes
    # partition each chunk's points, so total tile coverage is at most a
    # little above the unsplit routing's (and far below it on edges)
    capacity = int(capacity_factor) * nc
    chunk_ids, offsets, csr_overflow, _dropped = _build_csr(
        minu, maxu, minv, maxv, n_ty, n_tx, capacity, TILE_H, TILE_W)
    if overflow_cap > 0:
        # overwork entries are rendered EXACTLY by the bounded per-chunk
        # scatter epilogue (render_scene_posed); only beyond-cap counts
        # as a real overflow
        n_over = jnp.sum(overwork.astype(jnp.int32))
        over_ids = jnp.argsort(
            jnp.logical_not(overwork)).astype(jnp.int32)[:overflow_cap]
        overflow = csr_overflow | (n_over > overflow_cap)
        return PoseRouting(chunk_ids, offsets, meta1, meta2, overflow,
                           over_ids, n_over)
    overflow = csr_overflow | jnp.any(overwork)
    return PoseRouting(chunk_ids, offsets, meta1, meta2, overflow)


def _overflow_points(scene: BandedScene, routing: PoseRouting, shift,
                     focal, baseline, height, width, c):
    """Project the overwork entries' points with the SPEC's expression
    tree (apply_shift ∘ project_points ∘ splat_error, ops/splat.py /
    ops/geometry.py) — their handling must be bit-equal to the scatter
    renderer's. Entries are (chunk, cluster) pairs; only the entry's own
    cluster contributes (the sibling routes normally or via its own
    entry). Returns (u, v, err, ok, payload (M, c))."""
    from kbe_tpu.ops.geometry import project_points, splat_error

    cap = routing.over_ids.shape[0]
    cid = routing.over_ids // 2
    want = (routing.over_ids - 2 * cid).astype(jnp.float32)
    recs = jnp.take(scene.records, cid, axis=0)
    planes = recs.reshape(cap, 5 + c, CHUNK_H, CHUNK_W)
    x = planes[:, 0].reshape(-1)   # pre-scaled by z/(z+1e-7), exactly
    y = planes[:, 1].reshape(-1)   # what apply_shift materializes
    z = planes[:, 2].reshape(-1)
    val = planes[:, 3].reshape(-1)
    cl = planes[:, 4].reshape(-1)
    pay = jnp.moveaxis(planes[:, 5:], 1, -1).reshape(-1, c)
    xyz_sh = jnp.stack([x + shift[0], y + shift[1], z + shift[2]], -1)
    u, v, ok = project_points(xyz_sh, height, width, focal)
    per = jnp.repeat(
        (jnp.arange(cap, dtype=jnp.int32) < routing.n_over), CHUNK_H
        * CHUNK_W)
    want_per = jnp.repeat(want, CHUNK_H * CHUNK_W)
    ok = ok & (val > 0.0) & per & (cl == want_per)
    err = splat_error(xyz_sh[..., 2], focal, baseline)
    return u, v, err, ok, pay


@functools.partial(
    jax.jit, static_argnames=("height", "width", "capacity_factor",
                              "work_limit", "interpret", "overflow_cap",
                              "passes"))
def render_scene_posed(
    scene: BandedScene,
    shift: jax.Array,
    focal,
    height: int,
    width: int,
    baseline,
    capacity_factor: int = 4,
    work_limit: int = 256,
    interpret: bool | None = None,
    routing: PoseRouting | None = None,
    overflow_cap: int = 0,
    passes: str = "ab",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Render a prepared scene at one camera pose.

    Semantics == splat_banded.render_grids_banded(xyz + shift, ...) —
    golden-tested against it. Returns (rendered (1, H, W, C),
    existing (1, H, W, 1), overflow). ``routing`` lets a caller supply a
    precomputed (possibly batched-over-poses) prepass.

    ``overflow_cap > 0`` adds the bounded per-chunk scatter path: up to
    that many overwork chunks (per-chunk window budget exceeded — the
    reference never drops a point, utils/common.py:585-669) render
    EXACTLY through the XLA scatter spec, sharing one z-buffer with the
    kernel (seeded scatter-min in, degridded z-buffer out); the lax.cond
    epilogue costs nothing when no chunk overflows. ``overflow`` then
    means genuinely dropped work (beyond-cap or CSR overflow) only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    px = scene.px
    g, hp, wp = px.shape
    c = scene.records.shape[1] // CHUNK_H - 5
    d = c + 1
    sx, sy, sz = shift[0], shift[1], shift[2]
    focal = jnp.asarray(focal, jnp.float32)
    fb = focal * jnp.asarray(baseline, jnp.float32)

    if routing is None:
        routing = pose_routing(scene, shift, focal, height, width,
                               capacity_factor, work_limit, overflow_cap)
    if overflow_cap > 0 and routing.over_ids is None:
        raise ValueError("overflow_cap > 0 needs a routing computed with "
                         "the same overflow_cap")
    chunk_ids, offsets = routing.chunk_ids, routing.offsets
    meta1, meta2, overflow = routing.meta1, routing.meta2, routing.overflow

    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    t = n_ty * n_tx
    pose = jnp.stack([jnp.asarray(sx, jnp.float32),
                      jnp.asarray(sy, jnp.float32),
                      jnp.asarray(sz, jnp.float32), focal, fb])

    with_extra = overflow_cap > 0
    if with_extra:
        from kbe_tpu.ops.splat import _zee_pass

        rows = (n_ty - 1) * TILE_H + _BH
        lanes = (n_tx - 1) * TILE_W + _BW
        oy = PAD_Y + _HALO_LO
        ox = PAD_X + _HALO_LO
        # a data-derived zero so BOTH cond branches share the same
        # varying-manual-axes type under shard_map (n_over is a finite
        # int32, so the product is exactly 0.0)
        vary0 = jnp.asarray(routing.n_over, jnp.float32) * 0.0

        def build_plane(_):
            # the overflow points' gather + projection lives INSIDE the
            # cond branches (here and extra_acc below): outside it would
            # gather ~cap x CHUNK_H x CHUNK_W records (~9 MB) and project
            # them EVERY frame even when nothing overflows — the common
            # case the epilogue is supposed to be free in
            u, v, err, ok, _pay = _overflow_points(
                scene, routing, (sx, sy, sz), focal,
                jnp.asarray(baseline, jnp.float32), height, width, c)
            zee = _zee_pass(u, v, err, ok, height, width)
            plane = jnp.full((rows, lanes), _BIG, jnp.float32)
            return lax.dynamic_update_slice(plane, zee, (oy, ox))

        extra_plane = lax.cond(
            routing.n_over > 0, build_plane,
            lambda _: jnp.full((rows, lanes), _BIG, jnp.float32) + vary0,
            operand=None)

    nc_y = hp // CHUNK_H
    nc_x = wp // CHUNK_W
    scratch = [
        pltpu.VMEM((2, (5 + c) * CHUNK_H, CHUNK_W), jnp.float32),
        pltpu.VMEM((_BH, _BW), jnp.float32),
        pltpu.VMEM((d * _BH, _BW), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if with_extra:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 if with_extra
                                                        else 1),
        out_specs=([pl.BlockSpec(memory_space=pl.ANY)] * 2 if with_extra
                   else pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=scratch,
    )
    kernel = _build_posed_kernel(c, height, width, nc_y * nc_x, nc_x,
                                 with_extra, passes)
    if with_extra:
        out_shape = [
            jax.ShapeDtypeStruct((t, d * _BH, _BW), jnp.float32),
            jax.ShapeDtypeStruct((t, _BH, _BW), jnp.float32),
        ]
        acc_flat, zee_flat = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(offsets, chunk_ids, jnp.take(meta1, chunk_ids),
          jnp.take(meta2, chunk_ids), pose, scene.records, extra_plane)
    else:
        acc_flat = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, d * _BH, _BW), jnp.float32),
            interpret=interpret,
        )(offsets, chunk_ids, jnp.take(meta1, chunk_ids),
          jnp.take(meta2, chunk_ids), pose, scene.records)

    acc = acc_flat.reshape(n_ty, n_tx, d, _BH, _BW)
    y0c = PAD_Y + _HALO_LO
    x0c = PAD_X + _HALO_LO
    core = acc[:, :, :, y0c:y0c + TILE_H, x0c:x0c + TILE_W]
    img = jnp.transpose(core, (0, 3, 1, 4, 2)).reshape(
        n_ty * TILE_H, n_tx * TILE_W, d)[:height, :width]

    if with_extra:
        zee_cores = zee_flat.reshape(n_ty, n_tx, _BH, _BW)[
            :, :, y0c:y0c + TILE_H, x0c:x0c + TILE_W]
        zee_degrid = jnp.transpose(zee_cores, (0, 2, 1, 3)).reshape(
            n_ty * TILE_H, n_tx * TILE_W)[:height, :width]

        def extra_acc(_):
            from kbe_tpu.ops.splat import _accumulate_pass

            u, v, err, ok, pay = _overflow_points(
                scene, routing, (sx, sy, sz), focal,
                jnp.asarray(baseline, jnp.float32), height, width, c)
            acc_o = _accumulate_pass(u, v, err, ok, pay, zee_degrid,
                                     height, width)
            return jnp.moveaxis(acc_o, 0, -1)  # (H, W, d)

        img = img + lax.cond(
            routing.n_over > 0, extra_acc,
            lambda _: jnp.zeros((height, width, d), jnp.float32) + vary0,
            operand=None)

    rendered = img[..., :c] / (img[..., c:] + 1e-7)
    existing = img[..., c]
    return rendered[None], existing[None, ..., None], overflow
