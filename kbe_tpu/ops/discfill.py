"""Disocclusion filling — vectorized 16-direction background fill.

Replaces the reference's ``kernel_discfill_updateOutput`` CUDA kernel
(reference utils/common.py:833-937): for every hole pixel (depth <= 0),
march along 16 fixed directions both forwards and backwards to the nearest
valid pixel, take the direction whose from/to endpoints are closest
together, and copy the channels of the *farther* (background) endpoint into
the hole.

TPU-native reformulation: because the reference marches by unit steps of the
normalized direction and rounds the accumulated float position
(utils/common.py:876-894), the k-th visited pixel is p + round(k * d̂) — the
same static offset for every pixel. We therefore precompute the offset
tables for all 32 rays (16 directions x both ways), and find each ray's
first "event" (valid pixel or leaving the image) with a single ``fori_loop``
over k-chunks whose body evaluates all rays at once on an int8 validity
map. K bounds the march (the CUDA original is unbounded); rays that exhaust
K are treated as unusable, which only differs for holes wider than K
pixels — and hole width is bounded by the camera shift magnitude.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Direction table from utils/common.py:859-860 (normalized in-kernel).
_DIR_X = (-1, 0, 1, 1, -1, 1, 2, 2, -2, -1, 1, 2, 3, 3, 3, 3)
_DIR_Y = (1, 1, 1, 0, 2, 2, 1, -1, 3, 3, 3, 3, 2, 1, -1, -2)

_KCHUNK = 8


def _c_round(x: float) -> int:
    """C round(): half away from zero (the CUDA kernel's rounding)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _offset_tables(steps: int):
    """(32, steps) x/y offset tables: rays 0..15 march along +d̂ ('to'),
    rays 16..31 along -d̂ ('from'; c_round is odd so -table is exact)."""
    ox, oy = [], []
    for dx, dy in zip(_DIR_X, _DIR_Y):
        norm = math.sqrt(dx * dx + dy * dy)
        ox.append([_c_round(k * dx / norm) for k in range(1, steps + 1)])
        oy.append([_c_round(k * dy / norm) for k in range(1, steps + 1)])
    ox = ox + [[-v for v in row] for row in ox]
    oy = oy + [[-v for v in row] for row in oy]
    import numpy as np

    return np.asarray(ox, np.int32), np.asarray(oy, np.int32)


def _first_events(valid, steps: int):
    """First k in 1..steps whose offset lands on a valid pixel or exits the
    image, for all 32 rays at once.

    ``valid``: (H, W) bool. Returns (end_y, end_x, usable): (32, H, W)
    endpoint coords and whether a valid pixel was found before going out
    of bounds (or running out of steps).
    """
    h, w = valid.shape
    pad = steps + 1
    # int8 map: 1 = valid, 0 = hole, -1 = outside the image
    vpad = jnp.pad(valid.astype(jnp.int8), ((pad, pad), (pad, pad)),
                   constant_values=-1)
    ox_np, oy_np = _offset_tables(steps)
    ox = jnp.asarray(ox_np)
    oy = jnp.asarray(oy_np)

    n_chunks = -(-steps // _KCHUNK)

    def body(ci, carry):
        found_oy, found_ox, found_valid, found_any = carry
        # chunks iterate from the far end; within a chunk, ks are folded
        # high-to-low into one event record before the carry is touched, so
        # carry traffic is paid once per chunk. Endpoint OFFSETS are carried
        # directly (a post-hoc (32, K)-table gather over H*W pixels is far
        # more expensive than two extra carries on this chip).
        base = (n_chunks - 1 - ci) * _KCHUNK
        ev_oy = jnp.zeros((32, h, w), jnp.int32)
        ev_ox = jnp.zeros((32, h, w), jnp.int32)
        ev_valid = jnp.zeros((32, h, w), bool)
        ev_any = jnp.zeros((32, h, w), bool)
        for j in reversed(range(_KCHUNK)):
            k = jnp.minimum(base + j, steps - 1)
            shifted = jnp.stack([
                lax.dynamic_slice(vpad, (pad + oy[r, k], pad + ox[r, k]),
                                  (h, w)) for r in range(32)])
            is_valid = shifted == 1
            event = (is_valid | (shifted == -1)) & (base + j < steps)
            koy = lax.dynamic_slice(oy, (0, k), (32, 1))[:, :, None]
            kox = lax.dynamic_slice(ox, (0, k), (32, 1))[:, :, None]
            ev_oy = jnp.where(event, koy, ev_oy)
            ev_ox = jnp.where(event, kox, ev_ox)
            ev_valid = jnp.where(event, is_valid, ev_valid)
            ev_any = ev_any | event
        found_oy = jnp.where(ev_any, ev_oy, found_oy)
        found_ox = jnp.where(ev_any, ev_ox, found_ox)
        found_valid = jnp.where(ev_any, ev_valid, found_valid)
        found_any = found_any | ev_any
        return found_oy, found_ox, found_valid, found_any

    init = (jnp.zeros((32, h, w), jnp.int32),
            jnp.zeros((32, h, w), jnp.int32),
            jnp.zeros((32, h, w), bool), jnp.zeros((32, h, w), bool))
    found_oy, found_ox, found_valid, found_any = lax.fori_loop(
        0, n_chunks, body, init)
    usable = found_valid & found_any
    yy = lax.broadcasted_iota(jnp.int32, (32, h, w), 1)
    xx = lax.broadcasted_iota(jnp.int32, (32, h, w), 2)
    return yy + found_oy, xx + found_ox, usable


def _fill_single(image: jax.Array, depth: jax.Array, steps: int) -> jax.Array:
    h, w, c = image.shape
    valid = depth[..., 0] > 0.0
    ey, ex, ok = _first_events(valid, steps)
    # rays 0..15 are 'to' (+d̂), 16..31 are 'from' (-d̂)
    ty, tx, t_ok = ey[:16], ex[:16], ok[:16]
    fy, fx, f_ok = ey[16:], ex[16:], ok[16:]
    both = t_ok & f_ok

    dist = jnp.sqrt((tx - fx).astype(jnp.float32) ** 2
                    + (ty - fy).astype(jnp.float32) ** 2)
    dist = jnp.where(both, dist, jnp.inf)

    # first direction with the strictly smallest distance (argmin = first
    # minimum, matching the reference's strict '>' update); depth gathers
    # happen only for the winning direction — equivalent and far cheaper.
    bestdir = jnp.argmin(dist, axis=0)  # (H, W)
    take = lambda a: jnp.take_along_axis(a, bestdir[None], axis=0)[0]
    bfy, bfx, bty, btx = take(fy), take(fx), take(ty), take(tx)

    dflat = depth[..., 0].reshape(-1)
    d_from = dflat[jnp.clip(bfy * w + bfx, 0, h * w - 1)]
    d_to = dflat[jnp.clip(bty * w + btx, 0, h * w - 1)]
    # farther endpoint (background) wins (utils/common.py:900-907)
    use_to = d_from < d_to
    fill_y = jnp.where(use_to, bty, bfy)
    fill_x = jnp.where(use_to, btx, bfx)
    any_ok = jnp.any(both, axis=0)

    flat = jnp.clip(fill_y * w + fill_x, 0, h * w - 1)
    filled = image.reshape(-1, c)[flat]
    do_fill = (~valid) & any_ok
    return jnp.where(do_fill[..., None], filled, image)


def resolve_thin_holes(image: jax.Array, depth: jax.Array, k0: int,
                       roi=None):
    """Phase-0 fill: resolve hole pixels whose winner is PROVABLY global
    after a radius-``k0`` march, with ~32*k0 shifted int8 compares.

    Soundness bound: a ray's event at step k has endpoint offset
    o = c_round(k*d_hat) with |o - k*d_hat| <= sqrt(2)/2, so its projection
    on the direction satisfies o . d_hat >= k - 0.7072. For any direction
    with a ray still un-evented after k0 steps, the eventual pair distance
    |o_to - o_from| >= (o_to + (-o_from)) . d_hat >= (k0+1 - 0.7072)
    + (1 - 0.7072) = k0 + 0.5856. Hence if the best pair distance among
    fully-evented directions is < k0 + 0.58, NO un-evented direction can
    beat or tie it (ties go to the first index; an undecided direction's
    dist is strictly larger), and the selection — and therefore the fill —
    equals the unbounded march's, bit-exactly (same offset tables, same
    f32 distance arithmetic, same farther-endpoint choice).

    ``roi``: static (y0, y1, x0, x1); holes outside are neither filled nor
    reported unresolved (the caller's crop discards them).

    Returns (filled (H, W, C), unresolved (H, W) bool — in-ROI holes that
    need a real march).
    """
    h, w, c = image.shape
    valid = depth[..., 0] > 0.0
    hole = ~valid
    if roi is not None:
        y0, y1, x0, x1 = roi
        yy_r = lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx_r = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        hole = hole & ((yy_r >= y0) & (yy_r < y1) & (xx_r >= x0)
                       & (xx_r < x1))

    pad = k0 + 1
    vpad = jnp.pad(valid.astype(jnp.int8), ((pad, pad), (pad, pad)),
                   constant_values=-1)
    ox_np, oy_np = _offset_tables(k0)  # (32, k0) static tables

    def ray_events(r):
        """First event of ray r within k0 steps, fully unrolled over the
        STATIC offset table. Returns (decided, is_valid, off_y, off_x) —
        per-pixel (H, W) maps; offsets are selected static constants."""
        decided = jnp.zeros((h, w), bool)
        is_valid = jnp.zeros((h, w), bool)
        off_y = jnp.zeros((h, w), jnp.int32)
        off_x = jnp.zeros((h, w), jnp.int32)
        for k in range(k0):
            dy = int(oy_np[r, k])
            dx = int(ox_np[r, k])
            s = lax.dynamic_slice(vpad, (pad + dy, pad + dx), (h, w))
            event = (s != 0) & ~decided
            is_valid = jnp.where(event, s == 1, is_valid)
            off_y = jnp.where(event, dy, off_y)
            off_x = jnp.where(event, dx, off_x)
            decided = decided | event
        return decided, is_valid, off_y, off_x

    inf = jnp.float32(3e38)
    best_dist = jnp.full((h, w), inf, jnp.float32)
    b_fy = jnp.zeros((h, w), jnp.int32)
    b_fx = jnp.zeros((h, w), jnp.int32)
    b_ty = jnp.zeros((h, w), jnp.int32)
    b_tx = jnp.zeros((h, w), jnp.int32)
    all_decided = jnp.ones((h, w), bool)

    for d in range(16):
        t_dec, t_ok, t_oy, t_ox = ray_events(d)
        f_dec, f_ok, f_oy, f_ox = ray_events(d + 16)
        all_decided = all_decided & t_dec & f_dec
        both = t_dec & f_dec & t_ok & f_ok
        dist = jnp.sqrt((t_ox - f_ox).astype(jnp.float32) ** 2
                        + (t_oy - f_oy).astype(jnp.float32) ** 2)
        dist = jnp.where(both, dist, inf)
        better = dist < best_dist  # strict: first minimum wins
        best_dist = jnp.where(better, dist, best_dist)
        b_fy = jnp.where(better, f_oy, b_fy)
        b_fx = jnp.where(better, f_ox, b_fx)
        b_ty = jnp.where(better, t_oy, b_ty)
        b_tx = jnp.where(better, t_ox, b_tx)

    provable = all_decided | (best_dist < jnp.float32(k0) + 0.58)
    do_fill = hole & provable & (best_dist < 1e38)
    unresolved = hole & ~provable

    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    bfy, bfx = yy + b_fy, xx + b_fx
    bty, btx = yy + b_ty, xx + b_tx
    dflat = depth[..., 0].reshape(-1)
    d_from = dflat[jnp.clip(bfy * w + bfx, 0, h * w - 1)]
    d_to = dflat[jnp.clip(bty * w + btx, 0, h * w - 1)]
    use_to = d_from < d_to  # farther endpoint (background) wins
    fill_y = jnp.where(use_to, bty, bfy)
    fill_x = jnp.where(use_to, btx, bfx)
    flat = jnp.clip(fill_y * w + fill_x, 0, h * w - 1)
    filled = image.reshape(-1, c)[flat]
    return jnp.where(do_fill[..., None], filled, image), unresolved


def fill_disocclusion(image: jax.Array, depth: jax.Array,
                      steps: int = 128) -> jax.Array:
    """Fill depth<=0 holes from the nearest background pixels.

    Args:
      image: (B, H, W, C) rendered frame (any channel count).
      depth: (B, H, W, 1) render depth; <= 0 marks holes.
      steps: static march bound K (reference is unbounded; holes wider than
        K pixels stay unfilled).

    Returns (B, H, W, C). Reference utils/common.py:833-937.
    """
    return jax.vmap(lambda i, d: _fill_single(i, d, steps))(image, depth)
