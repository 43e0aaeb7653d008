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
same static offset for every pixel. We therefore precompute, per ray, the
offset table for k = 1..K and find the first "event" (valid pixel or leaving
the image) with a ``fori_loop`` of shifted-mask lookups. K bounds the march
(the CUDA original is unbounded); rays that exhaust K are treated as
unusable, which only differs for holes wider than K pixels.
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


def _c_round(x: float) -> int:
    """C round(): half away from zero (the CUDA kernel's rounding)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _offset_table(dx: float, dy: float, steps: int):
    """Visited integer offsets after k=1..steps unit steps along (dx, dy)."""
    norm = math.sqrt(dx * dx + dy * dy)
    ux, uy = dx / norm, dy / norm
    offs = [(_c_round(k * ux), _c_round(k * uy)) for k in range(1, steps + 1)]
    return offs


def _first_event(valid_pad, ox, oy, steps: int, h: int, w: int, pad: int):
    """First k whose offset lands on a valid pixel or exits the image.

    ``valid_pad``: (H+2*pad, W+2*pad) f32 validity, zero border.
    ``ox, oy``: (steps,) int32 offset tables.
    Returns (end_y, end_x, usable) — endpoint coords (int32, (H, W)) and a
    bool map of rays that found a valid pixel before going out of bounds.
    """
    # inb_pad marks in-image pixels inside the padded frame.
    def body(i, carry):
        found_k, found_valid = carry
        k = steps - 1 - i  # iterate K..1 so the smallest event k wins
        sy = pad + oy[k]
        sx = pad + ox[k]
        shifted = lax.dynamic_slice(valid_pad, (sy, sx), (h, w))
        v = shifted > 0.5
        oob = shifted < -0.5  # border sentinel
        event = v | oob
        found_k = jnp.where(event, k, found_k)
        found_valid = jnp.where(event, v & ~oob, found_valid)
        return found_k, found_valid

    init = (jnp.full((h, w), steps, jnp.int32), jnp.zeros((h, w), bool))
    found_k, found_valid = lax.fori_loop(0, steps, body, init)
    usable = found_valid & (found_k < steps)
    kk = jnp.clip(found_k, 0, steps - 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    end_y = yy + oy[kk]
    end_x = xx + ox[kk]
    return end_y, end_x, usable


def _fill_single(image: jax.Array, depth: jax.Array, steps: int) -> jax.Array:
    h, w, c = image.shape
    valid = (depth[..., 0] > 0.0)
    pad = steps + 1  # unit-direction components => |offset| <= k <= steps
    # Padded validity with a -1 "out of image" sentinel border.
    vpad = jnp.pad(valid.astype(jnp.float32), ((pad, pad), (pad, pad)),
                   constant_values=-1.0)

    best_dist = jnp.full((h, w), jnp.inf, jnp.float32)
    fill_y = jnp.zeros((h, w), jnp.int32)
    fill_x = jnp.zeros((h, w), jnp.int32)
    any_usable = jnp.zeros((h, w), bool)

    dflat = depth[..., 0].reshape(-1)

    for dx, dy in zip(_DIR_X, _DIR_Y):
        to_offs = _offset_table(dx, dy, steps)
        to_ox = jnp.array([o[0] for o in to_offs], jnp.int32)
        to_oy = jnp.array([o[1] for o in to_offs], jnp.int32)
        fr_ox, fr_oy = -to_ox, -to_oy

        fy, fx, f_ok = _first_event(vpad, fr_ox, fr_oy, steps, h, w, pad)
        ty, tx, t_ok = _first_event(vpad, to_ox, to_oy, steps, h, w, pad)
        ok = f_ok & t_ok
        d2 = ((tx - fx).astype(jnp.float32) ** 2
              + (ty - fy).astype(jnp.float32) ** 2)
        dist = jnp.sqrt(d2)
        # Farther endpoint (background) wins: if depth[from] < depth[to],
        # fill from `to` (utils/common.py:900-907).
        d_from = dflat[jnp.clip(fy * w + fx, 0, h * w - 1)]
        d_to = dflat[jnp.clip(ty * w + tx, 0, h * w - 1)]
        use_to = d_from < d_to
        cand_y = jnp.where(use_to, ty, fy)
        cand_x = jnp.where(use_to, tx, fx)

        better = ok & (dist < best_dist)  # strict '<' keeps earlier dirs on ties
        best_dist = jnp.where(better, dist, best_dist)
        fill_y = jnp.where(better, cand_y, fill_y)
        fill_x = jnp.where(better, cand_x, fill_x)
        any_usable = any_usable | better

    flat = jnp.clip(fill_y * w + fill_x, 0, h * w - 1)
    filled = image.reshape(-1, c)[flat]
    do_fill = (~valid) & any_usable
    return jnp.where(do_fill[..., None], filled, image)


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
