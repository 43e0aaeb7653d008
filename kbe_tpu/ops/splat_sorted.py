"""Sort-based splat renderer — the TPU fast path.

Same semantics as ops/splat.py (the reference CUDA kernels,
utils/common.py:434-686) but built from TPU-parallel primitives instead of
conflicting scatters, which XLA serializes on TPU:

  1. expand each point into its 4 neighbor-pixel entries
  2. ONE ``lax.sort`` of all entries by (pixel id, z-key)
  3. z-buffer: after the sort, each pixel's minimum z-key sits at its
     segment HEAD — written out with a conflict-free (unique-index) scatter
  4. degrid: the dense 3x3 stencil, unchanged
  5. visibility: coherent gather of the degridded z-buffer per entry
  6. accumulate: exact segment sums computed scan-free — in-block f32
     cumsums (block magnitudes stay small => exact enough), segment-head
     positions recovered by scatter+gather, and cross-block spans combined
     through an f64 per-block running total (only blocks x channels
     elements, so the emulated f64 cost is negligible)

Everything is a sort, a reshaped cumsum, a gather, or a unique-index
scatter — all parallel on TPU, fully deterministic, and equivalent to the
scatter formulation (golden-tested against it and the numpy simulator).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from kbe_tpu.ops.geometry import project_points, splat_error
from kbe_tpu.ops.splat import _degrid_pass, _neighbor_weights

_ZFAR = 1000000.0
_BLOCK = 1024


def _two_sum(a, b):
    """Error-free f32 addition: returns (s, err) with a + b == s + err."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _ds_add(ah, al, bh, bl):
    """Double-single addition (each operand = hi + lo in f32)."""
    sh, se = _two_sum(ah, bh)
    lo = al + bl + se
    h = sh + lo
    l = lo - (h - sh)
    return h, l


def _ds_cumsum(x):
    """Double-single cumulative sum along axis 0 of a small (n, C) array —
    ~f64-accurate prefixes with pure f32 hardware (jax x64 is disabled, so
    jnp.float64 would silently downcast)."""

    def combine(a, b):
        return _ds_add(a[0], a[1], b[0], b[1])

    hi, lo = lax.associative_scan(combine, (x, jnp.zeros_like(x)))
    return hi, lo


def _segment_sums_at_tails(vals, head):
    """Exact per-segment sums of ``vals`` (E, C) over contiguous sorted
    segments (``head`` flags start-of-segment). Returns (E, C) holding the
    running per-segment prefix; at each segment TAIL this is the segment
    total.

    Scan-free at entry granularity: in-block f32 cumsums (block sums stay
    small, so f32 is effectively exact) combined across blocks through a
    double-single block-prefix scan over only E/_BLOCK elements.
    """
    e, c = vals.shape
    assert e % _BLOCK == 0
    nb = e // _BLOCK
    blocked = vals.reshape(nb, _BLOCK, c)
    cs = jnp.cumsum(blocked, axis=1)  # in-block inclusive prefix (f32)
    btotal = cs[:, -1, :]  # (nb, C)
    # exclusive double-single running total of whole blocks before block b
    ih, il = _ds_cumsum(btotal)
    zero = jnp.zeros((1, c), jnp.float32)
    bh = jnp.concatenate([zero, ih[:-1]], axis=0)
    bl = jnp.concatenate([zero, il[:-1]], axis=0)

    flat_cs = cs.reshape(e, c)
    idx = lax.broadcasted_iota(jnp.int32, (e, 1), 0)[:, 0]

    def gprefix(positions, local):
        """Global inclusive prefix (hi, lo) at entry ``positions`` given
        their in-block inclusive cumsum ``local``."""
        b = positions // _BLOCK
        return _ds_add(bh[b], bl[b], local, jnp.zeros_like(local))

    # Head position per entry: the largest head index <= i (cummax).
    head_idx = jnp.where(head, idx, -1)
    hpos = lax.cummax(head_idx)

    ph, pl = gprefix(idx, flat_cs)
    prev = jnp.maximum(hpos - 1, 0)
    qh, ql = gprefix(prev, flat_cs[prev])
    has_prev = (hpos > 0)[:, None]
    qh = jnp.where(has_prev, qh, 0.0)
    ql = jnp.where(has_prev, ql, 0.0)
    th, tl = _ds_add(ph, pl, -qh, -ql)
    return th + tl


def _render_single_sorted(xyz, data, valid, height: int, width: int, focal,
                          baseline):
    n, c = data.shape
    hw = height * width
    u, v, ok = project_points(xyz, height, width, focal)
    ok = ok & (valid > 0.0)
    err = splat_error(xyz[..., 2], focal, baseline)

    xi, yi, w = _neighbor_weights(u, v)  # (N, 4)
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) \
        & ok[..., None]
    pix = jnp.where(inb, yi * width + xi, hw).astype(jnp.int32)  # (N, 4)
    best = jnp.argmax(w, axis=-1)
    chosen = (lax.broadcasted_iota(jnp.int32, (n, 4), 1)
              == best[..., None])

    # flatten + pad entries to a block multiple (dead entries -> pix = hw)
    e = n * 4
    pad = (-e) % _BLOCK
    def flat(x, fill):
        x = x.reshape(-1)
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    e_pix = flat(pix, hw)
    e_w = flat(jnp.where(inb, w, 0.0).astype(jnp.float32), 0.0)
    e_zkey = flat(jnp.where(chosen & inb, err[..., None], _ZFAR), _ZFAR)
    e_err = flat(jnp.broadcast_to(err[..., None], (n, 4)), _ZFAR)
    e_src = flat(jnp.broadcast_to(
        lax.broadcasted_iota(jnp.int32, (n, 4), 0), (n, 4)), 0)

    # ONE sort by (pixel, z-key): segment heads carry the pixel minimum.
    s_pix, s_zkey, s_err, s_w, s_src = lax.sort(
        (e_pix, e_zkey, e_err, e_w, e_src), num_keys=2)

    head = jnp.concatenate(
        [jnp.ones((1,), bool), s_pix[1:] != s_pix[:-1]])
    tail = jnp.concatenate(
        [s_pix[:-1] != s_pix[1:], jnp.ones((1,), bool)])
    live = s_pix < hw

    # ---- z-buffer: head z-keys, conflict-free scatter
    hpix = jnp.where(head & live, s_pix, hw)
    zee = jnp.full((hw + 1,), _ZFAR, jnp.float32)
    zee = zee.at[hpix].set(s_zkey, mode="drop", unique_indices=True)
    zee_img = _degrid_pass(zee[:hw].reshape(height, width))
    zflat = zee_img.reshape(-1)

    # ---- visibility + weighted payload, exact segment sums at tails
    z_at = zflat[jnp.clip(s_pix, 0, hw - 1)]
    vis = live & (s_err <= z_at + 1.0)
    w_eff = jnp.where(vis, s_w, 0.0)
    payload = jnp.concatenate([data, jnp.ones((n, 1), data.dtype)], axis=-1)
    vals = payload[s_src] * w_eff[:, None]  # (E, C+1)
    sums = _segment_sums_at_tails(vals, head)

    tpix = jnp.where(tail & live, s_pix, hw)
    acc = jnp.zeros((hw + 1, c + 1), jnp.float32)
    acc = acc.at[tpix].set(sums, mode="drop", unique_indices=True)
    acc = acc[:hw]
    # Segment sums of all-invisible segments carry ~1e-6 float residue that
    # the 1e-7 normalization epsilon would amplify; snap empty pixels to the
    # scatter renderer's exact zeros.
    acc = jnp.where(acc[:, c:] > 1e-6, acc, 0.0)

    rendered = acc[:, :c] / (acc[:, c:] + 1e-7)
    existing = acc[:, c].reshape(height, width, 1)
    return rendered.reshape(height, width, c), existing


def render_pointcloud_sorted(
    xyz: jax.Array,
    data: jax.Array,
    height: int,
    width: int,
    focal,
    baseline,
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.splat.render_pointcloud (same semantics,
    sort-based execution)."""
    if valid is None:
        valid = jnp.ones(xyz.shape[:2], dtype=xyz.dtype)
    fn = lambda p, d, m: _render_single_sorted(p, d, m, height, width,
                                               focal, baseline)
    return jax.vmap(fn)(xyz, data, valid)
