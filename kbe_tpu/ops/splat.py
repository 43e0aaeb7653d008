"""Z-buffered forward point splatting — deterministic XLA formulation.

Replaces the reference's three CUDA kernels (reference utils/common.py:
``kernel_pointrender_updateZee`` :434-521, ``kernel_pointrender_updateDegrid``
:524-582, ``kernel_pointrender_updateOutput`` :585-686). TPUs have no float
atomics, and the CUDA originals are racy by design (atomicMin/atomicAdd
interleavings); here each pass is a deterministic XLA scatter:

  pass 1 (zee):        per point, pick the ONE neighbor pixel with the
                       largest bilinear weight and scatter-min the depth
                       "error" key into the z-buffer.
  pass 2 (degrid):     close single-pixel z-buffer holes by averaging
                       opposing neighbor pairs that are both >= 1.0 closer.
                       A pure 3x3 stencil (the CUDA version reads and writes
                       the buffer concurrently; we read the pre-pass buffer,
                       which is one of the racy schedules and deterministic).
  pass 3 (accumulate): per point, scatter-add bilinear-weighted payload into
                       all four neighbor pixels whose z-buffer it is within
                       +1.0 of. An all-ones weight channel is appended and
                       divided out at the end (utils/common.py:429,686).

Scatters with out-of-bounds indices are routed to a dead slot and dropped,
mirroring the in-bounds guards of the CUDA kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kbe_tpu.ops.geometry import project_points, splat_error

_ZFAR = 1000000.0


def _neighbor_weights(u, v):
    """Corner indices + bilinear weights for the 4 pixels around (u, v).

    Order NW, NE, SW, SE — the reference's tie-break priority
    (utils/common.py:486-506 if/elif chain takes the first >= max).
    """
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    # Weights as in utils/common.py:481-484 (expressed with corner coords).
    w_nw = (x0 + 1.0 - u) * (y0 + 1.0 - v)
    w_ne = (u - x0) * (y0 + 1.0 - v)
    w_sw = (x0 + 1.0 - u) * (v - y0)
    w_se = (u - x0) * (v - y0)
    xi = jnp.stack([x0, x0 + 1.0, x0, x0 + 1.0], axis=-1).astype(jnp.int32)
    yi = jnp.stack([y0, y0, y0 + 1.0, y0 + 1.0], axis=-1).astype(jnp.int32)
    w = jnp.stack([w_nw, w_ne, w_sw, w_se], axis=-1)
    return xi, yi, w


def _flat_index(xi, yi, height, width, ok):
    """Row-major flat pixel index; out-of-bounds/invalid -> dead slot H*W."""
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & ok
    flat = yi * width + xi
    return jnp.where(inb, flat, height * width), inb


def _zee_pass(u, v, err, ok, height: int, width: int) -> jax.Array:
    """Scatter-min z-buffer build (kernel_pointrender_updateZee)."""
    xi, yi, w = _neighbor_weights(u, v)
    best = jnp.argmax(w, axis=-1)  # first max wins == CUDA if/elif order
    take = lambda a: jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]
    flat, _ = _flat_index(take(xi), take(yi), height, width, ok)
    zee = jnp.full((height * width + 1,), _ZFAR, dtype=jnp.float32)
    zee = zee.at[flat].min(err, mode="drop")
    return zee[:-1].reshape(height, width)


def _degrid_pass(zee: jax.Array) -> jax.Array:
    """Opposing-pair hole closing (kernel_pointrender_updateDegrid).

    For each of 4 opposing direction pairs (E/W, S/N, SE/NW, NE/SW): if both
    opposing neighbors are >= 1.0 closer than the center, their values join
    an average that (if any pair qualified) replaces the center via min.
    Out-of-bounds neighbors disqualify their pair (utils/common.py:548-553),
    which padding with +inf reproduces.
    """
    h, w = zee.shape
    inf = jnp.float32(jnp.inf)
    p = jnp.pad(zee, ((1, 1), (1, 1)), constant_values=inf)

    def nb(dy, dx):
        return p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    total = jnp.zeros_like(zee)
    count = jnp.zeros_like(zee)
    # Direction table from utils/common.py:539-540: (dx, dy) pairs.
    for dx, dy in ((1, 0), (0, 1), (1, 1), (1, -1)):
        one = nb(dy, dx)
        two = nb(-dy, -dx)
        good = (zee >= one + 1.0) & (zee >= two + 1.0)
        # +inf neighbors can never satisfy `zee >= inf + 1`, so OOB pairs
        # are naturally excluded; avoid inf*0 NaNs via where.
        total = total + jnp.where(good, one + two, 0.0)
        count = count + jnp.where(good, 2.0, 0.0)
    avg = total / jnp.maximum(count, 1.0)
    return jnp.where(count > 0.0, jnp.minimum(zee, avg), zee)


def _accumulate_pass(u, v, err, ok, data, zee, height: int, width: int):
    """Weighted 4-neighbor scatter-add (kernel_pointrender_updateOutput).

    ``data``: (N, C) payload WITHOUT the ones channel; it is appended here.
    Returns (C+1, H, W) raw accumulation.
    """
    n, c = data.shape
    xi, yi, w = _neighbor_weights(u, v)  # (N,4)
    flat, inb = _flat_index(xi, yi, height, width, ok[..., None])
    zflat = zee.reshape(-1)
    # Visibility test per neighbor: err <= zee[pix] + 1.0
    # (utils/common.py:639 etc.). Gather with OOB -> dead value.
    zn = jnp.where(inb, zflat[jnp.clip(flat, 0, height * width - 1)], -jnp.inf)
    vis = inb & (err[..., None] <= zn + 1.0)
    weights = jnp.where(vis, w, 0.0)  # (N, 4)

    payload = jnp.concatenate([data, jnp.ones((n, 1), data.dtype)], axis=-1)
    idx = jnp.where(vis, flat, height * width).reshape(-1)  # (4N,)
    vals = (weights[..., None] * payload[:, None, :]).reshape(-1, c + 1)
    out = jnp.zeros((height * width + 1, c + 1), dtype=jnp.float32)
    out = out.at[idx].add(vals, mode="drop")
    return out[:-1].T.reshape(c + 1, height, width)


def _render_single(xyz, data, valid, height: int, width: int, focal,
                   baseline):
    u, v, ok = project_points(xyz, height, width, focal)
    ok = ok & (valid > 0.0)
    err = splat_error(xyz[..., 2], focal, baseline)
    zee = _zee_pass(u, v, err, ok, height, width)
    zee = _degrid_pass(zee)
    acc = _accumulate_pass(u, v, err, ok, data, zee, height, width)
    rendered = acc[:-1] / (acc[-1:] + 1e-7)
    existing = acc[-1]
    # -> NHWC
    return jnp.transpose(rendered, (1, 2, 0)), existing[..., None]


# Renderer implementation used when ``method`` is not given. Measured on a
# v5e: the scatter formulation was ~2x faster than the (since-deleted)
# sort-based one at all tested sizes (both bound by the chip's
# irregular-memory throughput); the production fast path is the posed
# banded Pallas kernel (ops/splat_posed.py).
DEFAULT_SPLAT_METHOD = "scatter"


def render_pointcloud(
    xyz: jax.Array,
    data: jax.Array,
    height: int,
    width: int,
    focal,
    baseline,
    valid: jax.Array | None = None,
    method: str | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Render a point cloud into an image by z-buffered forward splatting.

    Args:
      xyz:   (B, N, 3) camera-space points.
      data:  (B, N, C) per-point payload (color, disparity/depth, context...).
      height, width: output raster size.
      focal, baseline: camera intrinsics (python floats or 0-d arrays).
      valid: optional (B, N) mask; masked points never render. (The
        reference's dynamic ``torch.cat`` cloud growth is replaced by
        fixed-capacity buffers + this mask.)

    Returns:
      (rendered, existing): (B, H, W, C) normalized render and (B, H, W, 1)
      accumulated splat weight ("existing" mask before thresholding).
      Reference utils/common.py:428-686.
    """
    if method is None:
        method = DEFAULT_SPLAT_METHOD
    if method != "scatter":
        raise ValueError(f"unknown splat method {method!r} (the sort-based "
                         "renderer was removed; use 'scatter')")
    if valid is None:
        valid = jnp.ones(xyz.shape[:2], dtype=xyz.dtype)
    fn = lambda p, d, m: _render_single(p, d, m, height, width, focal,
                                        baseline)
    return jax.vmap(fn)(xyz, data, valid)
