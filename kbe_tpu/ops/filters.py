"""Spatial filters: the reference's laplacian validity filter and median
filters, as vectorized XLA ops.

Reference spatial_filter, utils/common.py:394-426. Layout is NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# The reference's (asymmetric, anti-diagonal) 3x3 stencil — NOT a standard
# Laplacian. Entries from utils/common.py:401-405: k[0,1]=k[0,2]=-1,
# k[1,1]=4, k[1,0]=k[2,0]=-1.
_LAPLACIAN_3X3 = jnp.array(
    [
        [0.0, -1.0, -1.0],
        [-1.0, 4.0, 0.0],
        [-1.0, 0.0, 0.0],
    ],
    dtype=jnp.float32,
)


def _depthwise_conv3x3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 3x3 valid conv on NHWC input (cross-correlation, matching
    torch.nn.functional.conv2d)."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], (3, 3, 1, c))
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def laplacian_filter(x: jax.Array) -> jax.Array:
    """Replicate-padded 'laplacian' filter (utils/common.py:397-409).

    ``x``: (B, H, W, C) -> same shape.
    """
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return _depthwise_conv3x3(padded, _LAPLACIAN_3X3)


def median_filter(x: jax.Array, size: int) -> jax.Array:
    """Reflect-padded size x size median filter (utils/common.py:411-421).

    ``size`` must be odd (the reference uses 3 and 5). torch.median on an odd
    window equals the middle order statistic, so we sort the unfolded window
    and take index (size*size - 1) // 2.

    ``x``: (B, H, W, C) -> same shape.
    """
    if size % 2 != 1:
        raise ValueError("median_filter size must be odd")
    pad = size // 2
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")
    b, h, w, c = x.shape
    # Unfold the window into a trailing taps axis via static rolls — XLA
    # fuses these into a single gather-free loop; windows are tiny (9/25).
    taps = []
    for dy in range(size):
        for dx in range(size):
            taps.append(
                lax.dynamic_slice(padded, (0, dy, dx, 0), (b, h, w, c)))
    stacked = jnp.stack(taps, axis=-1)
    ordered = jnp.sort(stacked, axis=-1)
    return ordered[..., (size * size - 1) // 2]


def median_filter_binary(x: jax.Array, size: int) -> jax.Array:
    """``median_filter`` specialized to BINARY (exactly 0.0/1.0) inputs.

    The median of an odd window of 0/1 values is the majority vote:
    1 iff at least (size^2 + 1) / 2 of the taps are 1. A separable
    reflect-padded box sum (2*size adds, exact in f32 for sums <= 25)
    replaces the 25-tap sort — the sort costs ~27 ms at 1024^2 on v5e,
    the box sum is fused elementwise. Bit-identical to
    ``median_filter(x, size)`` whenever every element of ``x`` is 0 or 1
    (golden-tested in tests/test_ops.py).

    ``x``: (B, H, W, C) -> same shape, values in {0.0, 1.0}.
    """
    if size % 2 != 1:
        raise ValueError("median_filter_binary size must be odd")
    pad = size // 2
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")
    b, h, w, c = x.shape
    rows = jnp.zeros((b, h, w + 2 * pad, c), padded.dtype)
    for dy in range(size):
        rows = rows + lax.dynamic_slice(padded, (0, dy, 0, 0),
                                        (b, h, w + 2 * pad, c))
    total = jnp.zeros((b, h, w, c), padded.dtype)
    for dx in range(size):
        total = total + lax.dynamic_slice(rows, (0, 0, dx, 0), (b, h, w, c))
    majority = (size * size) // 2 + 0.5  # 12.5 for 5x5: sum >= 13 wins
    return (total > majority).astype(x.dtype)


def spatial_filter(x: jax.Array, kind: str) -> jax.Array:
    """Dispatch mirroring the reference's string-typed API
    (utils/common.py:394)."""
    if kind == "laplacian":
        return laplacian_filter(x)
    if kind == "median-3":
        return median_filter(x, 3)
    if kind == "median-5":
        return median_filter(x, 5)
    raise ValueError(f"unknown spatial filter {kind!r}")


def validity_mask(disparity: jax.Array, threshold: float = 0.03) -> jax.Array:
    """Laplacian-smoothness validity mask.

    ``(|laplacian(disp / disp.max())| < threshold)`` as float — marks pixels
    whose disparity is locally smooth; used to drop depth-discontinuity
    points before splatting. Reference utils/common.py:28,70,
    models/pointcloud_inpainting.py:193.

    ``disparity``: (B, H, W, 1) -> same shape, values in {0.0, 1.0}.
    """
    peak = jnp.max(disparity, axis=(1, 2, 3), keepdims=True)
    lap = laplacian_filter(disparity / peak)
    return (jnp.abs(lap) < threshold).astype(disparity.dtype)
