"""Per-point visibility masks for training-time view synthesis.

Replaces the reference's ``generate_mask`` CUDA kernel (reference
utils/common.py:689-830): shift the pixel-grid point cloud by a camera
shift, z-buffer it, and mark each *point* (not pixel) visible iff it wins
the z-buffer at its target pixel. The result, reshaped to the image grid
(each point comes from one pixel), is the disocclusion mask used by the
supervised inpainting trainer (training/train_inpaint.py:133).

The CUDA original resolves same-pixel winners with a racy
``atomicExch`` last-writer buffer (utils/common.py:758) and has a quirk
where point id 0 can never be unmarked (``pid > 0`` guard). Deterministic
TPU formulation: the winner at a pixel is the minimum-error point, ties
broken by the smallest point index (scatter-min over packed keys). This is
one of the schedules the racy kernel can produce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kbe_tpu.ops.filters import median_filter_binary
from kbe_tpu.ops.geometry import project_points, splat_error
from kbe_tpu.ops.splat import _flat_index, _neighbor_weights

_ZFAR = 1000000.0


def _mask_single(xyz, height: int, width: int, focal, baseline):
    u, v, ok = project_points(xyz, height, width, focal)
    err = splat_error(xyz[..., 2], focal, baseline)
    xi, yi, w = _neighbor_weights(u, v)
    best = jnp.argmax(w, axis=-1)
    take = lambda a: jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]
    flat, _ = _flat_index(take(xi), take(yi), height, width, ok)

    n = xyz.shape[0]
    hw = height * width
    zee = jnp.full((hw + 1,), _ZFAR, jnp.float32)
    zee = zee.at[flat].min(err, mode="drop")
    # Strict-improver condition of the CUDA kernel: a point only ever marks
    # itself if its error beat the buffer (utils/common.py:755); with the
    # z-far init that is err < 1e6, plus being the final minimum.
    is_min = err <= zee[jnp.clip(flat, 0, hw)]
    ids = jnp.full((hw + 1,), n, jnp.int32)
    pt = jnp.arange(n, dtype=jnp.int32)
    ids = ids.at[jnp.where(is_min, flat, hw)].min(pt, mode="drop")
    visible = (ids[jnp.clip(flat, 0, hw)] == pt) & (flat < hw)
    return visible.astype(jnp.float32)


def generate_mask(
    xyz: jax.Array,
    shift: jax.Array,
    height: int,
    width: int,
    focal,
    baseline,
) -> jax.Array:
    """Visibility mask of the pixel-grid cloud after a camera shift.

    Args:
      xyz:   (B, H*W, 3) unshifted pixel-grid points (one per pixel,
             row-major).
      shift: (B, 3) camera shift (added inside, as utils/common.py:690).
    Returns (B, H, W, 1) float mask, median-5 filtered
    (utils/common.py:829).
    """
    shifted = xyz + shift[:, None, :]
    masks = jax.vmap(
        lambda p: _mask_single(p, height, width, focal, baseline))(shifted)
    masks = masks.reshape(-1, height, width, 1)
    # binary mask: the majority-vote fast path is bit-identical
    return median_filter_binary(masks, 5)
