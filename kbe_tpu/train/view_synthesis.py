"""Training-time novel-view synthesis: per-batch camera shifts, visibility
masks, and warped renders.

In-graph equivalents of reference utils/utils.py:221-300 (get_tensor_shift,
get_masks) — the reference loops per batch item on the host, calls
cv2.minMaxLoc for the depth anchor and launches the CUDA generate_mask /
render kernels; here the whole thing is vmapped and jit-compiled.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kbe_tpu.config import CameraConfig
from kbe_tpu.ops.filters import validity_mask
from kbe_tpu.ops.geometry import depth_range, depth_to_points, solve_shift
from kbe_tpu.ops.splat import render_pointcloud
from kbe_tpu.ops.visibility import generate_mask


def batch_full_shift(zoom: Dict[str, jax.Array], depth: jax.Array,
                     camera: CameraConfig,
                     margin: int = 128) -> jax.Array:
    """Full-step (step=1) camera shift per batch item.

    ``zoom``: dict with (B,) arrays 'from_cu', 'from_cv', 'from_cw',
    'from_ch', 'to_cu', 'to_cv', 'to_cw', 'to_ch' (the random crop windows
    from get_random_zoom, utils/utils.py:341-368).
    ``depth``: (B, H, W, 1). Returns (B, 3) shifts.
    Reference get_tensor_shift, utils/utils.py:221-245.
    """
    b, h, w = depth.shape[0], depth.shape[1], depth.shape[2]

    def per_item(d, fcu, fcv, fcw, tcu, tcv, tcw, tch):
        dmin, du, dv = depth_range(d[..., 0], margin)
        # step = 1: the interpolated window IS the 'to' window
        shift_u = tcu - w / 2.0
        shift_v = tcv - h / 2.0
        depth_from = dmin
        depth_to = dmin * (tcw / jnp.maximum(fcw, tcw))
        return solve_shift(shift_u, shift_v, depth_from, depth_to, dmin, du,
                           dv, w, h, camera.focal)

    return jax.vmap(per_item)(depth, zoom["from_cu"], zoom["from_cv"],
                              zoom["from_cw"], zoom["to_cu"], zoom["to_cv"],
                              zoom["to_cw"], zoom["to_ch"])


def _valid_points(disparity: jax.Array, depth: jax.Array, camera, threshold):
    """Pixel-grid cloud with depth-discontinuity points zeroed
    (utils/utils.py:258-259)."""
    b, h, w = disparity.shape[0], disparity.shape[1], disparity.shape[2]
    valid = validity_mask(disparity, threshold)
    pts = depth_to_points((depth * valid)[..., 0], camera.focal)
    return pts.reshape(b, h * w, 3)


def masks_a_from_b(
    image: jax.Array,
    disparity: jax.Array,
    depth: jax.Array,
    zoom: Dict[str, jax.Array],
    camera: CameraConfig,
    validity_threshold: float = 0.03,
) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel visibility mask of view A as seen from view B
    (get_masks AFromB=True, utils/utils.py:284-288).

    Returns (masks (B, H, W, 1), shift (B, 3)).
    """
    h, w = image.shape[1], image.shape[2]
    shift = batch_full_shift(zoom, depth, camera)
    pts = _valid_points(disparity, depth, camera, validity_threshold)
    masks = generate_mask(pts, shift, h, w, camera.focal, camera.baseline)
    return masks, shift


def render_view_b(
    image: jax.Array,
    disparity: jax.Array,
    depth: jax.Array,
    zoom: Dict[str, jax.Array],
    camera: CameraConfig,
    context: Optional[jax.Array] = None,
    validity_threshold: float = 0.03,
):
    """Warp view A to view B by splatting (get_masks AFromB=False,
    utils/utils.py:289-300).

    ``image``/``disparity`` may be in normalized space (the adversarial
    trainer passes normalized payloads, train_inpaint.py:198-204).
    Returns (render, masks, points, shift).
    """
    b, h, w = image.shape[0], image.shape[1], image.shape[2]
    shift = batch_full_shift(zoom, depth, camera)
    pts = _valid_points(disparity, depth, camera, validity_threshold)
    payload = [image.reshape(b, h * w, 3), disparity.reshape(b, h * w, 1)]
    if context is not None:
        payload.append(context.reshape(b, h * w, -1))
    data = jnp.concatenate(payload, axis=-1)
    render, weight = render_pointcloud(pts + shift[:, None, :], data, h, w,
                                       camera.focal, camera.baseline)
    masks = (weight > 0.0).astype(jnp.float32)
    return render, masks, pts, shift
