"""Camera geometry: unprojection, projection, shift solving, depth ranges.

Pure-jnp equivalents of the reference's geometry helpers:
  - depth_to_points      <- reference utils/common.py:382-392
  - project_points       <- the in-kernel ray/plane intersection,
                            reference utils/common.py:447-468 (which reduces
                            to the pinhole projection u = x*f/z + W/2 - 0.5)
  - solve_shift          <- process_shift, reference utils/common.py:83-111
  - depth_range          <- the cv2.minMaxLoc call, reference
                            utils/pipeline.py:96 (computed in-graph here so
                            the whole effect stays on-device)

Conventions: images are NHWC float32; depth maps are (B, H, W); point clouds
are structure-of-arrays (B, N) triples or stacked (B, N, 3) with N static.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PointCloud(NamedTuple):
    """A fixed-capacity point cloud with per-point payload channels.

    ``xyz``:  (B, N, 3) camera-space positions.
    ``data``: (B, N, C) payload (color, disparity, depth, context, ...).
    ``valid``: (B, N) float mask; invalid points must never render. The
    reference instead grows its cloud dynamically via ``torch.cat``
    (utils/common.py:77-80); XLA requires static shapes, so we pre-allocate
    capacity and mask.
    """

    xyz: jax.Array
    data: jax.Array
    valid: jax.Array


def pixel_rays(height: int, width: int, focal) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel (x/z, y/z) ray directions for a centered pinhole camera.

    Matches the linspace grids of reference utils/common.py:383-388:
    horizontal coordinate runs (-W/2 + 0.5) .. (W/2 - 0.5) over W pixels,
    scaled by 1/focal.
    """
    xs = (jnp.arange(width, dtype=jnp.float32) - (0.5 * width) + 0.5) / focal
    ys = (jnp.arange(height, dtype=jnp.float32) - (0.5 * height) + 0.5) / focal
    return jnp.broadcast_to(xs[None, :], (height, width)), jnp.broadcast_to(
        ys[:, None], (height, width))


def depth_to_points(depth: jax.Array, focal) -> jax.Array:
    """Unproject a depth map to camera-space points.

    ``depth``: (..., H, W) -> returns (..., H, W, 3) with
    x = u * z / f, y = v * z / f, z = depth, where (u, v) are centered
    pixel coordinates. Reference utils/common.py:382-392.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    rx, ry = pixel_rays(h, w, focal)
    return jnp.stack([depth * rx, depth * ry, depth], axis=-1)


def disparity_to_depth(disparity: jax.Array, focal, baseline) -> jax.Array:
    """depth = focal * baseline / (disparity + 1e-7).

    Reference utils/pipeline.py:84, utils/common.py:27,69.
    """
    return (focal * baseline) / (disparity + 1e-7)


def project_points(xyz: jax.Array, height: int, width: int, focal):
    """Project camera-space points onto the image plane at z = focal.

    Returns ``(u, v, ok)`` where (u, v) are continuous pixel coordinates and
    ``ok`` marks points with z >= 0.001 (the reference kernels early-out on
    z < 0.001, utils/common.py:453-455; the |denominator| < 0.001 guard at
    utils/common.py:461-463 is subsumed for z > 0).

    The reference intersects the line point->origin with the plane
    z = focal (utils/common.py:447-465), which reduces to the pinhole map
    u = x * f / z + W/2 - 0.5.
    """
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    ok = z >= 0.001
    safe_z = jnp.where(ok, z, 1.0)
    u = x * focal / safe_z + (0.5 * width) - 0.5
    v = y * focal / safe_z + (0.5 * height) - 0.5
    return u, v, ok


def splat_error(z: jax.Array, focal, baseline) -> jax.Array:
    """The z-buffer key: 1e6 - focal*baseline/(z + 1e-7).

    Monotone increasing in z, so smaller error == closer point.
    Reference utils/common.py:470.
    """
    return 1000000.0 - (focal * baseline) / (z + 1e-7)


def depth_range(depth: jax.Array, margin: int = 128):
    """Min depth and its (u, v) location over a center-cropped depth map.

    In-graph replacement for ``cv2.minMaxLoc(depth[128:-128, 128:-128])``
    (reference utils/pipeline.py:96). NOTE the reference keeps the returned
    location in *cropped* coordinates (it never adds the margin back before
    using it in process_shift, utils/common.py:89-90); we reproduce that.
    cv2.minMaxLoc returns the first minimum in row-major scan order, which is
    exactly ``jnp.argmin`` semantics.

    ``depth``: (H, W). Returns (min_depth, min_u, min_v) as f32 scalars.
    """
    # Clamp so the crop stays non-empty for small images (the reference
    # would index an empty slice below 257 px).
    margin = min(margin, (depth.shape[0] - 1) // 2, (depth.shape[1] - 1) // 2)
    if margin > 0:
        cropped = depth[margin:-margin, margin:-margin]
    else:
        cropped = depth
    flat = cropped.reshape(-1)
    idx = jnp.argmin(flat)
    w = cropped.shape[1]
    min_v = (idx // w).astype(jnp.float32)
    min_u = (idx % w).astype(jnp.float32)
    return flat[idx], min_u, min_v


def solve_shift(
    shift_u,
    shift_v,
    depth_from,
    depth_to,
    closest_depth,
    closest_u,
    closest_v,
    width: int,
    height: int,
    focal,
) -> jax.Array:
    """Convert a desired screen-space shift of the nearest-depth anchor pixel
    into a metric camera-space translation.

    Reference process_shift, utils/common.py:83-102: the anchor pixel
    (closest_u, closest_v) at depth ``closest_depth + (depth_to - depth_from)``
    should move by (shift_u, shift_v) pixels; z shifts by
    ``depth_to - depth_from``.

    Returns shift vector (3,) float32.
    """
    closest = closest_depth + (depth_to - depth_from)
    to_u = closest_u + shift_u
    to_v = closest_v + shift_v
    from_x = (closest_u - (width / 2.0)) * closest / focal
    from_y = (closest_v - (height / 2.0)) * closest / focal
    to_x = (to_u - (width / 2.0)) * closest / focal
    to_y = (to_v - (height / 2.0)) * closest / focal
    return jnp.stack([
        jnp.asarray(from_x - to_x, jnp.float32),
        jnp.asarray(from_y - to_y, jnp.float32),
        jnp.asarray(depth_to - depth_from, jnp.float32),
    ])


def apply_shift(xyz: jax.Array, shift: jax.Array) -> jax.Array:
    """Perspective-correct shift application.

    Reference utils/common.py:104-109: x and y are first rescaled by
    z_new / z_old — a no-op when xyz is untouched (z_new == z_old) but kept
    for exactness — then the metric shift is added.

    ``xyz``: (..., 3); ``shift``: (3,).
    """
    # The reference multiplies x, y by z/z (identically 1 up to the 1e-7
    # epsilon); we keep the epsilon to match bit-for-bit behaviour on z == 0.
    z = xyz[..., 2:3]
    scale = z / (z + 1e-7)
    scaled = jnp.concatenate([xyz[..., 0:2] * scale, xyz[..., 2:3]], axis=-1)
    return scaled + shift


def interpolate_window(src, dst, step):
    """Linear interpolation of crop windows at ``step`` in [0, 1].

    Reference utils/common.py:222-236. Returns (center_u, center_v,
    crop_w, crop_h) as scalars (traced or static).
    """
    t_from = 1.0 - step
    t_to = step
    cu = t_from * src.center_u + t_to * dst.center_u
    cv = t_from * src.center_v + t_to * dst.center_v
    cw = t_from * src.crop_width + t_to * dst.crop_width
    ch = t_from * src.crop_height + t_to * dst.crop_height
    return cu, cv, cw, ch
