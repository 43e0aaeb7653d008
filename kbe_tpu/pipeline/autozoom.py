"""Auto-zoom: search the start-window shift maximizing render coverage.

Equivalent of reference ``process_autozoom`` (utils/common.py:114-170): a
16x16 grid of candidate (shiftU, shiftV) start offsets is scored by the
number of covered pixels after splatting the raw cloud at that shift; out-
of-bounds candidates are skipped. The reference loops on the host with one
CUDA render per candidate; here all candidates are scored in one jitted
``lax.map`` sweep. (Not reachable from the reference CLI either —
kept for API parity.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.config import CameraConfig, ZoomWindow
from kbe_tpu.ops.geometry import solve_shift
from kbe_tpu.ops.splat import render_pointcloud


def autozoom(
    points: jax.Array,
    image: jax.Array,
    window: ZoomWindow,
    zoom_factor: float,
    shift_range: float,
    anchor,
    camera: CameraConfig = CameraConfig(),
    grid: int = 16,
    batch: int = 8,
) -> ZoomWindow:
    """Find the best end window for a ``zoom_factor`` move.

    Args:
      points: (1, H*W, 3) raw cloud.
      image: (1, H, W, 3).
      window: the start window (objectFrom).
      shift_range: +- search extent in pixels (``dblShift``).
      anchor: (min_depth, min_u, min_v) from ops.geometry.depth_range.

    Returns the chosen end ZoomWindow (utils/common.py:164-169).
    """
    h, w = image.shape[1], image.shape[2]
    crop_w = window.crop_width / zoom_factor
    crop_h = window.crop_height / zoom_factor
    dmin, du, dv = anchor
    depth_from = dmin
    depth_to = dmin * (crop_w / window.crop_width)

    shifts = np.linspace(-shift_range, shift_range, grid, dtype=np.float32)
    su, sv = np.meshgrid(shifts, shifts, indexing="xy")
    su, sv = su.reshape(-1), sv.reshape(-1)
    ok = ((window.center_u + su >= crop_w / 2.0)
          & (window.center_u + su <= w - crop_w / 2.0)
          & (window.center_v + sv >= crop_h / 2.0)
          & (window.center_v + sv <= h - crop_h / 2.0))

    data = image.reshape(1, -1, 3)

    def score(args):
        s_u, s_v = args
        shift = solve_shift(s_u, s_v, depth_from, depth_to, dmin, du, dv,
                            w, h, camera.focal)
        _, existing = render_pointcloud(points + shift, data, h, w,
                                        camera.focal, camera.baseline)
        return jnp.sum((existing > 0.0).astype(jnp.float32))

    scores = jax.lax.map(score, (jnp.asarray(su), jnp.asarray(sv)),
                         batch_size=batch)
    scores = jnp.where(jnp.asarray(ok), scores, -1.0)
    best = int(np.asarray(jnp.argmax(scores)))

    return ZoomWindow(
        center_u=window.center_u + float(su[best]),
        center_v=window.center_v + float(sv[best]),
        crop_width=int(round(window.crop_width / zoom_factor)),
        crop_height=int(round(window.crop_height / zoom_factor)),
    )
