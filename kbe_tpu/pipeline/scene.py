"""Scene bootstrap helpers.

Equivalent of reference ``process_load`` (utils/common.py:16-45): an
alternative pipeline bootstrap that estimates + refines disparity for a
raw numpy image under a focal=512/baseline=40 camera, builds the validity-
masked point cloud, and returns everything later stages need. (The
reference keeps this beside, but unused by, its Pipeline class; provided
for API parity and as a light-weight entry for custom pipelines.)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.config import CameraConfig
from kbe_tpu.models import Disparity, Refine, Semantics
from kbe_tpu.ops.filters import validity_mask
from kbe_tpu.ops.geometry import (
    depth_range,
    depth_to_points,
    disparity_to_depth,
)
from kbe_tpu.ops.resize import resize_to_max

LOAD_CAMERA = CameraConfig(focal=512.0, baseline=40.0)  # common.py:17-18


def load_scene(params: Dict[str, Any], numpy_image: np.ndarray,
               camera: CameraConfig = LOAD_CAMERA,
               dtype=jnp.float32) -> Dict[str, jax.Array]:
    """image (H, W, 3) uint8/float -> scene dict (cloud, depth, anchor).

    Mirrors process_load: estimate -> refine -> normalize disparity to the
    baseline -> depth -> validity-masked points + unaltered points.
    ``params``: dict with 'semantics', 'disparity', 'refine' params.
    """
    img = jnp.asarray(numpy_image, jnp.float32)
    if img.max() > 1.5:
        img = img / 255.0
    image = img[None]
    h, w = image.shape[1], image.shape[2]

    sem_def = Semantics(dtype=dtype)
    disp_def = Disparity(dtype=dtype)
    refine_def = Refine(dtype=dtype)

    resized = resize_to_max(image, max(h, w) // 2)
    sem = sem_def.apply(params["semantics"], resized)
    disparity = disp_def.apply(params["disparity"], resized, sem)
    disparity = refine_def.apply(params["refine"], image, disparity)
    disparity = disparity / jnp.max(disparity) * camera.baseline

    depth = disparity_to_depth(disparity, camera.focal, camera.baseline)
    valid = validity_mask(disparity)
    points = depth_to_points((depth * valid)[..., 0], camera.focal)
    unaltered = depth_to_points(depth[..., 0], camera.focal)
    anchor = depth_range(depth[0, ..., 0], 128)

    return {
        "image": image,
        "disparity": disparity,
        "depth": depth,
        "points": points.reshape(1, h * w, 3),
        "unaltered_points": unaltered.reshape(1, h * w, 3),
        "anchor": anchor,
        "camera": camera,
    }
