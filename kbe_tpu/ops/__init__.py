"""L0/L1 — geometry, filters, and point-cloud rendering ops.

TPU-native replacements for the reference's CUDA kernel layer
(reference utils/common.py:267-937). Everything here is pure jnp / Pallas,
deterministic, and jit/vmap friendly.
"""

from kbe_tpu.ops.geometry import (
    depth_range,
    depth_to_points,
    disparity_to_depth,
    pixel_rays,
    project_points,
    solve_shift,
)
from kbe_tpu.ops.filters import (
    laplacian_filter,
    median_filter,
    median_filter_binary,
    spatial_filter,
    validity_mask,
)
from kbe_tpu.ops.splat import render_pointcloud
from kbe_tpu.ops.discfill import fill_disocclusion
from kbe_tpu.ops.visibility import generate_mask
from kbe_tpu.ops.resize import (
    crop_rect_subpix,
    resize_bilinear,
    resize_to_max,
)

__all__ = [
    "depth_range",
    "depth_to_points",
    "disparity_to_depth",
    "pixel_rays",
    "project_points",
    "solve_shift",
    "laplacian_filter",
    "median_filter",
    "median_filter_binary",
    "spatial_filter",
    "validity_mask",
    "render_pointcloud",
    "fill_disocclusion",
    "generate_mask",
    "crop_rect_subpix",
    "resize_bilinear",
    "resize_to_max",
]
