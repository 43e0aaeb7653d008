"""The point-cloud inpainting flow around the Inpaint network.

Functional equivalent of ``Inpaint.pointcloud_inpainting`` + the cloud
extension step (reference models/pointcloud_inpainting.py:185-213 and
utils/common.py:47-81): render the shifted cloud with a 68-channel
(image, disparity, context) payload, median-filter the coverage mask, feed
the masked render through the inpainting grid-net, then unproject the
inpainted pixels and un-shift them back into the global cloud frame.

The reference mutates module state for the normalization stats and grows
the cloud with ``torch.cat``; here stats are threaded explicitly and the
cloud is a fixed-capacity buffer (see ops/geometry.PointCloud).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kbe_tpu.config import CameraConfig
from kbe_tpu.ops.filters import median_filter_binary, validity_mask
from kbe_tpu.ops.layout import relayout
from kbe_tpu.ops.geometry import depth_to_points, disparity_to_depth
from kbe_tpu.ops.splat_routed import render_grids_fast
from kbe_tpu.models.layers import denormalize_sample, normalize_sample


class InpaintModels(NamedTuple):
    """Bound apply-functions of the inpainting stack.

    ``context``: (image_n, disp_n) -> (B, H, W, 64) context features.
    ``net``:     (data68, masks) -> (image_n, disparity_n, existing) where
    ``existing`` is the coverage mask the net reports back — the input mask
    for the standard grid-net (models/pointcloud_inpainting.py:178), the
    propagated partial-conv mask for PartialInpaint
    (models/partial_inpainting.py:218).
    ``depth_net``: optional second net whose disparity output replaces the
    first's (the ``--inpaint-depth`` dual-net mode, utils/pipeline.py:53-55;
    the reference's merge code has a latent NameError — we implement the
    documented intent: color from net 1, disparity from net 2).
    """

    context: Callable
    net: Callable
    depth_net: Optional[Callable] = None
    context_depth: Optional[Callable] = None


def pointcloud_inpainting(
    models: InpaintModels,
    image: jax.Array,
    disparity: jax.Array,
    shift: jax.Array,
    camera: CameraConfig,
    focal,
    validity_threshold: float = 0.03,
    splat_method: str = "routed",
    relayout_context: bool = False,
):
    """Inpaint the disocclusions revealed by ``shift``.

    Args:
      image: (1, H, W, 3) raw image in [0, 1].
      disparity: (1, H, W, 1) refined disparity.
      shift: (3,) camera shift.
      focal: effect focal (may differ from camera.focal under dolly).

    Returns dict with (1, H, W, ...) arrays: ``image``, ``disparity``,
    ``depth``, ``existing`` (coverage mask), and ``points`` (1, H*W, 3)
    un-shifted inpainted cloud positions.
    """
    h, w = image.shape[1], image.shape[2]
    depth = disparity_to_depth(disparity, focal, camera.baseline)
    valid = validity_mask(disparity, validity_threshold)
    points = depth_to_points((depth * valid)[..., 0], focal)
    points = points.reshape(1, h * w, 3)

    image_n, img_stats = normalize_sample(image)
    disp_n, disp_stats = normalize_sample(disparity)

    def render_with(context_fn):
        context = context_fn(image_n, disp_n)
        if relayout_context:
            # conv-output layouts make the renderers' records pack
            # pathological on TPU (543 ms -> 71 ms at 1024^2, see
            # ops/layout.py); lossless for bf16-mode context nets
            context = relayout(context)
        payload = jnp.concatenate([image_n, disp_n, context], axis=-1)
        # the cloud is the single pixel grid; with the depth-cluster
        # entry split even hard-edge chunks stay inside the work budget,
        # and 'clip' keeps the scatter graph out of the compiled program.
        # 'banded' streams the 68-channel payload through the wide banded
        # kernel in groups of 8 — much faster than the routed one-hot
        # pass it replaces.
        if splat_method == "scatter":
            from kbe_tpu.ops.splat import render_pointcloud

            render, weight = render_pointcloud(
                (points + shift).reshape(1, -1, 3),
                payload.reshape(1, h * w, -1), h, w, focal,
                camera.baseline, method=splat_method)
        elif splat_method == "banded":
            from kbe_tpu.ops.splat_banded import render_grids_fast_banded

            render, weight = render_grids_fast_banded(
                (points + shift).reshape(1, h, w, 3),
                payload.reshape(1, h, w, -1), h, w, focal, camera.baseline)
        else:
            render, weight = render_grids_fast(
                (points + shift).reshape(1, h, w, 3),
                payload.reshape(1, h, w, -1), h, w, focal, camera.baseline)
        existing = (weight > 0.0).astype(jnp.float32)
        # 0/1 coverage mask: majority-vote median (bit-identical, and
        # ~27 ms cheaper per extension than the 25-tap sort at 1024^2)
        existing = existing * median_filter_binary(existing, 5)
        return render * jax.lax.stop_gradient(existing), existing

    def run(net, render, existing):
        img_n, dsp_n, existing_out = net(render, existing)
        img = jnp.clip(denormalize_sample(img_n, img_stats), 0.0, 1.0)
        dsp = jnp.maximum(denormalize_sample(dsp_n, disp_stats), 0.0)
        return img, dsp, existing_out

    render, existing = render_with(models.context)
    out_image, out_disparity, out_existing = run(models.net, render,
                                                 existing)
    if models.depth_net is not None:
        # the dual-net mode renders a second payload with the depth net's
        # own context extractor (each reference net calls its own
        # pointcloud_inpainting, utils/common.py:50-58)
        ctx_d = models.context_depth or models.context
        render_d, existing_d = render_with(ctx_d)
        _, out_disparity, _ = run(models.depth_net, render_d, existing_d)

    out_depth = disparity_to_depth(out_disparity, focal, camera.baseline)
    out_valid = validity_mask(out_disparity, validity_threshold)
    out_points = depth_to_points((out_depth * out_valid)[..., 0], focal)
    out_points = out_points.reshape(1, h * w, 3) - shift

    return {
        "image": out_image,
        "disparity": out_disparity,
        "depth": out_depth,
        "existing": out_existing,
        "points": out_points,
    }


def extend_cloud(cloud_xyz, cloud_data, cloud_valid, inpainted):
    """Append the newly revealed (existing == 0) inpainted points.

    Fixed-capacity equivalent of the reference's ``torch.cat`` growth
    (utils/common.py:75-80): each inpaint pass contributes exactly H*W
    slots, masked by novelty.

    ``cloud_data`` layout: (..., 5) = rgb3 + disparity + depth.
    Returns extended (xyz, data, valid) with H*W more slots.
    """
    img = inpainted["image"]
    h, w = img.shape[1], img.shape[2]
    novel = (inpainted["existing"].reshape(1, h * w) == 0.0).astype(
        jnp.float32)
    data = jnp.concatenate(
        [img.reshape(1, h * w, 3),
         inpainted["disparity"].reshape(1, h * w, 1),
         inpainted["depth"].reshape(1, h * w, 1)], axis=-1)
    return (
        jnp.concatenate([cloud_xyz, inpainted["points"]], axis=1),
        jnp.concatenate([cloud_data, data], axis=1),
        jnp.concatenate([cloud_valid, novel], axis=1),
    )
