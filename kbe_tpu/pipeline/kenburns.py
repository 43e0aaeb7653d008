"""The end-to-end 3D Ken Burns effect — one XLA program.

Re-design of the reference's host-driven loop (utils/pipeline.py:59-134 +
process_kenburns, utils/common.py:172-263). The reference crosses the
device boundary per frame (cv2 crop at utils/common.py:255-257, scalar
``.item()`` syncs at utils/pipeline.py:94-96) and launches 4 CUDA kernels
per frame from Python; here the whole effect — depth estimation, refinement,
cloud construction, two inpainting extensions, and all 75 posed renders with
disocclusion fill, crop and resize — is a single jit-compiled function. The
frame loop runs under ``lax.map`` with a chunked batch dimension so XLA
vectorizes several poses at once without blowing HBM.

Flagship path (BASELINE.md): image -> 75 x 1024^2 frames in one launch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
from kbe_tpu.models import (
    Disparity,
    Inpaint,
    PartialInpaint,
    Refine,
    RefinePretrained,
    Semantics,
)
from kbe_tpu.models.gridnet import ContextNet
from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas
from kbe_tpu.ops.geometry import (
    apply_shift,
    depth_range,
    depth_to_points,
    disparity_to_depth,
    interpolate_window,
    solve_shift,
)
from kbe_tpu.ops.resize import (crop_rect_subpix_mm, resize_bilinear,
                                resize_to_max)
from kbe_tpu.ops.splat import render_pointcloud
from kbe_tpu.pipeline.inpaint_flow import InpaintModels, \
    pointcloud_inpainting


def displacement_margin(zoom: ZoomSettings, camera: CameraConfig,
                        effect: EffectConfig, width: int,
                        height: int) -> int:
    """Static bound on any point's per-frame screen displacement (pixels).

    Derivation: the solved metric shift sx ~= shiftU * closest / focal and
    the projected displacement f*sx/z <= shiftU (z >= closest); the z-shift
    contributes |u| * sz/z <= (W/2) * (1 - min crop ratio); inpaint-grid
    points carry an extra -overshoot * endpoint-shift; dolly focal
    interpolation rescales u by up to the crop scaling. Used to size the
    Pallas renderer's candidate windows.
    """
    import math

    su = [zoom.src.center_u - width / 2.0, zoom.dst.center_u - width / 2.0]
    sv = [zoom.src.center_v - height / 2.0,
          zoom.dst.center_v - height / 2.0]
    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    dr = 1.0 - min(zoom.src.crop_width, zoom.dst.crop_width) / max_cw
    over = (effect.inpaint_overshoot
            if effect.inpaint and not effect.dolly else 0.0)
    mx = max(abs(a - over * b) for a in su + [0.0] for b in su + [0.0])
    my = max(abs(a - over * b) for a in sv + [0.0] for b in sv + [0.0])
    scale_term = (max(width, height) / 2.0) * dr * (1.0 + over)
    if effect.dolly:
        # focal interpolation rescales all screen coords
        scaling = zoom.dst.crop_width / zoom.src.crop_width
        scale_term += (max(width, height) / 2.0) * abs(scaling - 1.0)
    return int(math.ceil(max(mx, my) + scale_term)) + 6


def _step_focal(step: float, zoom: ZoomSettings, camera: CameraConfig,
                dolly: bool) -> float:
    """Dolly focal interpolation f*(1-s) + s*f*(wTo/wFrom)
    (utils/common.py:225-227); constant otherwise."""
    if not dolly:
        return camera.focal
    scaling = zoom.dst.crop_width / zoom.src.crop_width
    return camera.focal * (1.0 - step) + step * camera.focal * scaling


def _window_shift(step, zoom: ZoomSettings, width: int, height: int):
    """Screen shift of the interpolated window center relative to the image
    center, plus the interpolated crop width (utils/common.py:230-236)."""
    cu, cv, cw, ch = interpolate_window(zoom.src, zoom.dst, step)
    return cu - width / 2.0, cv - height / 2.0, cw


def compute_pose_shift(step, focal, anchor, zoom: ZoomSettings,
                       camera: CameraConfig, width: int, height: int):
    """Camera shift for the pose at ``step`` in [0, 1].

    ``anchor`` = (min_depth, min_u, min_v) from depth_range. The z target
    scales the anchor depth by the crop ratio (utils/common.py:235-236).
    """
    dmin, du, dv = anchor
    shift_u, shift_v, crop_w = _window_shift(step, zoom, width, height)
    max_crop_w = max(zoom.src.crop_width, zoom.dst.crop_width)
    depth_from = dmin
    depth_to = dmin * (crop_w / max_crop_w)
    return solve_shift(shift_u, shift_v, depth_from, depth_to, dmin, du, dv,
                       width, height, focal)


class PipelineParams(NamedTuple):
    """Parameter pytree of the full inference stack."""

    semantics: Any
    disparity: Any
    refine: Any
    context: Any
    inpaint: Any
    context_depth: Any = None
    inpaint_depth: Any = None


def build_effect_fn(
    height: int,
    width: int,
    zoom: ZoomSettings,
    camera: CameraConfig = CameraConfig(),
    effect: EffectConfig = EffectConfig(),
    pretrained_refine: bool = False,
    partial_inpainting: bool = False,
    dtype: Any = jnp.float32,
    depth_dtype: Any = None,
    with_stats: bool = False,
) -> Callable:
    """Build the jittable ``effect(params, image) -> frames`` function.

    ``image``: (1, H, W, 3) in [0, 1] (BGR by cv2 convention unless the
    caller feeds RGB, mirroring kbe.py:96-103). Returns (num_steps, H, W, 3)
    uint8 frames. With
    ``with_stats=True`` returns ``(frames, stats)`` where stats carries
    ``splat_overflow_frames`` — frames that genuinely dropped work:
    overwork chunks BEYOND effect.splat_overflow_chunks (up to the cap
    they render exactly via the bounded scatter epilogue) or CSR routing
    overflow. With splat_fallback='clip' such frames silently lost
    splats; with 'scatter' they were re-rendered exactly.

    ``dtype`` is the compute dtype of the inpainting stack (context +
    inpaint nets); ``depth_dtype`` (default: same as ``dtype``) is the
    compute dtype of the geometry-driving depth path (semantics,
    disparity, refine). bf16 depth rounds disparity to an 8-bit mantissa,
    which becomes a displacement-scaled pixel-position error in every
    posed render (the reference runs f32 end-to-end,
    utils/pipeline.py:74-84) — the production mixed policy is therefore
    f32 depth + bf16 inpainting. Params are f32 either way.
    """
    if height % 4 or width % 4:
        raise ValueError("image dims must be multiples of 4 (kbe.py:108-114)")
    zoom.validate(width, height)

    if depth_dtype is None:
        depth_dtype = dtype
    sem_def = Semantics(dtype=depth_dtype)
    disp_def = Disparity(dtype=depth_dtype)
    refine_def = (RefinePretrained if pretrained_refine else Refine)(
        dtype=depth_dtype)
    ctx_def = ContextNet(dtype=dtype)
    inpaint_def = (PartialInpaint if partial_inpainting else Inpaint)(
        dtype=dtype)

    steps = np.linspace(0.0, 1.0, effect.num_steps)
    focals = np.array([_step_focal(s, zoom, camera, effect.dolly)
                       for s in steps], np.float32)
    max_cw = max(zoom.src.crop_width, zoom.dst.crop_width)
    max_ch = max(zoom.src.crop_height, zoom.dst.crop_height)

    # Static fill ROI: the frame crop is always the centered max-crop
    # window (the camera shift pans the cloud, not the crop), so the
    # disocclusion fill only needs to resolve holes the bilinear crop can
    # touch — border hole bands from camera shift fall outside it and
    # would otherwise trigger the widest marches. +2px covers the
    # bilinear taps (crop_rect_subpix samples center ± (patch-1)/2).
    fill_roi = None
    if effect.fill_roi:
        rx0 = max(0, int(np.floor(width / 2.0 - (max_cw - 1) / 2.0)) - 2)
        rx1 = min(width, int(np.floor(width / 2.0 + (max_cw - 1) / 2.0)) + 3)
        ry0 = max(0, int(np.floor(height / 2.0 - (max_ch - 1) / 2.0)) - 2)
        ry1 = min(height,
                  int(np.floor(height / 2.0 + (max_ch - 1) / 2.0)) + 3)
        if (ry0, ry1, rx0, rx1) != (0, height, 0, width):
            fill_roi = (ry0, ry1, rx0, rx1)

    # frame-loop renderer selection (static). "banded" (the default) has
    # no displacement bound: per-frame CSR routing adapts to the actual
    # point distribution and falls back to the exact scatter path on
    # capacity overflow, so it covers every trajectory including dolly.
    margin = displacement_margin(zoom, camera, effect, width, height)
    splat = effect.splat_method
    if splat == "auto":
        splat = "banded"
    if splat == "pallas" and margin > effect.max_pallas_margin:
        raise ValueError(
            f"trajectory displacement bound {margin}px exceeds "
            f"max_pallas_margin={effect.max_pallas_margin}; use "
            "splat_method='routed'")

    def _net_apply(params, data, masks):
        if partial_inpainting:
            img, dsp, existing = inpaint_def.apply(params, data, masks)
            return img, dsp, existing
        img, dsp = inpaint_def.apply(params, data, masks)
        return img, dsp, masks

    def effect_fn(params: PipelineParams, image: jax.Array) -> jax.Array:
        # --- depth estimation at half resolution (utils/pipeline.py:72-74)
        resized = resize_to_max(image, max(height, width) // 2)
        semantics = sem_def.apply(params.semantics, resized)
        disp_half = disp_def.apply(params.disparity, resized, semantics)
        if effect.two_d:
            # 2D KBE: flat scene (utils/pipeline.py:75-76)
            disp_half = jnp.ones_like(disp_half)

        # --- refinement to full resolution + normalization (:78-81)
        disparity = refine_def.apply(params.refine, image, disp_half)
        # geometry precision boundary: everything downstream of the nets
        # (normalization, depth reciprocal, unprojection, shift solve)
        # accumulates in f32 regardless of the nets' compute dtype
        disparity = disparity.astype(jnp.float32)
        disparity = disparity - jnp.minimum(jnp.min(disparity), 0.0)
        disparity = disparity / jnp.max(disparity) * camera.baseline

        depth = disparity_to_depth(disparity, camera.focal, camera.baseline)
        points = depth_to_points(depth[..., 0], camera.focal)
        points = points.reshape(1, height * width, 3)

        # --- depth-range anchor, in-graph (replaces cv2.minMaxLoc, :96)
        anchor = depth_range(depth[0, ..., 0], effect.depth_range_margin)

        # --- cloud: stacked pixel grids of rgb + disparity + depth payload
        #     (grid structure preserved for the Pallas tiled renderer)
        grids_xyz = [points.reshape(height, width, 3)]
        grids_data = [jnp.concatenate([image[0], disparity[0], depth[0]],
                                      axis=-1)]
        grids_valid = [jnp.ones((height, width), jnp.float32)]

        # --- inpainting extension at the two effect endpoints
        #     (utils/common.py:181-219; skipped for dolly/2-frame modes)
        if effect.inpaint and not effect.dolly:
            models = InpaintModels(
                context=partial(ctx_def.apply, params.context),
                net=partial(_net_apply, params.inpaint),
                depth_net=(partial(_net_apply, params.inpaint_depth)
                           if params.inpaint_depth is not None else None),
                context_depth=(partial(ctx_def.apply, params.context_depth)
                               if params.context_depth is not None
                               else None),
            )
            if models.depth_net is not None and params.context_depth is None:
                raise ValueError("inpaint_depth requires context_depth")
            for s in (0.0, 1.0):
                shift = compute_pose_shift(s, camera.focal, anchor, zoom,
                                           camera, width, height)
                inp = pointcloud_inpainting(
                    models, image, disparity, effect.inpaint_overshoot
                    * shift, camera, camera.focal,
                    effect.validity_threshold,
                    splat_method=("scatter" if splat == "scatter"
                                  else "banded" if splat == "banded"
                                  else "routed"),
                    relayout_context=(dtype == jnp.bfloat16))
                grids_xyz.append(inp["points"].reshape(height, width, 3))
                grids_data.append(jnp.concatenate(
                    [inp["image"][0], inp["disparity"][0], inp["depth"][0]],
                    axis=-1))
                grids_valid.append(
                    (inp["existing"][0, ..., 0] == 0.0).astype(jnp.float32))

        cloud_xyz = jnp.stack(grids_xyz)      # (G, H, W, 3)
        cloud_data = jnp.stack(grids_data)    # (G, H, W, 5)
        cloud_valid = jnp.stack(grids_valid)  # (G, H, W)

        # pose-invariant frame payload (rgb + depth) and, for the default
        # banded path, the posed renderer's static records — packed ONCE
        # here instead of per frame (splat_posed module doc: ~250 MB of
        # per-frame record-pack HBM traffic hoisted out of the loop)
        frame_data = jnp.concatenate(
            [cloud_data[..., 0:3], cloud_data[..., 4:5]], axis=-1)
        scene = None
        routing_all = None
        steps_j = jnp.asarray(steps, jnp.float32)
        focals_j = jnp.asarray(focals)
        if splat == "banded":
            from kbe_tpu.ops.splat_posed import (pose_routing,
                                                 prepare_banded_scene)

            scene = prepare_banded_scene(cloud_xyz, frame_data, cloud_valid)
            # batched routing prepass: ONE vmapped program routes all
            # poses (pose_routing is pure XLA — only the Mosaic kernel
            # rejects vmap), hoisting the per-pose dispatch out of the
            # frame loop; the per-pose slices ride into lax.map as xs
            shifts_all = jax.vmap(
                lambda s, f: compute_pose_shift(s, f, anchor, zoom,
                                                camera, width, height)
            )(steps_j, focals_j)
            routing_all = jax.vmap(
                lambda sh, f: pose_routing(
                    scene, sh, f, height, width,
                    overflow_cap=effect.splat_overflow_chunks)
            )(shifts_all, focals_j)

        # --- pose loop: render -> fill -> quantize -> crop -> resize
        def render_frame(args):
            step, focal = args[0], args[1]
            shift = compute_pose_shift(step, focal, anchor, zoom, camera,
                                       width, height)
            data = frame_data
            overflow = jnp.bool_(False)
            if splat == "banded":
                from kbe_tpu.ops.splat_posed import render_scene_posed
                from kbe_tpu.ops.splat import render_pointcloud as rp

                render, weight, overflow = render_scene_posed(
                    scene, shift, focal, height, width, camera.baseline,
                    overflow_cap=effect.splat_overflow_chunks,
                    routing=args[2])
                if effect.splat_fallback == "scatter":
                    def _scatter_fb(_):
                        xyz_fb = apply_shift(cloud_xyz, shift)
                        return rp(xyz_fb.reshape(1, -1, 3),
                                  data.reshape(1, -1, 4), height, width,
                                  focal, camera.baseline,
                                  valid=cloud_valid.reshape(1, -1),
                                  method="scatter")

                    render, weight = jax.lax.cond(
                        overflow, _scatter_fb,
                        lambda _: (render, weight), operand=None)
            elif splat == "delta":
                xyz = apply_shift(cloud_xyz, shift)
                from kbe_tpu.ops.legacy.splat_delta import \
                    render_grids_delta, render_grids_fast_delta

                _, _, overflow = render_grids_delta(
                    xyz, data, height, width, focal, camera.baseline,
                    valid=cloud_valid)
                render, weight = render_grids_fast_delta(
                    xyz, data, height, width, focal, camera.baseline,
                    valid=cloud_valid, fallback=effect.splat_fallback)
            elif splat == "routed":
                xyz = apply_shift(cloud_xyz, shift)
                from kbe_tpu.ops.splat_routed import render_grids_fast, \
                    render_grids_routed

                _, _, overflow = render_grids_routed(
                    xyz, data, height, width, focal, camera.baseline,
                    valid=cloud_valid)
                render, weight = render_grids_fast(
                    xyz, data, height, width, focal, camera.baseline,
                    valid=cloud_valid, fallback=effect.splat_fallback)
            elif splat == "pallas":
                xyz = apply_shift(cloud_xyz, shift)
                from kbe_tpu.ops.legacy.splat_pallas import \
                    render_grids_pallas

                render, weight = render_grids_pallas(
                    xyz, data, height, width, focal, camera.baseline,
                    valid=cloud_valid, margin=margin)
            else:
                xyz = apply_shift(cloud_xyz, shift)
                render, weight = render_pointcloud(
                    xyz.reshape(1, -1, 3), data.reshape(1, -1, 4), height,
                    width, focal, camera.baseline,
                    valid=cloud_valid.reshape(1, -1), method=splat)
            render_depth = render[..., 3:4] * (weight > 0.0)
            if effect.fill_impl == "xla":
                from kbe_tpu.ops.discfill import fill_disocclusion

                filled = fill_disocclusion(render, render_depth,
                                           effect.fill_march_steps)
            else:
                filled = fill_disocclusion_pallas(
                    render, render_depth, effect.fill_march_steps,
                    phase1_steps=effect.fill_march_phase1, roi=fill_roi,
                    phase0_steps=effect.fill_phase0,
                    phase0_gate=effect.fill_phase0_gate)
            # uint8 quantization happens BEFORE crop in the reference
            # (utils/common.py:255 astype truncates), and the uint8 cv2
            # crop + resize each round-to-nearest (:256-257) — reproduce
            # both roundings so the final astype(uint8) is exact.
            rgb = jnp.floor(jnp.clip(filled[..., 0:3] * 255.0, 0.0, 255.0))
            patch = crop_rect_subpix_mm(rgb[0], max_cw, max_ch, width / 2.0,
                                        height / 2.0)
            patch = jnp.clip(jnp.round(patch), 0.0, 255.0)
            out = resize_bilinear(patch[None], height, width)[0]
            # emit uint8: the values are already exact uint8-grid floats,
            # and materializing 75 frames as f32 writes ~950 MB of HBM
            # per video that the uint8 contract never needed
            out = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
            return out, overflow

        xs = (steps_j, focals_j)
        if routing_all is not None:
            xs = xs + (routing_all,)
        # The Pallas kernels (renderers AND the disocclusion fill) cannot
        # run under vmap (ANY-space refs / scalar prefetch), and the fill
        # is in the frame body on every path — so frames go sequentially.
        frames, overflows = jax.lax.map(render_frame, xs, batch_size=None)
        if with_stats:
            return frames, {"splat_overflow_frames":
                            jnp.sum(overflows.astype(jnp.int32))}
        return frames

    return effect_fn


@dataclasses.dataclass
class KenBurnsPipeline:
    """User-facing pipeline: owns model params and the jitted effect.

    Equivalent surface to the reference Pipeline (utils/pipeline.py:23-134)
    minus host-side video writing (see pipeline/video.py). Build with
    ``KenBurnsPipeline.create`` (random init) or from converted torch
    checkpoints via ``train.checkpoint.load_pipeline_params``.
    """

    camera: CameraConfig
    effect: EffectConfig
    params: PipelineParams
    pretrained_refine: bool = False
    partial_inpainting: bool = False
    dtype: Any = jnp.float32
    depth_dtype: Any = None
    _cache: dict = dataclasses.field(default_factory=dict)

    @staticmethod
    def create(rng: jax.Array, height: int = 256, width: int = 256,
               camera: CameraConfig = CameraConfig(),
               effect: EffectConfig = EffectConfig(),
               pretrained_refine: bool = False,
               partial_inpainting: bool = False,
               inpaint_depth: bool = False,
               dtype: Any = jnp.float32,
               depth_dtype: Any = None) -> "KenBurnsPipeline":
        keys = jax.random.split(rng, 7)
        img = jnp.zeros((1, height, width, 3))
        half = jnp.zeros((1, height // 2, width // 2, 3))
        disp_half = jnp.zeros((1, height // 4, width // 4, 1))
        sem = jnp.zeros((1, height // 32, width // 32, 512))
        data68 = jnp.zeros((1, height // 4, width // 4, 68))
        mask = jnp.zeros((1, height // 4, width // 4, 1))
        disp_full = jnp.zeros((1, height, width, 1))

        sem_def = Semantics(dtype=dtype)
        disp_def = Disparity(dtype=dtype)
        refine_def = (RefinePretrained if pretrained_refine else Refine)(
            dtype=dtype)
        ctx_def = ContextNet(dtype=dtype)
        inp_def = (PartialInpaint if partial_inpainting else Inpaint)(
            dtype=dtype)

        params = PipelineParams(
            semantics=sem_def.init(keys[0], half),
            disparity=disp_def.init(keys[1], half, sem),
            refine=refine_def.init(keys[2], img, disp_half),
            context=ctx_def.init(keys[3], img, disp_full),
            inpaint=inp_def.init(keys[4], data68, mask),
            context_depth=(ctx_def.init(keys[5], img, disp_full)
                           if inpaint_depth else None),
            inpaint_depth=(inp_def.init(keys[6], data68, mask)
                           if inpaint_depth else None),
        )
        return KenBurnsPipeline(camera=camera, effect=effect, params=params,
                                pretrained_refine=pretrained_refine,
                                partial_inpainting=partial_inpainting,
                                dtype=dtype, depth_dtype=depth_dtype)

    def effect_fn(self, height: int, width: int,
                  zoom: ZoomSettings) -> Callable:
        key = (height, width, zoom, self.effect, self.camera)
        if key not in self._cache:
            fn = build_effect_fn(
                height, width, zoom, self.camera, self.effect,
                self.pretrained_refine, self.partial_inpainting, self.dtype,
                self.depth_dtype)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def __call__(self, image: np.ndarray,
                 zoom: Optional[ZoomSettings] = None) -> np.ndarray:
        """``image``: (H, W, 3) float [0, 1] -> (num_steps, H, W, 3) uint8."""
        h, w = image.shape[0], image.shape[1]
        if zoom is None:
            zoom = (ZoomSettings.default_dolly(w, h) if self.effect.dolly
                    else ZoomSettings.default_3d(w, h))
        fn = self.effect_fn(h, w, zoom)
        frames = fn(self.params, jnp.asarray(image, jnp.float32)[None])
        return np.asarray(frames).astype(np.uint8)
