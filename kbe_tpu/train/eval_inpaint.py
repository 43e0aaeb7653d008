"""Standalone inpainting evaluation.

Equivalent of reference training/eval_inpaint.py:21-253 (``InpaintEval``):
supervised eval (PSNR/SSIM/FID over masked-view inpainting), unsupervised
eval (FID only over A->B warped inpainting), and view inspection helpers
including the halfway view C (generate_new_view_from_inpaint,
utils/utils.py:303-337). Note the reference file has a latent ImportError
(it imports a non-existent ImageNetDataset, eval_inpaint.py:15) — no such
dependency here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.config import CameraConfig
from kbe_tpu.models import Inpaint, PartialInpaint
from kbe_tpu.models.gridnet import ContextNet
from kbe_tpu.models.layers import denormalize_sample, normalize_sample
from kbe_tpu.ops.filters import validity_mask
from kbe_tpu.ops.geometry import depth_to_points, disparity_to_depth
from kbe_tpu.ops.splat import render_pointcloud
from kbe_tpu.train.fid import FID
from kbe_tpu.train.metrics import compute_inpaint_metrics
from kbe_tpu.train.trainer_inpaint import TRAIN_CAMERA
from kbe_tpu.train.view_synthesis import masks_a_from_b, render_view_b


def generate_view_c(points_a, image_a, depth_a, image_b, depth_b, mask_b,
                    shift, camera: CameraConfig, height: int, width: int):
    """Halfway view C: merge cloud A with the inpainted cloud B and render
    at shift/2 (reference utils/utils.py:303-337). Only the newly revealed
    B points (mask_b == 0) are informative; the reference concatenates the
    full B cloud — reproduced, with the render's z-test resolving overlap.
    Returns (render (B,H,W,4), coverage mask)."""
    b = image_a.shape[0]
    pts_b = depth_to_points(depth_b[..., 0], camera.focal).reshape(
        b, -1, 3) - shift[:, None, :]
    pts = jnp.concatenate([points_a, pts_b], axis=1)
    img = jnp.concatenate([image_a.reshape(b, -1, 3),
                           image_b.reshape(b, -1, 3)], axis=1)
    dep = jnp.concatenate([depth_a.reshape(b, -1, 1),
                           depth_b.reshape(b, -1, 1)], axis=1)
    data = jnp.concatenate([img, dep], axis=-1)
    render, weight = render_pointcloud(
        pts + shift[:, None, :] / 2.0, data, height, width, camera.focal,
        camera.baseline)
    return render, weight


@dataclasses.dataclass
class InpaintEval:
    """``params``: dict with 'context' and 'net' params."""

    params: Dict[str, Any]
    camera: CameraConfig = TRAIN_CAMERA
    partial_conv: bool = False
    fid_params: Any = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.context = ContextNet(dtype=self.dtype)
        self.net = (PartialInpaint if self.partial_conv else Inpaint)(
            dtype=self.dtype)
        self._sup = jax.jit(self._supervised_forward)
        self._adv = jax.jit(self._adversarial_forward)

    def _apply_net(self, data, masks):
        if self.partial_conv:
            i, d, _ = self.net.apply(self.params["net"], data, masks)
        else:
            i, d = self.net.apply(self.params["net"], data, masks)
        return i, d

    def _supervised_forward(self, batch):
        masks, _ = masks_a_from_b(batch["image"], batch["disparity"],
                                  batch["depth"], batch["zoom"], self.camera)
        image01 = (batch["image"] + 1.0) / 2.0
        img_m, disp_m = image01 * masks, batch["disparity"] * masks
        img_n, i_stats = normalize_sample(img_m)
        disp_n, d_stats = normalize_sample(disp_m)
        ctx = self.context.apply(self.params["context"], img_n, disp_n)
        data = jnp.concatenate([img_n, disp_n, ctx], axis=-1)
        out_i, out_d = self._apply_net(data, masks)
        out_img = jnp.clip(denormalize_sample(out_i, i_stats), 0.0, 1.0)
        out_disp = jnp.maximum(denormalize_sample(out_d, d_stats), 0.0)
        metrics = compute_inpaint_metrics(out_img, out_disp, image01,
                                          batch["disparity"])
        return metrics, out_img, image01, masks, out_disp

    def _adversarial_forward(self, batch):
        image01 = (batch["image"] + 1.0) / 2.0
        img_n, i_stats = normalize_sample(image01)
        disp_n, d_stats = normalize_sample(batch["disparity"])
        ctx = self.context.apply(self.params["context"], img_n, disp_n)
        render, mask_b, pts_a, shift = render_view_b(
            img_n, disp_n, batch["depth"], batch["zoom"], self.camera,
            context=ctx)
        data = jnp.concatenate([render[..., 0:3], render[..., 3:4],
                                render[..., 4:]], axis=-1)
        out_i, out_d = self._apply_net(data, mask_b)
        out_img = jnp.clip(denormalize_sample(out_i, i_stats), 0.0, 1.0)
        out_disp = jnp.maximum(denormalize_sample(out_d, d_stats), 0.0)
        real = jnp.clip(image01, 0.0, 1.0)
        return out_img, out_disp, real, mask_b, pts_a, shift

    # ----------------------------------------------------------- public

    def eval(self, batches: Iterable[Dict],
             compute_fid: bool = True) -> Dict[str, float]:
        """Supervised metrics (+ FID) over an eval set
        (eval_inpaint.py:44-115)."""
        acc, n = None, 0
        real_imgs, fake_imgs = [], []
        for batch in batches:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            metrics, out_img, image01, _, _ = self._sup(batch)
            m = {k: float(v) for k, v in metrics.items()}
            acc = m if acc is None else {k: acc[k] + m[k] for k in m}
            n += 1
            if compute_fid:
                real_imgs.append(np.asarray(image01))
                fake_imgs.append(np.asarray(out_img))
        out = {k: v / n for k, v in acc.items()} if acc else {}
        if compute_fid and real_imgs:
            fid = FID(self.fid_params)
            out["fid"] = fid.fid(np.concatenate(real_imgs),
                                 np.concatenate(fake_imgs))
        return out

    def eval_adv(self, batches: Iterable[Dict]) -> float:
        """FID-only unsupervised eval (eval_inpaint.py:117-179)."""
        real_imgs, fake_imgs = [], []
        for batch in batches:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            out_img, _, real, _, _, _ = self._adv(batch)
            real_imgs.append(np.asarray(real))
            fake_imgs.append(np.asarray(out_img))
        fid = FID(self.fid_params)
        return fid.fid(np.concatenate(real_imgs), np.concatenate(fake_imgs))

    def get_inpaint(self, batch: Dict, output_render_c: bool = False):
        """Inspection outputs for notebooks (eval_inpaint.py:181-253)."""
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        if not output_render_c:
            metrics, out_img, image01, masks, out_disp = self._sup(batch)
            return {
                "image": np.asarray(image01),
                "inpaint_image": np.asarray(out_img),
                "inpaint_disparity": np.asarray(out_disp),
                "masks": np.asarray(masks),
            }
        out_img, out_disp, real, mask_b, pts_a, shift = self._adv(batch)
        h, w = real.shape[1], real.shape[2]
        depth_b = disparity_to_depth(out_disp, self.camera.focal,
                                     self.camera.baseline)
        render_c, mask_c = generate_view_c(
            pts_a, real, batch["depth"], out_img, depth_b, mask_b, shift,
            self.camera, h, w)
        return {
            "image_a": np.asarray(real),
            "inpaint_image_b": np.asarray(out_img),
            "inpaint_disparity_b": np.asarray(out_disp),
            "mask_b": np.asarray(mask_b),
            "render_c": np.asarray(render_c),
            "mask_c": np.asarray(mask_c),
        }
