"""Training losses.

jnp re-statements of reference utils/losses.py:
  compute_loss_ord        — masked L1 / scale-inv RMSE / scale-inv log-RMSE
                            (:8-36)
  compute_loss_grad       — multi-scale (h=1,2,4,8) MSE on normalized
                            gradients (:39-54)
  compute_masked_grad_loss— L1 pulling in-mask gradients toward kappa
                            (:56-68)
  joint_edge_loss         — image/disparity Sobel-edge agreement (:70-81;
                            defined but its call is commented out upstream)
  inpainting_loss         — NVIDIA partial-conv recipe: hole/valid L1, VGG16
                            perceptual, style (gram), total variation
                            (:88-140)
  inpainting_loss_adv     — unsupervised variant: valid L1, TV,
                            extended-mask flatness, valid-depth L1 (:142-158)
  LOSS_WEIGHTS            — training/train_inpaint.py:61-71
  depth_loss_schedule     — training/train_depth.py:145-149
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from kbe_tpu.ops.image_ops import (
    gaussian_blur,
    gram_matrix,
    rgb_to_grayscale,
    sobel_magnitude,
    total_variation,
)

# training/train_inpaint.py:61-71
LOSS_WEIGHTS: Dict[str, float] = {
    "hole": 6.0,
    "valid": 1.0,
    "prc": 0.05,
    "tv": 0.1,
    "style": 120.0,
    "grad": 10.0,
    "ord": 0.0001,
    "color": 0.0,
    "mask": 0.0001,
    "valid_depth": 1.0,
    "joint_edge": 1.0,
}


def depth_loss_schedule(iter_nb, beta: float = 0.015):
    """(gamma_ord, gamma_grad, gamma_mask) at training step ``iter_nb``
    (training/train_depth.py:145-149)."""
    it = jnp.asarray(iter_nb, jnp.float32)
    gamma_ord = 0.03 * (1.0 + 2.0 * jnp.exp(-beta * it))
    gamma_grad = 1.0 - jnp.exp(-beta * it)
    gamma_mask = 0.0001 * (1.0 - jnp.exp(-beta * it))
    return gamma_ord, gamma_grad, gamma_mask


def _derivative_scale(x: jax.Array, h: int, norm: bool = True):
    """Finite differences at scale h with optional magnitude normalization
    (reference utils/utils.py:76-99). ``x``: (B, H, W, 1). The vertical
    derivative is zero-padded at the top, the horizontal at the left,
    matching the reference's asymmetric pads (utils/utils.py:99)."""
    kv = jnp.zeros((h + 1, 1), x.dtype).at[0, 0].set(-1.0).at[h, 0].set(1.0)
    kh_ = jnp.zeros((1, h + 1), x.dtype).at[0, 0].set(-1.0).at[0, h].set(1.0)
    nv = jnp.zeros((h + 1, 1), x.dtype).at[0, 0].set(1.0).at[h, 0].set(1.0)
    nh = jnp.zeros((1, h + 1), x.dtype).at[0, 0].set(1.0).at[0, h].set(1.0)

    def conv(inp, k2d):
        k = k2d[:, :, None, None]
        return lax.conv_general_dilated(
            inp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)

    dv = conv(x, kv)
    dh = conv(x, kh_)
    if norm:
        av = conv(jnp.abs(x), nv)
        ah = conv(jnp.abs(x), nh)
        dv = dv / (av + 1e-7)
        dh = dh / (ah + 1e-7)
    dv = jnp.pad(dv, ((0, 0), (h, 0), (0, 0), (0, 0)))
    dh = jnp.pad(dh, ((0, 0), (0, 0), (h, 0), (0, 0)))
    return dv, dh


def compute_loss_ord(disparity, target, mask, mode: str = "L1"):
    """Masked ordinal loss. (B, H, W, 1) inputs; mask in {0, 1}."""
    n = jnp.sum(mask)
    safe_n = jnp.maximum(n, 1.0)
    if mode == "L1":
        loss = jnp.sum(jnp.abs(disparity * mask - target * mask)) / safe_n
    elif mode == "rmse":
        ri = (disparity - target) * mask
        loss = jnp.sum(ri ** 2) / safe_n - (jnp.sum(ri) / safe_n) ** 2
    elif mode == "logrmse":
        ri = (jnp.log10(disparity * mask + 1e-7)
              - jnp.log10(target * mask + 1e-7))
        loss = (jnp.sum(ri ** 2) / safe_n
                - (0.5 * jnp.sum(ri) / safe_n) ** 2)
    else:
        raise ValueError(f"unknown ord mode {mode!r}")
    return jnp.where(n > 0, loss, 0.0)


def compute_loss_grad(disparity, target, mask):
    """Multi-scale masked MSE on normalized gradients (h = 1, 2, 4, 8)."""
    n = jnp.sum(mask)
    safe_n = jnp.maximum(n, 1.0)
    loss = 0.0
    for h in (1, 2, 4, 8):
        dv, dh = _derivative_scale(disparity, h, norm=True)
        tv_, th_ = _derivative_scale(target, h, norm=True)
        loss = loss + jnp.sum((dv * mask - tv_ * mask) ** 2) / safe_n
        loss = loss + jnp.sum((dh * mask - th_ * mask) ** 2) / safe_n
    return jnp.where(n > 0, loss, 0.0)


def compute_masked_grad_loss(disparity, masks, scales=(1,), kappa=0.5):
    """Pull in-mask gradients toward ``kappa`` (flat-objects prior)."""
    n = jnp.sum(masks)
    safe_n = jnp.maximum(n, 1.0)
    loss = 0.0
    for h in scales:
        dv, dh = _derivative_scale(disparity, h, norm=False)
        loss = loss + jnp.sum(jnp.abs(dv * masks - kappa * masks)) / safe_n
        loss = loss + jnp.sum(jnp.abs(dh * masks - kappa * masks)) / safe_n
    return jnp.where(n > 0, loss, 0.0)


def joint_edge_loss(image, disparity, masks_extended):
    """Fraction of in-mask image edges with no matching disparity edge
    (reference utils/losses.py:70-81)."""
    edge_img = (sobel_magnitude(rgb_to_grayscale(image)) > 0.1).astype(
        jnp.float32)
    edge_disp = (sobel_magnitude(disparity) > 0.3).astype(jnp.float32)
    return (jnp.sum(edge_img * masks_extended * (1.0 - edge_disp))
            / jnp.maximum(jnp.sum(masks_extended), 1.0))


@dataclasses.dataclass(frozen=True)
class InpaintingLossConfig:
    kbe_only: bool = False
    perceptual: bool = True


def inpainting_loss(
    vgg_features: Optional[Callable],
    inp: jax.Array,
    mask: jax.Array,
    output: jax.Array,
    gt: jax.Array,
    config: InpaintingLossConfig = InpaintingLossConfig(),
) -> Dict[str, jax.Array]:
    """Supervised inpainting loss dict (hole/valid/prc/style/tv).

    ``vgg_features(x3ch) -> [f1, f2, f3]`` — a bound VGG16Features apply.
    ``output`` may be 3-channel (image) or 1-channel (disparity, tiled to
    3 for the perceptual branch, reference utils/losses.py:113-116).
    """
    out_comp = mask * inp + (1.0 - mask) * output
    loss = {}

    def tile(x):
        return jnp.concatenate([x] * 3, -1) if x.shape[-1] == 1 else x

    if config.perceptual and vgg_features is not None:
        f_comp = vgg_features(tile(out_comp))
        f_out = vgg_features(tile(output))
        f_gt = vgg_features(tile(gt))
        prc = 0.0
        for i in range(3):
            prc = prc + jnp.mean(jnp.abs(f_out[i] - f_gt[i]))
            prc = prc + jnp.mean(jnp.abs(f_comp[i] - f_gt[i]))
        loss["prc"] = prc

    if config.kbe_only:
        loss["color"] = jnp.mean(jnp.abs(output - gt))
    else:
        loss["hole"] = jnp.mean(jnp.abs((1.0 - mask) * (output - gt)))
        loss["valid"] = jnp.mean(jnp.abs(mask * (output - gt)))
        if config.perceptual and vgg_features is not None:
            style = 0.0
            for i in range(3):
                g_gt = gram_matrix(f_gt[i])
                style = style + jnp.mean(
                    jnp.abs(gram_matrix(f_out[i]) - g_gt))
                style = style + jnp.mean(
                    jnp.abs(gram_matrix(f_comp[i]) - g_gt))
            loss["style"] = style
        loss["tv"] = total_variation(out_comp)
    return loss


def inpainting_loss_adv(
    inp: jax.Array,
    mask: jax.Array,
    output: jax.Array,
    disparity: Optional[jax.Array] = None,
    disparity_gt: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Unsupervised (adversarial) pixel losses
    (reference utils/losses.py:142-158): valid L1, TV, extended-mask
    flatness minus blurred edges, valid-depth L1."""
    out_comp = mask * inp + (1.0 - mask) * output
    loss = {
        "valid": jnp.mean(jnp.abs(mask * (output - inp))),
        "tv": total_variation(out_comp),
    }
    if disparity is not None:
        extended = (gaussian_blur(mask, 13, 1.5) < 1.0).astype(jnp.float32)
        edge = (sobel_magnitude(rgb_to_grayscale(output)) > 0.1).astype(
            jnp.float32)
        extended_edges = (gaussian_blur(edge, 7, 1.0) > 0.0).astype(
            jnp.float32)
        loss["mask"] = compute_masked_grad_loss(
            disparity, extended * (1.0 - extended_edges), (1,), 0.5)
        if disparity_gt is not None:
            loss["valid_depth"] = jnp.mean(
                jnp.abs(mask * (disparity - disparity_gt)))
    return loss
