"""Evaluation metrics.

  compute_depth_metrics  — abs rel, sq rel, RMSE, log RMSE, delta<1.25^k
                           (reference utils/utils.py:117-136)
  psnr                   — with the reference's d=512 disparity peak quirk
                           (utils/utils.py:142-146: 20*log10(d^2/sqrt(mse)))
  compute_inpaint_metrics— PSNR img/disp + SSIM-distance img/disp
                           (utils/utils.py:140-156)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from kbe_tpu.ops.image_ops import ssim_distance

DEPTH_METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "log_rmse", "a1", "a2",
                      "a3")


def compute_depth_metrics(depth, depth_gt, masks) -> Dict[str, jax.Array]:
    """(B, H, W, 1) predicted/GT depth + binary masks -> 7 scalar metrics.

    Matches the reference exactly, including its convention of computing
    the means over *all* pixels after masking both inputs (masked-out
    pixels contribute via the +1e-7 epsilon, utils/utils.py:118-119)."""
    d = depth * masks + 1e-7
    g = depth_gt * masks + 1e-7
    thresh = jnp.maximum(g / d, d / g)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25 ** 3).astype(jnp.float32))
    rmse = jnp.sqrt(jnp.mean((g - d) ** 2))
    log_rmse = jnp.sqrt(jnp.mean((jnp.log10(g) - jnp.log10(d)) ** 2))
    abs_rel = jnp.mean(jnp.abs(g - d) / g)
    sq_rel = jnp.mean((g - d) ** 2 / g)
    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "log_rmse": log_rmse,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }


def psnr(im1: jax.Array, im2: jax.Array, disp: bool = False) -> jax.Array:
    """PSNR; ``disp=True`` uses the reference's d=512 peak (and its
    20*log10(d**2/rmse) form, utils/utils.py:142-146)."""
    mse = jnp.mean((im1 - im2) ** 2)
    d = 512.0 if disp else 1.0
    return 20.0 * jnp.log10(d ** 2 / jnp.sqrt(mse))


def compute_inpaint_metrics(image_inpaint, disparity_inpaint, image_gt,
                            disparity_gt) -> Dict[str, jax.Array]:
    return {
        "psnr_image": psnr(image_inpaint, image_gt),
        "psnr_disparity": psnr(disparity_inpaint, disparity_gt, disp=True),
        "ssim_image": ssim_distance(image_inpaint, image_gt, 11),
        "ssim_disparity": ssim_distance(disparity_inpaint, disparity_gt, 11),
    }
