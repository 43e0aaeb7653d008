"""Image-processing primitives used by losses and metrics.

Replaces the reference's kornia dependencies (Sobel, GaussianBlur2d,
RgbToGrayscale, SSIM — utils/losses.py:70-103, utils/utils.py:151) with
pure-jnp implementations. Layout NHWC.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _depthwise(x, kernel2d, pad_mode="reflect"):
    """Depthwise 2D conv with symmetric padding; kernel2d (kh, kw)."""
    kh, kw = kernel2d.shape
    c = x.shape[-1]
    padded = jnp.pad(
        x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        mode=pad_mode)
    k = jnp.broadcast_to(kernel2d[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        padded, k.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST)


def rgb_to_grayscale(image: jax.Array) -> jax.Array:
    """ITU-R 601 luma (kornia RgbToGrayscale weights)."""
    w = jnp.array([0.299, 0.587, 0.114], image.dtype)
    return jnp.sum(image * w, axis=-1, keepdims=True)


_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])


def sobel_magnitude(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Sobel gradient magnitude with kornia's normalized (/8) kernels."""
    kx = _SOBEL_X / 8.0
    ky = kx.T
    gx = _depthwise(x, kx, "reflect")
    gy = _depthwise(x, ky, "reflect")
    return jnp.sqrt(gx * gx + gy * gy + eps)


def gaussian_kernel1d(size: int, sigma: float) -> jax.Array:
    half = (size - 1) / 2.0
    xs = jnp.arange(size, dtype=jnp.float32) - half
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(x: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable Gaussian blur, reflect padding (kornia GaussianBlur2d)."""
    k = gaussian_kernel1d(size, sigma)
    x = _depthwise(x, k[:, None], "reflect")
    x = _depthwise(x, k[None, :], "reflect")
    return x


def total_variation(image: jax.Array) -> jax.Array:
    """Mean absolute difference of horizontal + vertical neighbors
    (reference utils/utils.py:428-432)."""
    dh = jnp.mean(jnp.abs(image[:, :, :-1, :] - image[:, :, 1:, :]))
    dv = jnp.mean(jnp.abs(image[:, :-1, :, :] - image[:, 1:, :, :]))
    return dh + dv


def gram_matrix(features: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C, C) Gram normalized by C*H*W
    (reference utils/utils.py:384-400)."""
    b, h, w, c = features.shape
    f = features.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f,
                      precision=lax.Precision.HIGHEST) / (c * h * w)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         max_val: float = 1.0, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM with a Gaussian window (standard Wang et al. form)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    blur = partial(gaussian_blur, size=window_size, sigma=sigma)
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1)
                                              * (s1 + s2 + c2))
    return jnp.mean(m)


def ssim_distance(img1: jax.Array, img2: jax.Array,
                  window_size: int = 11) -> jax.Array:
    """(1 - SSIM) / 2 — the value kornia-0.3's SSIM *loss* reports, which
    is what the reference logs as its 'SSIM' metric
    (utils/utils.py:151-155)."""
    return (1.0 - ssim(img1, img2, window_size)) / 2.0
