"""Shared conv building blocks of every network in the framework.

The reference defines the same Basic / Downsample / Upsample trio in four
files (models/disparity_estimation.py:6-80, disparity_refinement.py:6-63,
disparity_refinement_pretrained.py:6-78, pointcloud_inpainting.py:7-81);
here they exist once, parameterized. Layout is NHWC (TPU-native); compute
dtype is configurable (bf16 for speed, f32 for parity tests), params stay
f32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class PReLU(nn.Module):
    """Per-channel parametric ReLU, init 0.25 (torch nn.PReLU semantics:
    one slope per channel, reference models/disparity_estimation.py:12)."""

    features: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", nn.initializers.constant(self.init),
                       (self.features,), jnp.float32)
        a = a.astype(x.dtype)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def upsample2x(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample at half-pixel centers (torch
    Upsample(align_corners=False) semantics)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear",
                            antialias=False)


def crop_to(x: jax.Array, height: int, width: int) -> jax.Array:
    """Crop trailing rows/cols — the reference's negative padding trick for
    odd-size grid rows (models/disparity_estimation.py:177-178)."""
    return x[:, :height, :width, :]


def ceil_max_pool(x: jax.Array) -> jax.Array:
    """2x2 stride-2 max pool with ceil_mode=True (torch MaxPool2d ceil
    semantics, reference models/disparity_estimation.py:91): odd trailing
    rows/cols still produce an output, fed by -inf padding."""
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _conv(features: int, kernel: int = 3, stride: int = 1,
          dtype: Dtype = jnp.float32, name: str | None = None) -> nn.Conv:
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class Basic(nn.Module):
    """conv-relu-conv / relu-conv-relu-conv block, optional residual.

    ``residual=True`` matches the reference Basic with an identity or 1x1
    shortcut (models/disparity_estimation.py:27-43); ``False`` matches the
    shortcut-free variant used by the base Refine net
    (models/disparity_refinement.py:26-27).
    """

    kind: str  # 'relu-conv-relu-conv' | 'conv-relu-conv'
    channels: Tuple[int, int, int]
    residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c0, c1, c2 = self.channels
        h = x
        if self.kind == "relu-conv-relu-conv":
            h = PReLU(c0, name="prelu1")(h)
        elif self.kind != "conv-relu-conv":
            raise ValueError(f"unknown Basic kind {self.kind!r}")
        h = _conv(c1, dtype=self.dtype, name="conv1")(h)
        h = PReLU(c1, name="prelu2")(h)
        h = _conv(c2, dtype=self.dtype, name="conv2")(h)
        if not self.residual:
            return h
        if c0 == c2:
            return h + x
        return h + _conv(c2, kernel=1, dtype=self.dtype, name="shortcut")(x)


class Downsample(nn.Module):
    """PReLU, stride-2 conv, PReLU, conv
    (reference models/disparity_estimation.py:47-62)."""

    channels: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c0, c1, c2 = self.channels
        h = PReLU(c0, name="prelu1")(x)
        h = _conv(c1, stride=2, dtype=self.dtype, name="conv1")(h)
        h = PReLU(c1, name="prelu2")(h)
        h = _conv(c2, dtype=self.dtype, name="conv2")(h)
        return h


class Upsample(nn.Module):
    """bilinear 2x, PReLU, conv, PReLU, conv
    (reference models/disparity_estimation.py:64-80)."""

    channels: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c0, c1, c2 = self.channels
        h = upsample2x(x)
        h = PReLU(c0, name="prelu1")(h)
        h = _conv(c1, dtype=self.dtype, name="conv1")(h)
        h = PReLU(c1, name="prelu2")(h)
        h = _conv(c2, dtype=self.dtype, name="conv2")(h)
        return h


def sample_norm_stats(x: jax.Array):
    """Per-sample mean and Bessel-corrected std over ALL non-batch dims.

    Matches ``t.view(B, -1).mean(1)`` / ``t.view(B, -1).std(1)`` (unbiased)
    used by Refine and Inpaint normalization
    (models/disparity_refinement.py:84-85).
    Returns broadcastable (B, 1, 1, 1) arrays.
    """
    b = x.shape[0]
    flat = x.reshape(b, -1).astype(jnp.float32)
    n = flat.shape[1]
    mean = jnp.mean(flat, axis=1)
    var = jnp.sum((flat - mean[:, None]) ** 2, axis=1) / (n - 1)
    std = jnp.sqrt(var)
    return mean.reshape(b, 1, 1, 1), std.reshape(b, 1, 1, 1)


def normalize_sample(x: jax.Array):
    """Normalize with per-sample stats; returns (normed, (mean, std))."""
    mean, std = sample_norm_stats(x)
    return (x - mean) / (std + 1e-7), (mean, std)


def denormalize_sample(x: jax.Array, stats) -> jax.Array:
    mean, std = stats
    return x * (std + 1e-7) + mean
