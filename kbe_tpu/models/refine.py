"""Disparity refinement U-nets.

Super-resolves the half/quarter-res disparity estimate back to full image
resolution with image-feature skip connections, wrapped in per-sample
mean/std normalization of both inputs and the output
(reference models/disparity_refinement.py:65-113). ``RefinePretrained`` is
the weight-layout of Niklaus's released refinement net — identical topology
but its Basic blocks carry residual shortcuts
(models/disparity_refinement_pretrained.py:25-41, selected by
``--pretrained-refine``, utils/pipeline.py:37-40).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from kbe_tpu.models.layers import (
    Basic,
    Downsample,
    Upsample,
    denormalize_sample,
    normalize_sample,
)

Dtype = Any


class _RefineCore(nn.Module):
    residual_basics: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, disparity: jax.Array) -> jax.Array:
        res = self.residual_basics
        dt = self.dtype
        img, img_stats = normalize_sample(image)
        disp, disp_stats = normalize_sample(disparity)

        img = img.astype(dt)
        disp = disp.astype(dt)

        im1 = Basic("conv-relu-conv", (3, 24, 24), residual=res, dtype=dt,
                    name="image_one")(img)
        im2 = Downsample((24, 48, 48), dtype=dt, name="image_two")(im1)
        im3 = Downsample((48, 96, 96), dtype=dt, name="image_thr")(im2)

        up = Basic("conv-relu-conv", (1, 96, 96), residual=res, dtype=dt,
                   name="disparity_one")(disp)
        up = Upsample((192, 96, 96), dtype=dt, name="disparity_two")(
            jnp.concatenate([im3, up], axis=-1))
        up = Upsample((144, 48, 48), dtype=dt, name="disparity_thr")(
            jnp.concatenate([im2, up], axis=-1))
        up = Basic("conv-relu-conv", (72, 24, 24), residual=res, dtype=dt,
                   name="disparity_fou")(jnp.concatenate([im1, up], axis=-1))

        out = Basic("conv-relu-conv", (24, 24, 1), residual=res, dtype=dt,
                    name="refine")(up)
        return denormalize_sample(out.astype(jnp.float32), disp_stats)


class Refine(nn.Module):
    """Base refinement net (shortcut-free Basic blocks)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, disparity: jax.Array) -> jax.Array:
        return _RefineCore(residual_basics=False, dtype=self.dtype,
                           name="core")(image, disparity)


class RefinePretrained(nn.Module):
    """Released-checkpoint-compatible refinement net (residual Basics)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, disparity: jax.Array) -> jax.Array:
        return _RefineCore(residual_basics=True, dtype=self.dtype,
                           name="core")(image, disparity)
