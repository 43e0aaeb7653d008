"""The grid-net family: one parameterized lattice covers both the depth
estimator and the inpainting network.

The reference builds the same 4-column residual lattice twice — a 6-row
version for depth (models/disparity_estimation.py:119-198) and a 4-row
version for inpainting (models/pointcloud_inpainting.py:83-183) — through
string-keyed ``add_module`` calls. Here the lattice is a single Flax module:

  column 0:  stem output propagated down the rows via Downsample links
  column 1:  top-down — per-row Basic, plus a Downsample link from the
             updated row above
  columns 2..3: bottom-up — per-row Basic, plus an Upsample link from the
             updated row below (cropped for odd sizes, the reference's
             negative-pad trick)

Module naming is systematic (blk{r}x{c}, down{r}x{c}, up{r}x{c}) so torch
checkpoints map over mechanically (see utils/torch_convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kbe_tpu.models.layers import (
    Basic,
    Downsample,
    PReLU,
    Upsample,
    _conv,
    crop_to,
    denormalize_sample,
    normalize_sample,
)

Dtype = Any


class GridLattice(nn.Module):
    """Columns 1..3 of the grid net, given the finished column 0."""

    rows: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, column: list) -> jax.Array:
        rows = self.rows
        n = len(rows)

        # column 1: top-down with downsample injections
        col = 1
        out = list(column)
        for r in range(n):
            out[r] = Basic("relu-conv-relu-conv", (rows[r], rows[r], rows[r]),
                           dtype=self.dtype, name=f"blk{r}x{col}")(out[r])
            if r != 0:
                out[r] = out[r] + Downsample(
                    (rows[r - 1], rows[r], rows[r]), dtype=self.dtype,
                    name=f"down{r}x{col}")(out[r - 1])

        # columns 2, 3: bottom-up with upsample injections
        for col in (2, 3):
            for r in range(n - 1, -1, -1):
                out[r] = Basic("relu-conv-relu-conv",
                               (rows[r], rows[r], rows[r]), dtype=self.dtype,
                               name=f"blk{r}x{col}")(out[r])
                if r != n - 1:
                    up = Upsample((rows[r + 1], rows[r], rows[r]),
                                  dtype=self.dtype,
                                  name=f"up{r}x{col}")(out[r + 1])
                    up = crop_to(up, out[r].shape[1], out[r].shape[2])
                    out[r] = out[r] + up
        return out[0]


class Disparity(nn.Module):
    """Grid-net depth (disparity) estimator.

    Rows (32, 48, 64, 512, 512, 512) at 1/2..1/64 of the input resolution;
    the image enters through a 7x7 stride-2 stem and VGG semantics are
    injected additively at row 3 (1/16 res). Output: 1-channel disparity at
    half the input resolution. Reference models/disparity_estimation.py:
    119-198.

    Inputs NHWC: ``image`` (B, H, W, 3), ``semantics`` (B, H/16, W/16, 512).
    """

    dtype: Dtype = jnp.float32
    rows: Tuple[int, ...] = (32, 48, 64, 512, 512, 512)

    @nn.compact
    def __call__(self, image: jax.Array, semantics: jax.Array) -> jax.Array:
        x = image.astype(self.dtype)
        stem = nn.Conv(self.rows[0], (7, 7), strides=(2, 2),
                       padding=((3, 3), (3, 3)), dtype=self.dtype,
                       param_dtype=jnp.float32, name="stem_image")(x)
        # projects the 512-ch VGG semantics onto row 3 (rows[3] == 512 for
        # the reference architecture; narrow test lattices project down)
        sem = _conv(self.rows[3], dtype=self.dtype,
                    name="stem_semantics")(semantics.astype(self.dtype))

        column = [stem]
        for r in range(1, len(self.rows)):
            column.append(
                Downsample((self.rows[r - 1], self.rows[r], self.rows[r]),
                           dtype=self.dtype, name=f"down{r}x0")(column[-1]))
            if r == 3:
                column[r] = column[r] + sem

        top = GridLattice(self.rows, dtype=self.dtype,
                          name="lattice")(column)
        disp = Basic("conv-relu-conv", (self.rows[0], self.rows[0], 1),
                     dtype=self.dtype, name="head")(top)
        return disp.astype(jnp.float32)


class Inpaint(nn.Module):
    """Grid-net disocclusion inpainter with color + disparity heads.

    Rows (32, 64, 128, 256); input is cat(image3, disparity1, context64,
    mask1) = 69 channels; two heads share the top row. Reference
    models/pointcloud_inpainting.py:83-183.

    The per-sample normalize/denormalize and the point-cloud-render flow
    around this module live in ``kbe_tpu.pipeline.inpaint_flow`` (they are
    stateful in the reference — normalize_images_disp stores stats on the
    module, models/pointcloud_inpainting.py:217-236 — and functional here).
    """

    dtype: Dtype = jnp.float32
    rows: Tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, data: jax.Array, masks: jax.Array,
                 clamp_image: bool = True):
        """``data``: (B, H, W, 68) normalized (img, disp, context);
        ``masks``: (B, H, W, 1). Returns (image, disparity) in normalized
        space — callers denormalize; the image is clamped to [0, 1] *after*
        denorm at eval (handled by the caller, matching
        models/pointcloud_inpainting.py:179)."""
        x = jnp.concatenate([data, masks], axis=-1).astype(self.dtype)
        column = [Basic("conv-relu-conv",
                        (x.shape[-1], self.rows[0], self.rows[0]),
                        dtype=self.dtype, name="stem")(x)]
        for r in range(1, len(self.rows)):
            column.append(
                Downsample((self.rows[r - 1], self.rows[r], self.rows[r]),
                           dtype=self.dtype, name=f"down{r}x0")(column[-1]))

        top = GridLattice(self.rows, dtype=self.dtype,
                          name="lattice")(column)
        image = Basic("conv-relu-conv", (self.rows[0], self.rows[0], 3),
                      dtype=self.dtype, name="head_image")(top)
        disparity = Basic("conv-relu-conv", (self.rows[0], self.rows[0], 1),
                          dtype=self.dtype, name="head_disparity")(top)
        return image.astype(jnp.float32), disparity.astype(jnp.float32)


class ContextNet(nn.Module):
    """The 64-channel context extractor feeding the inpainting render
    payload (reference models/pointcloud_inpainting.py:89-94)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, disparity: jax.Array) -> jax.Array:
        x = jnp.concatenate([image, disparity], axis=-1).astype(self.dtype)
        h = _conv(64, dtype=self.dtype, name="conv1")(x)
        h = PReLU(64, name="prelu1")(h)
        h = _conv(64, dtype=self.dtype, name="conv2")(h)
        h = PReLU(64, name="prelu2")(h)
        return h.astype(jnp.float32)
