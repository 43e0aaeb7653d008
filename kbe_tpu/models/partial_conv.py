"""Mask-aware (partial) convolutions and the partial-conv inpainting net.

Partial convolution (Liu et al., the recipe vendored by the reference at
utils/partial_conv.py:14-84): the conv only sees masked-in pixels; the
output is renormalized by ``window_size / mask_coverage`` and re-masked,
and the mask itself is propagated by an all-ones convolution. The reference
builds an alternative inpainting grid-net entirely from these
(models/partial_inpainting.py:99-223, selected by ``--partial-conv``),
with masks OR-merged (elementwise min) at every lattice junction.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from kbe_tpu.models.layers import PReLU, crop_to, upsample2x

Dtype = Any


class PartialConv(nn.Module):
    """Multi-channel partial convolution (NHWC).

    Returns (output, updated_mask); ``mask`` has the same channel count as
    the input (multi_channel=True in the reference,
    models/partial_inpainting.py:16).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None):
        in_ch = x.shape[-1]
        k, s = self.kernel, self.stride
        pad = k // 2
        if mask is None:
            mask = jnp.ones_like(x)
        window = float(in_ch * k * k)

        # Mask coverage via an all-ones conv (no gradient through the mask).
        ones_k = jnp.ones((k, k, in_ch, 1), x.dtype)
        coverage = lax.stop_gradient(
            lax.conv_general_dilated(
                mask.astype(x.dtype), ones_k, (s, s),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        ratio = window / (coverage + 1e-8)
        new_mask = jnp.clip(coverage, 0.0, 1.0)
        ratio = ratio * new_mask

        conv = nn.Conv(self.features, (k, k), strides=(s, s),
                       padding=((pad, pad), (pad, pad)), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")
        raw = conv(x * mask.astype(x.dtype))
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32).astype(raw.dtype)
        # torch applies (raw+bias-bias)*ratio + bias then re-masks
        # (utils/partial_conv.py:74-77); with the bias separated out that is:
        out = (raw * ratio + bias) * new_mask
        # Broadcast the single-channel coverage mask to the output width.
        return out, jnp.broadcast_to(new_mask, out.shape[:-1]
                                     + (self.features,))


class PBasic(nn.Module):
    """Partial-conv Basic block with residual shortcut
    (models/partial_inpainting.py:8-57)."""

    kind: str
    channels: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c0, c1, c2 = self.channels
        h = x
        if self.kind == "relu-conv-relu-conv":
            h = PReLU(c0, name="prelu1")(h)
        h, mask = PartialConv(c1, dtype=self.dtype, name="conv1")(h, mask)
        h = PReLU(c1, name="prelu2")(h)
        h, mask = PartialConv(c2, dtype=self.dtype, name="conv2")(h, mask)
        if c0 == c2:
            shortcut = x
        else:
            # 1x1 partial conv, mask not propagated (return_mask=False).
            shortcut, _ = PartialConv(c2, kernel=1, dtype=self.dtype,
                                      name="shortcut")(x, None)
        return h + shortcut, mask


class PDownsample(nn.Module):
    channels: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c0, c1, c2 = self.channels
        h = PReLU(c0, name="prelu1")(x)
        h, mask = PartialConv(c1, stride=2, dtype=self.dtype,
                              name="conv1")(h, mask)
        h = PReLU(c1, name="prelu2")(h)
        h, mask = PartialConv(c2, dtype=self.dtype, name="conv2")(h, mask)
        return h, mask


class PUpsample(nn.Module):
    channels: Tuple[int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c0, c1, c2 = self.channels
        h = upsample2x(x)
        mask = (upsample2x(mask) > 0.5).astype(h.dtype)
        h = PReLU(c0, name="prelu1")(h)
        h, mask = PartialConv(c1, dtype=self.dtype, name="conv1")(h, mask)
        h = PReLU(c1, name="prelu2")(h)
        h, mask = PartialConv(c2, dtype=self.dtype, name="conv2")(h, mask)
        return h, mask


class PartialInpaint(nn.Module):
    """Partial-conv inpainting grid-net.

    Same 4-row lattice as ``Inpaint`` but every conv is mask-aware, the
    input is 68 channels (no explicit mask channel — the mask IS the conv
    mask, models/partial_inpainting.py:111), and lattice junctions OR-merge
    masks with elementwise min (models/partial_inpainting.py:167).
    Returns (image, disparity, existing_mask) in normalized space.
    """

    dtype: Dtype = jnp.float32
    rows: Tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, data: jax.Array, masks: jax.Array):
        rows = self.rows
        n = len(rows)
        mask0 = jnp.broadcast_to(masks, data.shape).astype(data.dtype)

        col, cmask = [None] * n, [None] * n
        col[0], cmask[0] = PBasic("conv-relu-conv",
                                  (data.shape[-1], rows[0], rows[0]),
                                  dtype=self.dtype, name="stem")(data, mask0)
        for r in range(1, n):
            col[r], cmask[r] = PDownsample(
                (rows[r - 1], rows[r], rows[r]), dtype=self.dtype,
                name=f"down{r}x0")(col[r - 1], cmask[r - 1])

        # column 1 top-down
        for r in range(n):
            col[r], cmask[r] = PBasic(
                "relu-conv-relu-conv", (rows[r], rows[r], rows[r]),
                dtype=self.dtype, name=f"blk{r}x1")(col[r], cmask[r])
            if r != 0:
                d, dm = PDownsample((rows[r - 1], rows[r], rows[r]),
                                    dtype=self.dtype,
                                    name=f"down{r}x1")(col[r - 1],
                                                       cmask[r - 1])
                col[r] = col[r] + d
                cmask[r] = jnp.minimum(cmask[r], dm)

        # columns 2, 3 bottom-up
        for c in (2, 3):
            for r in range(n - 1, -1, -1):
                col[r], cmask[r] = PBasic(
                    "relu-conv-relu-conv", (rows[r], rows[r], rows[r]),
                    dtype=self.dtype, name=f"blk{r}x{c}")(col[r], cmask[r])
                if r != n - 1:
                    u, um = PUpsample((rows[r + 1], rows[r], rows[r]),
                                      dtype=self.dtype,
                                      name=f"up{r}x{c}")(col[r + 1],
                                                         cmask[r + 1])
                    u = crop_to(u, col[r].shape[1], col[r].shape[2])
                    # Cropped-away mask rows count as valid (pad value 1.0,
                    # models/partial_inpainting.py:180) — cropping needs no
                    # special handling since we only remove rows.
                    um = crop_to(um, col[r].shape[1], col[r].shape[2])
                    col[r] = col[r] + u
                    cmask[r] = jnp.minimum(cmask[r], um)

        image, _ = PBasic("conv-relu-conv", (rows[0], rows[0], 3),
                          dtype=self.dtype, name="head_image")(col[0],
                                                               cmask[0])
        disparity, _ = PBasic("conv-relu-conv", (rows[0], rows[0], 1),
                              dtype=self.dtype,
                              name="head_disparity")(col[0], cmask[0])
        return (image.astype(jnp.float32), disparity.astype(jnp.float32),
                cmask[0][..., :1].astype(jnp.float32))
