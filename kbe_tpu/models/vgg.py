"""VGG16 feature pyramid for perceptual losses and discriminators.

Three-slice VGG16 extractor (64ch @1/2, 128ch @1/4, 256ch @1/8) matching
the reference's vendored ``VGG16Partial`` with layer_num=3
(reference utils/utils.py:435-537). Note the reference feeds it raw
(un-ImageNet-normalized) images in both the inpainting loss
(utils/losses.py:110-116) and the discriminators — reproduced here.
Weights come from a converted torchvision vgg16 checkpoint; the module
also trains from scratch for self-contained runs.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class VGG16Features(nn.Module):
    """Returns [relu-pool features after blocks 1, 2, 3]."""

    dtype: Dtype = jnp.float32
    num_slices: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        widths = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512))
        outs = []
        h = x.astype(self.dtype)
        for b in range(self.num_slices):
            for i, wch in enumerate(widths[b]):
                h = nn.Conv(wch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{b}_{i}")(h)
                h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            outs.append(h.astype(jnp.float32))
        return outs
