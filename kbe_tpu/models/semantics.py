"""Frozen VGG19-bn semantic feature extractor.

The depth estimator conditions on VGG19-bn features of the first four conv
blocks (output 512 channels at 1/16 resolution), with BGR->RGB swap and
ImageNet normalization applied inside the forward
(reference models/disparity_estimation.py:82-117).

TPU-first choice: the network is frozen everywhere in the reference (used
under no_grad in training, training/train_depth.py:133-134), so batch-norm
runs in eval mode with fixed running stats — which folds exactly into the
preceding convolution. The weight converter (utils/torch_convert.py) does
that folding, and this module is a plain conv+PReLU-free conv/ReLU stack:
fewer ops, better XLA fusion, identical function.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kbe_tpu.models.layers import ceil_max_pool

Dtype = Any

# Conv widths per block of VGG19 through block 4.
_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256, 256),
    (512, 512, 512, 512),
)

_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


class Semantics(nn.Module):
    """VGG19-bn (BN folded) features at 1/16 resolution, 512 channels.

    ``image``: (B, H, W, 3) BGR in [0, 1] (cv2 channel order, matching the
    reference's in-forward swap) -> (B, H/16, W/16, 512).
    Set ``bgr_input=False`` when the image is already RGB
    (the ``--pretrained-estim`` path, kbe.py:97-98).
    """

    dtype: Dtype = jnp.float32
    bgr_input: bool = True

    @nn.compact
    def __call__(self, image: jax.Array) -> jax.Array:
        x = image[..., ::-1] if self.bgr_input else image
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        x = x.astype(self.dtype)
        for b, widths in enumerate(_BLOCKS):
            for i, wch in enumerate(widths):
                x = nn.Conv(wch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{b}_{i}")(x)
                x = nn.relu(x)
            x = ceil_max_pool(x)
        return x.astype(jnp.float32)
