"""Discriminator family for adversarial inpainting training.

Five discriminators mirroring reference models/discriminator.py:
  Discriminator                      — PatchGAN, 4x4 stride-2 convs (:49-85)
  PerceptualDiscriminator            — frozen VGG16 features -> convs (:88-122)
  MultiScalePerceptualDiscriminator  — 3 heads over VGG+conv pyramids (:125-169)
  MultiScaleDiscriminator            — 3 heads, no VGG (:171-210)
  MPDDiscriminator                   — (image, disparity) 4-channel input;
                                       the one used in training (:214-258,
                                       training/train_inpaint.py:84)

All use the LSGAN MSE objective via ``adversarial_loss``. Spectral
normalization is a constructor flag (the reference toggles it structurally
at runtime, utils/utils.py:176-186; in Flax it is part of the module
definition and its power-iteration state lives in 'batch_stats').
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kbe_tpu.models.vgg import VGG16Features

Dtype = Any


class ConvBlock(nn.Module):
    """4x4 conv (+BN) + LeakyReLU(0.2)
    (reference models/discriminator.py:8-26)."""

    features: int
    stride: int = 2
    dilation: int = 1
    use_bn: bool = True
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features, (4, 4),
                       strides=(self.stride, self.stride),
                       padding=((1, 1), (1, 1)),
                       kernel_dilation=(self.dilation, self.dilation),
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")
        if self.spectral_norm:
            x = nn.SpectralNorm(conv)(x, update_stats=train)
        else:
            x = conv(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, 0.2)


class VGGBlock(nn.Module):
    """2-3 conv + LeakyReLU stack + avg pool
    (reference models/discriminator.py:28-47)."""

    features: int
    small: bool = True
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = 2 if self.small else 3
        for i in range(n):
            conv = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=f"conv{i}")
            if self.spectral_norm:
                x = nn.SpectralNorm(conv)(x, update_stats=train)
            else:
                x = conv(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Discriminator(nn.Module):
    """PatchGAN head. Default: 32-64-128-256 stride-2 pyramid; or custom
    (channels, dilation, stride) stacks used as sub-heads by the
    multi-scale discriminators."""

    channels: Optional[Tuple[int, ...]] = None
    dilation: Optional[Tuple[int, ...]] = None
    stride: Optional[Tuple[int, ...]] = None
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.channels is None:
            specs = [(32, 2, 1, False), (64, 2, 1, True),
                     (128, 2, 1, True), (256, 2, 1, True)]
            out_ch = 256
        else:
            specs = [(self.channels[i + 1], self.stride[i], self.dilation[i],
                      True) for i in range(len(self.channels) - 1)]
            out_ch = self.channels[-1]
        for i, (feat, st, dil, bn) in enumerate(specs):
            x = ConvBlock(feat, stride=st, dilation=dil, use_bn=bn,
                          spectral_norm=self.spectral_norm, dtype=self.dtype,
                          name=f"block{i}")(x, train=train)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       param_dtype=jnp.float32, name="out")(x)


class PerceptualDiscriminator(nn.Module):
    """Frozen VGG16 slice-3 features -> 3 ConvBlocks -> patch logits."""

    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = True):
        feats = VGG16Features(dtype=self.dtype, name="vgg")(image)
        h = feats[-1]
        for i in range(3):
            h = ConvBlock(256, spectral_norm=self.spectral_norm,
                          dtype=self.dtype, name=f"block{i}")(h, train=train)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       param_dtype=jnp.float32, name="out")(h)


class _MultiScaleCore(nn.Module):
    """Shared 3-head pyramid of the multi-scale discriminators."""

    use_vgg: bool
    in_small: int  # features of ConvBlock0
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vgg_input=None, train: bool = True):
        sn, dt = self.spectral_norm, self.dtype
        if self.use_vgg:
            f1, f2, f3 = VGG16Features(dtype=dt, name="vgg")(vgg_input)
            h1 = VGGBlock(64, spectral_norm=sn, dtype=dt,
                          name="pyr0")(x, train=train)
            h2 = VGGBlock(128, spectral_norm=sn, dtype=dt, name="pyr1")(
                jnp.concatenate([f1, h1], -1), train=train)
            h3 = VGGBlock(256, small=False, spectral_norm=sn, dtype=dt,
                          name="pyr2")(jnp.concatenate([f2, h2], -1),
                                       train=train)
            local1_in = jnp.concatenate([f2, h2], -1)
            local2_in = jnp.concatenate([f3, h3], -1)
            main_in = local2_in
            chans = ((256, 256, 256), (512, 256, 256), (512, 256, 256, 256))
        else:
            h1 = VGGBlock(64, spectral_norm=sn, dtype=dt,
                          name="pyr0")(x, train=train)
            h2 = VGGBlock(128, spectral_norm=sn, dtype=dt,
                          name="pyr1")(h1, train=train)
            h3 = VGGBlock(256, small=False, spectral_norm=sn, dtype=dt,
                          name="pyr2")(h2, train=train)
            local1_in, local2_in, main_in = h2, h3, h3
            chans = ((128, 256, 256), (256, 256, 256), (256, 256, 256, 256))

        p1 = Discriminator(chans[0], (1, 1), (1, 1), spectral_norm=sn,
                           dtype=dt, name="local1")(local1_in, train=train)
        p2 = Discriminator(chans[1], (1, 1), (2, 1), spectral_norm=sn,
                           dtype=dt, name="local2")(local2_in, train=train)
        pm = Discriminator(chans[2], (8, 4, 1), (1, 1, 1), spectral_norm=sn,
                           dtype=dt, name="main")(main_in, train=train)
        return [nn.sigmoid(p1), nn.sigmoid(p2), nn.sigmoid(pm)]


class MultiScalePerceptualDiscriminator(nn.Module):
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = True):
        return _MultiScaleCore(True, 64, self.spectral_norm, self.dtype,
                               name="core")(image, vgg_input=image,
                                            train=train)


class MultiScaleDiscriminator(nn.Module):
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = True):
        return _MultiScaleCore(False, 64, self.spectral_norm, self.dtype,
                               name="core")(image, train=train)


class MPDDiscriminator(nn.Module):
    """Multi-scale perceptual discriminator over (image, disparity) —
    the adversarial trainer's discriminator
    (reference models/discriminator.py:214-258)."""

    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, disparity, train: bool = True):
        x = jnp.concatenate([image, disparity], axis=-1)
        return _MultiScaleCore(True, 64, self.spectral_norm, self.dtype,
                               name="core")(x, vgg_input=image, train=train)


def adversarial_loss(predictions, is_real: bool) -> jax.Array:
    """LSGAN MSE loss vs all-ones/all-zeros labels, averaged over heads
    (reference models/discriminator.py:77-85, 247-258)."""
    preds = predictions if isinstance(predictions, (list, tuple)) else [
        predictions]
    target = 1.0 if is_real else 0.0
    loss = sum(jnp.mean((p - target) ** 2) for p in preds)
    return loss / len(preds)
