"""InceptionV3 feature extractor for FID (through Mixed_7c, 2048-d).

Flax re-implementation of the torchvision InceptionV3 trunk the reference
uses for FID (utils/fid.py:31-60: Mixed_7c output, adaptive-avg-pooled to
2048 features). Batch-norm is folded into the convs at weight-conversion
time (eval-only network), so each unit is conv+ReLU. Input: (B, 299, 299,
3) in [0, 1]; the [-1, 1] rescale and torchvision's ``transform_input``
re-normalization happen inside.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvUnit(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=((ph, ph), (pw, pw)), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        return nn.relu(x)


def _max_pool3(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avg_pool3_same(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b1 = ConvUnit(64, (1, 1), dtype=dt, name="b1x1")(x)
        b5 = ConvUnit(48, (1, 1), dtype=dt, name="b5x5_1")(x)
        b5 = ConvUnit(64, (5, 5), padding=(2, 2), dtype=dt,
                      name="b5x5_2")(b5)
        b3 = ConvUnit(64, (1, 1), dtype=dt, name="b3x3dbl_1")(x)
        b3 = ConvUnit(96, (3, 3), padding=(1, 1), dtype=dt,
                      name="b3x3dbl_2")(b3)
        b3 = ConvUnit(96, (3, 3), padding=(1, 1), dtype=dt,
                      name="b3x3dbl_3")(b3)
        bp = ConvUnit(self.pool_features, (1, 1), dtype=dt,
                      name="bpool")(_avg_pool3_same(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b3 = ConvUnit(384, (3, 3), stride=2, dtype=dt, name="b3x3")(x)
        bd = ConvUnit(64, (1, 1), dtype=dt, name="b3x3dbl_1")(x)
        bd = ConvUnit(96, (3, 3), padding=(1, 1), dtype=dt,
                      name="b3x3dbl_2")(bd)
        bd = ConvUnit(96, (3, 3), stride=2, dtype=dt, name="b3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3(x)], axis=-1)


class InceptionC(nn.Module):
    channels7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt, c7 = self.dtype, self.channels7
        b1 = ConvUnit(192, (1, 1), dtype=dt, name="b1x1")(x)
        b7 = ConvUnit(c7, (1, 1), dtype=dt, name="b7x7_1")(x)
        b7 = ConvUnit(c7, (1, 7), padding=(0, 3), dtype=dt,
                      name="b7x7_2")(b7)
        b7 = ConvUnit(192, (7, 1), padding=(3, 0), dtype=dt,
                      name="b7x7_3")(b7)
        bd = ConvUnit(c7, (1, 1), dtype=dt, name="b7x7dbl_1")(x)
        bd = ConvUnit(c7, (7, 1), padding=(3, 0), dtype=dt,
                      name="b7x7dbl_2")(bd)
        bd = ConvUnit(c7, (1, 7), padding=(0, 3), dtype=dt,
                      name="b7x7dbl_3")(bd)
        bd = ConvUnit(c7, (7, 1), padding=(3, 0), dtype=dt,
                      name="b7x7dbl_4")(bd)
        bd = ConvUnit(192, (1, 7), padding=(0, 3), dtype=dt,
                      name="b7x7dbl_5")(bd)
        bp = ConvUnit(192, (1, 1), dtype=dt,
                      name="bpool")(_avg_pool3_same(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b3 = ConvUnit(192, (1, 1), dtype=dt, name="b3x3_1")(x)
        b3 = ConvUnit(320, (3, 3), stride=2, dtype=dt, name="b3x3_2")(b3)
        b7 = ConvUnit(192, (1, 1), dtype=dt, name="b7x7x3_1")(x)
        b7 = ConvUnit(192, (1, 7), padding=(0, 3), dtype=dt,
                      name="b7x7x3_2")(b7)
        b7 = ConvUnit(192, (7, 1), padding=(3, 0), dtype=dt,
                      name="b7x7x3_3")(b7)
        b7 = ConvUnit(192, (3, 3), stride=2, dtype=dt, name="b7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b1 = ConvUnit(320, (1, 1), dtype=dt, name="b1x1")(x)
        b3 = ConvUnit(384, (1, 1), dtype=dt, name="b3x3_1")(x)
        b3a = ConvUnit(384, (1, 3), padding=(0, 1), dtype=dt,
                       name="b3x3_2a")(b3)
        b3b = ConvUnit(384, (3, 1), padding=(1, 0), dtype=dt,
                       name="b3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvUnit(448, (1, 1), dtype=dt, name="b3x3dbl_1")(x)
        bd = ConvUnit(384, (3, 3), padding=(1, 1), dtype=dt,
                      name="b3x3dbl_2")(bd)
        bda = ConvUnit(384, (1, 3), padding=(0, 1), dtype=dt,
                       name="b3x3dbl_3a")(bd)
        bdb = ConvUnit(384, (3, 1), padding=(1, 0), dtype=dt,
                       name="b3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = ConvUnit(192, (1, 1), dtype=dt,
                      name="bpool")(_avg_pool3_same(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """(B, 299, 299, 3) in [0, 1] -> (B, 2048) Mixed_7c pooled features."""

    dtype: Dtype = jnp.float32
    transform_input: bool = True

    @nn.compact
    def __call__(self, x):
        x = x * 2.0 - 1.0  # utils/fid.py:53
        if self.transform_input:
            # torchvision transform_input re-normalization
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        dt = self.dtype
        x = x.astype(dt)
        x = ConvUnit(32, (3, 3), stride=2, dtype=dt, name="Conv2d_1a")(x)
        x = ConvUnit(32, (3, 3), dtype=dt, name="Conv2d_2a")(x)
        x = ConvUnit(64, (3, 3), padding=(1, 1), dtype=dt,
                     name="Conv2d_2b")(x)
        x = _max_pool3(x)
        x = ConvUnit(80, (1, 1), dtype=dt, name="Conv2d_3b")(x)
        x = ConvUnit(192, (3, 3), dtype=dt, name="Conv2d_4a")(x)
        x = _max_pool3(x)
        x = InceptionA(32, dtype=dt, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=dt, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=dt, name="Mixed_5d")(x)
        x = InceptionB(dtype=dt, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=dt, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=dt, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=dt, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=dt, name="Mixed_6e")(x)
        x = InceptionD(dtype=dt, name="Mixed_7a")(x)
        x = InceptionE(dtype=dt, name="Mixed_7b")(x)
        x = InceptionE(dtype=dt, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to (1, 1)
        return x.astype(jnp.float32)
