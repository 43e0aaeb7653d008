"""Fréchet Inception Distance.

Replaces the reference's vendored torch FID (utils/fid.py:31-233):
InceptionV3 Mixed_7c activations (2048-d, Flax module on TPU), activation
statistics, and the Fréchet distance. The matrix square root uses
scipy.linalg.sqrtm when available (numerical parity with the reference)
with a jnp Newton-Schulz fallback.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.models.inception import InceptionV3Features


def preprocess_images(images: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) float [0, 1] -> (N, 299, 299, 3).

    The reference resizes with cv2.resize INTER_LINEAR (utils/fid.py:
    169-194); ops/resize.resize_bilinear reproduces cv2's sampling
    (area-offset half-pixel centers, cv2-parity-tested), device-side."""
    from kbe_tpu.ops.resize import resize_bilinear

    x = jnp.asarray(images, jnp.float32)
    return np.asarray(resize_bilinear(x, 299, 299))


class FID:
    """Activation computation + Fréchet distance."""

    def __init__(self, params=None, rng: Optional[jax.Array] = None,
                 dtype=jnp.float32):
        self.module = InceptionV3Features(dtype=dtype)
        if params is None:
            # Random features still give a valid (if less meaningful)
            # embedding; converted torchvision weights restore parity.
            params = self.module.init(
                rng if rng is not None else jax.random.PRNGKey(0),
                jnp.zeros((1, 299, 299, 3)))
        self.params = params
        self._apply = jax.jit(self.module.apply)

    def activations(self, images: np.ndarray,
                    batch_size: int = 16) -> np.ndarray:
        """(N, H, W, 3) in [0, 1] -> (N, 2048)."""
        images = preprocess_images(images)
        outs = []
        for i in range(0, images.shape[0], batch_size):
            outs.append(np.asarray(
                self._apply(self.params,
                            jnp.asarray(images[i:i + batch_size]))))
        acts = np.concatenate(outs, axis=0)
        assert acts.shape == (images.shape[0], 2048)
        return acts

    @staticmethod
    def activation_statistics(acts: np.ndarray):
        mu = np.mean(acts, axis=0)
        sigma = np.cov(acts, rowvar=False)
        return mu, sigma

    @staticmethod
    def frechet_distance(mu1, sigma1, mu2, sigma2,
                         eps: float = 1e-6) -> float:
        """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
        mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
        sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
        diff = mu1 - mu2
        covmean = _sqrtm(sigma1 @ sigma2)
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                     - 2.0 * np.trace(covmean))

    def fid(self, real_images: np.ndarray, fake_images: np.ndarray,
            batch_size: int = 16) -> float:
        a1 = self.activations(real_images, batch_size)
        a2 = self.activations(fake_images, batch_size)
        mu1, s1 = self.activation_statistics(a1)
        mu2, s2 = self.activation_statistics(a2)
        return self.frechet_distance(mu1, s1, mu2, s2)


def _sqrtm(mat: np.ndarray) -> np.ndarray:
    try:
        from scipy import linalg

        out, _ = linalg.sqrtm(mat, disp=False)
        return out
    except Exception:
        return np.asarray(_newton_schulz_sqrtm(jnp.asarray(mat)))


def _newton_schulz_sqrtm(a: jax.Array, iters: int = 40) -> jax.Array:
    """Newton-Schulz iteration for the principal matrix square root
    (TPU-friendly: matmuls only)."""
    dim = a.shape[0]
    norm = jnp.linalg.norm(a)
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (eye3 - z @ y)
        return y @ t, t @ z

    y, _ = jax.lax.fori_loop(0, iters, body, (y, z))
    return y * jnp.sqrt(norm)
