"""End-to-end pipeline smoke tests (small sizes; CPU backend)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbe_tpu import CameraConfig, EffectConfig, ZoomSettings, ZoomWindow
from kbe_tpu.pipeline import KenBurnsPipeline, write_video
from kbe_tpu.pipeline.kenburns import compute_pose_shift


def _image(h, w):
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.linspace(0, 1, w)[None, :]
    img[..., 2] = 0.6
    img[h // 3:2 * h // 3, w // 3:2 * w // 3] = [0.1, 0.9, 0.2]
    return img


@pytest.fixture(scope="module")
def pipe():
    return KenBurnsPipeline.create(
        jax.random.PRNGKey(0), 64, 64,
        effect=EffectConfig(num_steps=3, fill_march_steps=16))


def test_effect_end_to_end(pipe):
    frames = pipe(_image(64, 64))
    assert frames.shape == (3, 64, 64, 3)
    assert frames.dtype == np.uint8
    assert frames.max() > 0
    # frames differ across the move
    assert np.any(frames[0] != frames[-1])


def test_effect_2d_mode():
    pipe = KenBurnsPipeline.create(
        jax.random.PRNGKey(0), 64, 64,
        effect=EffectConfig(num_steps=2, two_d=True, fill_march_steps=8))
    frames = pipe(_image(64, 64))
    assert frames.shape == (2, 64, 64, 3)


def test_effect_dolly_mode():
    pipe = KenBurnsPipeline.create(
        jax.random.PRNGKey(0), 64, 64,
        effect=EffectConfig(num_steps=2, dolly=True, fill_march_steps=8))
    frames = pipe(_image(64, 64))
    assert frames.shape == (2, 64, 64, 3)


def test_pose_shift_endpoints():
    zoom = ZoomSettings(ZoomWindow(30.0, 30.0, 56, 56),
                        ZoomWindow(34.0, 34.0, 48, 48))
    camera = CameraConfig(focal=32.0, baseline=10.0)
    anchor = (jnp.float32(20.0), jnp.float32(10.0), jnp.float32(12.0))
    s0 = np.asarray(compute_pose_shift(0.0, 32.0, anchor, zoom, camera,
                                       64, 64))
    s1 = np.asarray(compute_pose_shift(1.0, 32.0, anchor, zoom, camera,
                                       64, 64))
    assert s0.shape == (3,)
    # z shift: depth_to - depth_from = dmin*(cw/max_cw) - dmin
    np.testing.assert_allclose(s0[2], 0.0, atol=1e-5)  # cw == max_cw at s=0
    np.testing.assert_allclose(s1[2], 20.0 * (48 / 56) - 20.0, rtol=1e-5)


def test_video_writer(tmp_path):
    frames = np.zeros((4, 32, 32, 3), np.uint8)
    out = write_video(frames, str(tmp_path / "v.mp4"), fps=4)
    assert os.path.exists(out)


def test_rejects_non_multiple_of_4():
    pipe = KenBurnsPipeline.create(
        jax.random.PRNGKey(0), 64, 64, effect=EffectConfig(num_steps=2))
    with pytest.raises(ValueError):
        pipe(_image(66, 64))
