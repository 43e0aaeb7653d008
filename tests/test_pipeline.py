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


def test_autozoom_returns_valid_window():
    from kbe_tpu.config import CameraConfig, ZoomWindow
    from kbe_tpu.ops.geometry import depth_range, depth_to_points
    from kbe_tpu.pipeline.autozoom import autozoom

    h = w = 32
    cam = CameraConfig(focal=32.0, baseline=10.0)
    depth = np.full((h, w), 20.0, np.float32)
    depth[8:20, 8:20] = 10.0
    pts = np.asarray(depth_to_points(jnp.asarray(depth)[None],
                                     cam.focal)).reshape(1, -1, 3)
    img = np.random.default_rng(0).uniform(0, 1, (1, h, w, 3)).astype(
        np.float32)
    anchor = depth_range(jnp.asarray(depth), margin=4)
    win = ZoomWindow(16.0, 16.0, 28, 28)
    out = autozoom(jnp.asarray(pts), jnp.asarray(img), win, 1.25, 3.0,
                   anchor, cam, grid=4, batch=4)
    assert out.crop_width == round(28 / 1.25)
    assert 0 <= out.center_u <= w and 0 <= out.center_v <= h


def test_receptive_field_summary():
    from kbe_tpu.utils.receptive_field import (LayerSpec, disparity_layers,
                                               net_summary)

    infos = net_summary(disparity_layers(), 512, verbose=False)
    # stem + 5 downsamples halve six times: 512 -> 8
    assert infos[-1].n_features == 8
    # receptive field grows monotonically
    rs = [i.receptive for i in infos]
    assert all(b >= a for a, b in zip(rs, rs[1:]))
    # single conv sanity: k3 s1 p1 keeps size, receptive 3
    one = net_summary([LayerSpec("c", 3, 1, 1)], 64, verbose=False)
    assert one[0].n_features == 64 and one[0].receptive == 3


def test_effect_dual_net_inpaint_depth():
    pipe = KenBurnsPipeline.create(
        jax.random.PRNGKey(0), 64, 64,
        effect=EffectConfig(num_steps=2, fill_march_steps=8),
        inpaint_depth=True)
    frames = pipe(_image(64, 64))
    assert frames.shape == (2, 64, 64, 3)
