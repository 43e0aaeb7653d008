"""Golden numerics for the L0/L1 ops vs torch (filters/geometry) and the
numpy kernel simulators (splat / discfill / visibility)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbe_tpu.ops import (
    crop_rect_subpix,
    depth_range,
    depth_to_points,
    fill_disocclusion,
    generate_mask,
    laplacian_filter,
    median_filter,
    render_pointcloud,
    resize_bilinear,
    solve_shift,
    validity_mask,
)
from kbe_tpu.ops.geometry import apply_shift
from tests import reference_sim as sim


def rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- filters


def torch_spatial_filter(x_nchw, kind):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x_nchw)
    if kind == "laplacian":
        c = t.size(1)
        k = torch.zeros(c, c, 3, 3)
        for i in range(c):
            k[i, i, 0, 1] = -1.0
            k[i, i, 0, 2] = -1.0
            k[i, i, 1, 1] = 4.0
            k[i, i, 1, 0] = -1.0
            k[i, i, 2, 0] = -1.0
        out = F.pad(t, [1, 1, 1, 1], mode="replicate")
        out = F.conv2d(out, k)
    else:
        size = int(kind.split("-")[1])
        p = size // 2
        out = F.pad(t, [p, p, p, p], mode="reflect")
        out = out.unfold(2, size, 1).unfold(3, size, 1)
        out = out.contiguous().view(*out.shape[:4], size * size)
        out = out.median(-1, False)[0]
    return out.numpy()


@pytest.mark.parametrize("kind", ["laplacian", "median-3", "median-5"])
def test_filters_match_torch(kind):
    x = rng(1).standard_normal((2, 13, 17, 1)).astype(np.float32)
    want = torch_spatial_filter(np.transpose(x, (0, 3, 1, 2)), kind)
    if kind == "laplacian":
        got = laplacian_filter(jnp.asarray(x))
    else:
        got = median_filter(jnp.asarray(x), int(kind.split("-")[1]))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5)


@pytest.mark.parametrize("size", [3, 5])
def test_median_filter_binary_matches_sort(size):
    from kbe_tpu.ops.filters import median_filter_binary

    x = (rng(7).uniform(size=(2, 21, 19, 1)) < 0.45).astype(np.float32)
    want = np.asarray(median_filter(jnp.asarray(x), size))
    got = np.asarray(median_filter_binary(jnp.asarray(x), size))
    np.testing.assert_array_equal(got, want)


def test_validity_mask_binary():
    x = rng(2).uniform(1.0, 40.0, (1, 16, 16, 1)).astype(np.float32)
    m = np.asarray(validity_mask(jnp.asarray(x)))
    assert set(np.unique(m)).issubset({0.0, 1.0})


# ---------------------------------------------------------------- geometry


def test_depth_to_points_matches_torch_linspace():
    import torch

    depth = rng(3).uniform(1.0, 50.0, (1, 6, 9)).astype(np.float32)
    focal = 7.5
    t = torch.from_numpy(depth).unsqueeze(1)
    hor = torch.linspace(-0.5 * 9 + 0.5, 0.5 * 9 - 0.5, 9).view(1, 1, 1, 9)
    ver = torch.linspace(-0.5 * 6 + 0.5, 0.5 * 6 - 0.5, 6).view(1, 1, 6, 1)
    want = torch.cat(
        [t * hor / focal, t * ver / focal, t], 1).numpy()
    got = np.asarray(depth_to_points(jnp.asarray(depth), focal))
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-5, atol=1e-5)


def test_depth_range_first_min_rowmajor():
    d = np.full((300, 300), 5.0, np.float32)
    d[150, 40] = 1.0
    d[150, 200] = 1.0  # duplicate min later in scan order
    mn, mu, mv = depth_range(jnp.asarray(d), margin=128)
    # cropped coords: (150-128, 40-128) is out of crop; min inside crop only
    # choose points inside crop:
    d2 = np.full((300, 300), 5.0, np.float32)
    d2[150, 140] = 1.0
    d2[150, 260] = 1.0
    mn, mu, mv = depth_range(jnp.asarray(d2), margin=128)
    assert float(mn) == 1.0
    assert float(mu) == 140 - 128 and float(mv) == 150 - 128


def test_solve_shift_matches_reference_formula():
    # reference utils/common.py:83-102 with plain python floats
    W, H, f = 64, 48, 32.0
    depth0, u0, v0 = 10.0, 5.0, 7.0
    sU, sV, dFrom, dTo = 3.0, -2.0, 10.0, 8.0
    closest = depth0 + (dTo - dFrom)
    fx = ((u0 - W / 2) * closest) / f
    fy = ((v0 - H / 2) * closest) / f
    tx = ((u0 + sU - W / 2) * closest) / f
    ty = ((v0 + sV - H / 2) * closest) / f
    want = np.array([fx - tx, fy - ty, dTo - dFrom], np.float32)
    got = np.asarray(
        solve_shift(sU, sV, dFrom, dTo, depth0, u0, v0, W, H, f))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_apply_shift_adds_vector():
    pts = rng(4).uniform(-5, 5, (2, 10, 3)).astype(np.float32)
    pts[..., 2] = np.abs(pts[..., 2]) + 1.0
    shift = np.array([1.0, -2.0, 3.0], np.float32)
    got = np.asarray(apply_shift(jnp.asarray(pts), jnp.asarray(shift)))
    np.testing.assert_allclose(got, pts + shift, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- splat


def _random_cloud(seed, n, h, w, focal):
    r = rng(seed)
    # points that mostly land inside the image
    z = r.uniform(5.0, 50.0, n).astype(np.float32)
    u = r.uniform(-3, w + 2, n).astype(np.float32)
    v = r.uniform(-3, h + 2, n).astype(np.float32)
    x = (u - 0.5 * w + 0.5) * z / focal
    y = (v - 0.5 * h + 0.5) * z / focal
    return np.stack([x, y, z], -1)


def test_render_matches_simulator():
    h, w, focal, baseline = 12, 16, 24.0, 30.0
    pts = _random_cloud(5, 400, h, w, focal)
    # a few degenerate points (z<0.001) must be dropped
    pts[:5, 2] = 0.0
    data = rng(6).uniform(0, 1, (400, 4)).astype(np.float32)
    want_img, want_wt = sim.render_pointcloud_sim(pts, data, h, w, focal,
                                                  baseline)
    got_img, got_wt = render_pointcloud(
        jnp.asarray(pts)[None], jnp.asarray(data)[None], h, w, focal,
        baseline)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_img)[0], (2, 0, 1)), want_img,
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_wt)[0, ..., 0], want_wt,
                               rtol=2e-4, atol=2e-4)


def test_render_valid_mask_drops_points():
    h, w, focal, baseline = 8, 8, 16.0, 10.0
    pts = _random_cloud(7, 100, h, w, focal)
    data = rng(8).uniform(0, 1, (100, 2)).astype(np.float32)
    valid = np.ones(100, np.float32)
    valid[50:] = 0.0
    want_img, want_wt = sim.render_pointcloud_sim(pts[:50], data[:50], h, w,
                                                  focal, baseline)
    got_img, got_wt = render_pointcloud(
        jnp.asarray(pts)[None], jnp.asarray(data)[None], h, w, focal,
        baseline, valid=jnp.asarray(valid)[None])
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_img)[0], (2, 0, 1)), want_img,
        rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- discfill


def test_fill_disocclusion_matches_simulator():
    h, w, c = 14, 18, 3
    r = rng(9)
    img = r.uniform(0, 1, (c, h, w)).astype(np.float32)
    depth = r.uniform(1.0, 9.0, (h, w)).astype(np.float32)
    # punch holes
    depth[4:8, 5:9] = 0.0
    depth[11, 2] = 0.0
    img[:, depth <= 0] = 0.0
    want = sim.fill_disocclusion_sim(img, depth)
    got = fill_disocclusion(
        jnp.asarray(np.transpose(img, (1, 2, 0)))[None],
        jnp.asarray(depth)[None, ..., None], steps=32)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got)[0], (2, 0, 1)), want, atol=1e-5)


def test_fill_disocclusion_all_holes_noop():
    # no valid pixels at all -> unchanged (no usable direction)
    img = np.ones((1, 6, 6, 2), np.float32) * 0.3
    depth = np.zeros((1, 6, 6, 1), np.float32)
    got = fill_disocclusion(jnp.asarray(img), jnp.asarray(depth), steps=8)
    np.testing.assert_allclose(np.asarray(got), img)


# ---------------------------------------------------------------- visibility


def test_generate_mask_matches_simulator():
    h, w, focal, baseline = 10, 12, 20.0, 15.0
    r = rng(11)
    depth = r.uniform(10.0, 30.0, (h, w)).astype(np.float32)
    pts = np.asarray(depth_to_points(jnp.asarray(depth)[None], focal))
    pts = pts.reshape(1, h * w, 3)
    shift = np.array([[2.0, 1.0, -3.0]], np.float32)
    want_flat = sim.generate_mask_sim(pts[0] + shift[0], h, w, focal,
                                      baseline)
    want = sim_median5(want_flat.reshape(h, w))
    got = generate_mask(jnp.asarray(pts), jnp.asarray(shift), h, w, focal,
                        baseline)
    np.testing.assert_allclose(np.asarray(got)[0, ..., 0], want, atol=1e-6)


def sim_median5(m):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(m)[None, None]
    out = F.pad(t, [2, 2, 2, 2], mode="reflect")
    out = out.unfold(2, 5, 1).unfold(3, 5, 1)
    out = out.contiguous().view(*out.shape[:4], 25)
    return out.median(-1, False)[0][0, 0].numpy()


# ---------------------------------------------------------------- resize


def test_resize_bilinear_matches_torch():
    import torch
    import torch.nn.functional as F

    x = rng(12).uniform(0, 1, (1, 10, 14, 3)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                         size=(7, 9), mode="bilinear",
                         align_corners=False).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), 7, 9))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=1e-5)


def test_crop_rect_subpix_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = rng(13).uniform(0, 255, (20, 24, 3)).astype(np.float32)
    want = cv2.getRectSubPix(img, (10, 8), (12.3, 9.7))
    got = np.asarray(crop_rect_subpix(jnp.asarray(img), 10, 8, 12.3, 9.7))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_crop_rect_subpix_mm_matches_gather():
    from kbe_tpu.ops.resize import crop_rect_subpix_mm

    img = rng(14).uniform(0, 255, (33, 41, 3)).astype(np.float32)
    # interior patch, border-replicating patch, and integer-centered patch
    for (pw, ph, cu, cv) in [(10, 8, 12.3, 9.7), (30, 28, 2.1, 31.9),
                             (16, 12, 20.0, 16.0)]:
        want = np.asarray(crop_rect_subpix(jnp.asarray(img), pw, ph, cu,
                                           cv))
        got = np.asarray(crop_rect_subpix_mm(jnp.asarray(img), pw, ph, cu,
                                             cv))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_relayout_identity_for_bf16_values():
    from kbe_tpu.ops.layout import relayout

    rng = np.random.default_rng(0)
    x32 = rng.uniform(-3, 3, (2, 16, 24, 68)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16).astype(jnp.float32)
    got = relayout(x)
    assert got.shape == x.shape and got.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))

