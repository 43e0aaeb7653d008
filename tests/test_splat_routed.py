"""Golden tests: routed CSR Pallas renderer vs the scatter spec.

Runs in interpret mode on the CPU backend (tests/conftest.py). The scenes
exercise multi-grid clouds, sparse validity masks, degrid-average z-test
ties (the 1e6-magnitude rounding paths), and the overflow fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

# interpret-mode compiles+runs of the CSR one-hot kernel take minutes
# apiece on a 1-core host; the fast tier pins splat semantics via the
# scatter spec (test_ops) + the small banded goldens + the pipeline
# smoke; _scene/_scatter stay importable for the sibling golden files
pytestmark = pytest.mark.slow

from kbe_tpu.ops.geometry import depth_to_points
from kbe_tpu.ops.splat import render_pointcloud
from kbe_tpu.ops.splat_routed import render_grids_fast, render_grids_routed


def _scene(h, w, focal, seed=0, shift=(3.7, -2.2, 12.0)):
    rng = np.random.default_rng(seed)
    depth1 = (200.0 + 30.0 * np.sin(np.linspace(0, 6, h))[:, None]
              + 10.0 * np.cos(np.linspace(0, 9, w))[None, :])
    depth2 = np.where(rng.uniform(size=(h, w)) > 0.4, 80.0, 0.0)
    valid = np.stack([np.ones((h, w)), depth2 > 0]).astype(np.float32)
    depth2 = np.maximum(depth2, 1.0)

    def d2p(d):
        return np.asarray(depth_to_points(jnp.asarray(d)[None], focal)[0])

    xyz = np.stack([d2p(depth1), d2p(depth2)]) + np.asarray(shift)
    data = rng.uniform(0, 1, (2, h, w, 4)).astype(np.float32)
    return (jnp.asarray(xyz, jnp.float32), jnp.asarray(data),
            jnp.asarray(valid))


def _scatter(xyz, data, valid, h, w, focal, baseline):
    g = xyz.shape[0]
    return render_pointcloud(
        xyz.reshape(1, -1, 3), data.reshape(1, g * h * w, -1), h, w, focal,
        baseline, valid=valid.reshape(1, -1), method="scatter")


def test_routed_matches_scatter():
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal)
    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_routed(xyz, data, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-5)


def test_routed_small_image_and_z_shift():
    # width < TILE_W exercises padding; a negative z shift exercises the
    # degrid-average rounding (z-test ties at the +1.0 boundary).
    h, w, focal, baseline = 64, 64, 512.0, 120.0
    xyz, data, valid = _scene(h, w, focal, seed=3,
                              shift=(-2.5, 2.7, -28.0))
    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_routed(xyz, data, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)


def test_routed_overflow_falls_back_to_scatter():
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=1)
    _, _, ovf = render_grids_routed(xyz, data, h, w, focal, baseline,
                                    valid=valid, capacity_factor=1)
    assert bool(ovf)
    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e = render_grids_fast(xyz, data, h, w, focal, baseline,
                                     valid=valid, capacity_factor=1,
                                     fallback="scatter")
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-5)


def test_routed_all_invalid_empty_render():
    h, w, focal, baseline = 32, 128, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=2)
    got_r, got_e, ovf = render_grids_routed(
        xyz, data, h, w, focal, baseline,
        valid=jnp.zeros_like(valid))
    assert not bool(ovf)
    assert float(jnp.max(got_e)) == 0.0
    assert float(jnp.max(jnp.abs(got_r))) == 0.0


def test_routed_wide_payload_matches_scatter():
    # the 68-channel inpainting-bootstrap payload path
    h, w, focal, baseline = 32, 128, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=4)
    rng = np.random.default_rng(5)
    wide = jnp.asarray(rng.uniform(0, 1, (2, h, w, 20)), jnp.float32)
    want_r, want_e = _scatter(xyz, wide, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_routed(xyz, wide, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)


def test_delta_matches_scatter():
    from kbe_tpu.ops.legacy.splat_delta import render_grids_delta

    for (h, w, shift, seed) in ((48, 256, (3.7, -2.2, 12.0), 0),
                                (64, 64, (-2.5, 2.7, -28.0), 3)):
        focal, baseline = (100.0, 40.0) if h == 48 else (512.0, 120.0)
        xyz, data, valid = _scene(h, w, focal, seed=seed, shift=shift)
        want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
        got_r, got_e, ovf = render_grids_delta(xyz, data, h, w, focal,
                                               baseline, valid=valid)
        assert not bool(ovf)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   atol=2e-4)
