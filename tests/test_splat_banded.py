"""Golden tests: banded static-residual Pallas renderer vs the scatter
spec (interpret mode, CPU backend)."""

import numpy as np
import jax.numpy as jnp

from kbe_tpu.ops.geometry import depth_to_points
from kbe_tpu.ops.splat import render_pointcloud
from kbe_tpu.ops.splat_banded import (render_grids_banded,
                                      render_grids_fast_banded)
from tests.test_splat_routed import _scatter, _scene

import pytest


def test_banded_matches_scatter():
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal)
    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_banded(xyz, data, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-5)


def test_banded_small_image_and_z_shift():
    # width < TILE_W exercises padding; a negative z shift exercises the
    # degrid-average rounding (z-test ties at the +1.0 boundary)
    h, w, focal, baseline = 64, 64, 512.0, 120.0
    xyz, data, valid = _scene(h, w, focal, seed=3,
                              shift=(-2.5, 2.7, -28.0))
    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_banded(xyz, data, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)


@pytest.mark.slow
def test_banded_wide_spread_chunks():
    # strong depth discontinuities inside chunks: x-spread far beyond one
    # 16-lane window forces multi-window iteration
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    rng = np.random.default_rng(7)
    depth = np.where(rng.uniform(size=(h, w)) > 0.5, 60.0, 400.0)
    depth[20:28, 60:200] = 30.0

    xyz = np.asarray(depth_to_points(jnp.asarray(depth)[None], focal)[0])
    xyz = (xyz + np.asarray((9.0, -4.0, 5.0)))[None]
    data = rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32)
    valid = np.ones((1, h, w), np.float32)
    xyz, data, valid = (jnp.asarray(xyz, jnp.float32), jnp.asarray(data),
                        jnp.asarray(valid))

    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_banded(xyz, data, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)


@pytest.mark.slow
def test_banded_work_limit_bounds_incoherent_chunks():
    # a cloud whose depth is uncorrelated noise spreads each chunk's
    # displacements over hundreds of pixels — the work bound must flag it
    # (instead of iterating ~spread^2 window-rows per chunk in-kernel,
    # which on real hardware can run for minutes and trip the TPU
    # watchdog), and fallback='scatter' must still give exact results
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    rng = np.random.default_rng(11)
    depth = rng.uniform(20.0, 2000.0, (h, w)).astype(np.float32)
    xyz = np.asarray(depth_to_points(jnp.asarray(depth)[None], focal)[0])
    xyz = (xyz + np.asarray((30.0, -12.0, 9.0)))[None]
    data = rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32)
    valid = np.ones((1, h, w), np.float32)
    xyz, data, valid = (jnp.asarray(xyz, jnp.float32), jnp.asarray(data),
                        jnp.asarray(valid))

    _, _, ovf = render_grids_banded(xyz, data, h, w, focal, baseline,
                                    valid=valid, work_limit=32)
    assert bool(ovf)

    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e = render_grids_fast_banded(
        xyz, data, h, w, focal, baseline, valid=valid, work_limit=32,
        fallback="scatter")
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)

    # a generous limit must leave coherent scenes untouched (no flag)
    sxyz, sdata, svalid = _scene(h, w, focal)
    got_r2, got_e2, ovf2 = render_grids_banded(
        sxyz, sdata, h, w, focal, baseline, valid=svalid, work_limit=256)
    assert not bool(ovf2)
    want_r2, want_e2 = _scatter(sxyz, sdata, svalid, h, w, focal, baseline)
    np.testing.assert_allclose(np.asarray(got_r2), np.asarray(want_r2),
                               atol=2e-5)


@pytest.mark.slow
def test_banded_overflow_falls_back_to_scatter():
    # work_limit=1 flags every non-empty chunk regardless of the tile
    # configuration (capacity overflow and overwork share the flag and
    # the fallback surface), so the scatter fallback must carry the
    # whole render
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=1)
    _, _, ovf = render_grids_banded(xyz, data, h, w, focal, baseline,
                                    valid=valid, work_limit=1)
    assert bool(ovf)
    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e = render_grids_fast_banded(xyz, data, h, w, focal,
                                            baseline, valid=valid,
                                            work_limit=1,
                                            fallback="scatter")
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-5)


@pytest.mark.slow
def test_banded_wide_payload_matches_scatter():
    # > 8 payload channels take the wide kernel: per-tile z-buffer built
    # once at group 0, payload planes streamed in groups of 8 (the
    # 68-channel inpaint-bootstrap path). Two groups + padded tail here.
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data4, valid = _scene(h, w, focal, seed=5)
    rng = np.random.default_rng(5)
    g = xyz.shape[0]
    data = jnp.asarray(
        rng.uniform(0, 1, (g, h, w, 12)).astype(np.float32))

    want_r, want_e = _scatter(xyz, data, valid, h, w, focal, baseline)
    got_r, got_e, ovf = render_grids_banded(xyz, data, h, w, focal,
                                            baseline, valid=valid)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-5)

    # wide and narrow paths agree exactly on the shared first channels
    # given identical z-buffers: compare channel 0 rendered both ways
    got_r4, got_e4, _ = render_grids_banded(xyz, data[..., :4], h, w,
                                            focal, baseline, valid=valid)
    np.testing.assert_allclose(np.asarray(got_r[..., :4]),
                               np.asarray(got_r4), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(got_e4),
                               atol=2e-5)
