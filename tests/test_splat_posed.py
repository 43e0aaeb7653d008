"""Golden tests: pose-parameterized banded renderer vs the banded kernel
and the scatter spec (interpret mode, CPU backend)."""

import numpy as np
import jax.numpy as jnp

from kbe_tpu.ops.geometry import apply_shift
from kbe_tpu.ops.splat_banded import render_grids_banded
from kbe_tpu.ops.splat_posed import prepare_banded_scene, render_scene_posed
from tests.test_splat_routed import _scatter, _scene

import pytest

# interpret-mode compiles of the posed kernel run minutes apiece on a
# 1-core host; the fast tier pins this kernel via test_splat_banded's
# small goldens + the pipeline smoke instead (VERDICT r4 #6)
pytestmark = pytest.mark.slow


def _check_pose(xyz, data, valid, h, w, focal, baseline, shift, atol=2e-4):
    shift = jnp.asarray(shift, jnp.float32)
    scene = prepare_banded_scene(xyz, data, valid)
    got_r, got_e, ovf = render_scene_posed(scene, shift, focal, h, w,
                                           baseline)
    assert not bool(ovf)
    shifted = apply_shift(xyz, shift)
    want_r, want_e = _scatter(shifted, data, valid, h, w, focal, baseline)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=atol)


def test_posed_identity_pose_matches_scatter():
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal)
    _check_pose(xyz, data, valid, h, w, focal, baseline, (0.0, 0.0, 0.0))


def test_posed_translated_poses_match_scatter():
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=5)
    for shift in ((3.5, -2.25, 0.0), (-6.0, 4.0, 18.0), (1.0, 1.0, -22.0)):
        _check_pose(xyz, data, valid, h, w, focal, baseline, shift)


def test_posed_matches_banded_kernel_on_same_pose():
    # the posed path must agree with the per-frame banded kernel bit-for-
    # bit up to f32 reassociation (same spec, different record layouts)
    h, w, focal, baseline = 64, 64, 512.0, 120.0
    xyz, data, valid = _scene(h, w, focal, seed=3, shift=(-2.5, 2.7, -28.0))
    shift = jnp.asarray((4.0, -3.0, 6.0), jnp.float32)

    scene = prepare_banded_scene(xyz, data, valid)
    got_r, got_e, ovf1 = render_scene_posed(scene, shift, focal, h, w,
                                            baseline)
    want_r, want_e, ovf2 = render_grids_banded(
        apply_shift(xyz, shift), data, h, w, focal, baseline, valid=valid)
    assert not bool(ovf1) and not bool(ovf2)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)


def test_posed_dolly_focal_change():
    # per-pose focal (dolly mode) flows through the pose scalars
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=9)
    shift = jnp.asarray((0.5, 0.5, 2.0), jnp.float32)
    for step_focal in (focal, focal * 1.3):
        scene = prepare_banded_scene(xyz, data, valid)
        got_r, got_e, ovf = render_scene_posed(scene, shift, step_focal,
                                               h, w, baseline)
        assert not bool(ovf)
        want_r, want_e = _scatter(apply_shift(xyz, shift), data, valid,
                                  h, w, step_focal, baseline)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   atol=2e-4)


def test_posed_overwork_flags_incoherent_cloud():
    from kbe_tpu.ops.geometry import depth_to_points

    h, w, focal, baseline = 48, 256, 100.0, 40.0
    rng = np.random.default_rng(11)
    depth = rng.uniform(20.0, 2000.0, (h, w)).astype(np.float32)
    xyz = jnp.asarray(
        np.asarray(depth_to_points(jnp.asarray(depth)[None], focal)),
        jnp.float32)
    data = jnp.asarray(rng.uniform(0, 1, (1, h, w, 4)), jnp.float32)
    valid = jnp.ones((1, h, w), jnp.float32)

    scene = prepare_banded_scene(xyz, data, valid)
    _, _, ovf = render_scene_posed(scene, jnp.asarray((30.0, -12.0, 9.0),
                                                      jnp.float32),
                                   focal, h, w, baseline, work_limit=16)
    assert bool(ovf)


def test_posed_overflow_cap_exact_on_overwork_chunks():
    # a grid whose points scatter across the whole screen blows the
    # per-chunk window budget; with overflow_cap those chunks render
    # through the bounded scatter epilogue sharing the kernel's z-buffer
    # and the frame matches the scatter spec (same f32 tolerance as the
    # in-budget golden tests), with NO overflow flagged — where the
    # clip path loses the whole grid (reference never drops a point,
    # utils/common.py:585-669)
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=11)
    rng = np.random.default_rng(12)
    xyz_np = np.asarray(xyz).copy()
    xyz_np[1, ..., 0] = rng.uniform(-20, 20, (h, w))
    xyz_np[1, ..., 1] = rng.uniform(-10, 10, (h, w))
    xyz = jnp.asarray(xyz_np)
    shift = jnp.asarray((2.0, -1.0, 0.0), jnp.float32)

    scene = prepare_banded_scene(xyz, data, valid)
    got_r, got_e, ovf = render_scene_posed(scene, shift, focal, h, w,
                                           baseline, work_limit=16,
                                           overflow_cap=128)
    assert not bool(ovf)
    shifted = apply_shift(xyz, shift)
    want_r, want_e = _scatter(shifted, data, valid, h, w, focal, baseline)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=5e-4)

    clip_r, _, ovf_clip = render_scene_posed(scene, shift, focal, h, w,
                                             baseline, work_limit=16,
                                             overflow_cap=0)
    assert bool(ovf_clip)
    assert float(jnp.max(jnp.abs(clip_r - want_r))) > 0.05


def test_posed_overflow_cap_noop_when_in_budget():
    # overflow_cap present but nothing overworks: identical to the plain
    # posed path (the epilogue cond takes the zero branch)
    h, w, focal, baseline = 48, 256, 100.0, 40.0
    xyz, data, valid = _scene(h, w, focal, seed=13)
    shift = jnp.asarray((1.5, 0.5, 4.0), jnp.float32)
    scene = prepare_banded_scene(xyz, data, valid)
    plain_r, plain_e, ovf1 = render_scene_posed(scene, shift, focal, h, w,
                                                baseline)
    cap_r, cap_e, ovf2 = render_scene_posed(scene, shift, focal, h, w,
                                            baseline, overflow_cap=64)
    assert not bool(ovf1) and not bool(ovf2)
    np.testing.assert_array_equal(np.asarray(plain_r), np.asarray(cap_r))
    np.testing.assert_array_equal(np.asarray(plain_e), np.asarray(cap_e))


def test_posed_depth_cluster_split_avoids_overwork():
    # a hard depth edge inside chunks: the union displacement window
    # would blow a small work budget, but the static z-cluster split
    # (prepare_banded_scene) routes two tight per-cluster windows —
    # no overwork entries, exact render
    from kbe_tpu.ops.splat_posed import pose_routing

    h, w, focal, baseline = 48, 256, 100.0, 40.0
    rng = np.random.default_rng(21)
    depth = np.full((h, w), 60.0, np.float32)
    depth[16:32, 64:192] = 20.0  # near slab crossing many chunks
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    z = depth
    x = (xx - w / 2.0) * z / focal
    y = (yy - h / 2.0) * z / focal
    xyz = jnp.asarray(np.stack([x, y, z], -1))[None]
    data = jnp.asarray(rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32))
    valid = jnp.ones((1, h, w), jnp.float32)
    shift = jnp.asarray((3.0, 2.0, 0.0), jnp.float32)

    scene = prepare_banded_scene(xyz, data, valid)
    routing = pose_routing(scene, shift, focal, h, w, work_limit=16,
                           overflow_cap=64)
    # displacement gap between the slab (f*sx/20 = 15px) and background
    # (5px) spans ~10px: unsplit work would be ~12*2 > 16; per-cluster
    # spreads are ~0
    assert int(routing.n_over) == 0
    got_r, got_e, ovf = render_scene_posed(scene, shift, focal, h, w,
                                           baseline, work_limit=16,
                                           overflow_cap=64)
    assert not bool(ovf)
    want_r, want_e = _scatter(apply_shift(xyz, shift), data, valid, h, w,
                              focal, baseline)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4)
