"""Golden tests: pose-parameterized banded renderer vs the banded kernel
and the scatter spec (interpret mode, CPU backend)."""

import numpy as np
import jax.numpy as jnp

from kbe_tpu.ops.geometry import apply_shift
from kbe_tpu.ops.splat_banded import render_grids_banded
from kbe_tpu.ops.splat_posed import prepare_banded_scene, render_scene_posed
from tests.test_splat_routed import _scatter, _scene


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
