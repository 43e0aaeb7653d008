"""Golden tests: Pallas window-march disocclusion fill vs the XLA spec."""

import numpy as np
import jax.numpy as jnp

from kbe_tpu.ops.discfill import fill_disocclusion
from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas

import pytest

# interpret-mode compiles of the fused march kernels run minutes
# apiece on a 1-core host; the fast tier pins fill semantics via the
# XLA spec tests in test_ops + the pipeline smoke (VERDICT r4 #6)
pytestmark = pytest.mark.slow


def _scene(h, w, seed=0, hole_frac=0.15):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32)
    d = rng.uniform(10, 500, (h, w))
    mask = rng.uniform(size=(h, w)) > hole_frac
    mask[h // 3:h // 3 + 5, w // 4:w // 2] = False  # a wide band
    mask[:3, :10] = False  # border-adjacent holes
    depth = (d * mask)[None, ..., None].astype(np.float32)
    return jnp.asarray(img), jnp.asarray(depth)


def test_fill_pallas_matches_xla():
    img, depth = _scene(48, 256)
    want = fill_disocclusion(img, depth, 32)
    got = fill_disocclusion_pallas(img, depth, 32)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_pallas_small_image_and_batch():
    img, depth = _scene(32, 64, seed=1)
    img2 = jnp.concatenate([img, img[:, ::-1]], axis=0)
    depth2 = jnp.concatenate([depth, depth[:, ::-1]], axis=0)
    want = fill_disocclusion(img2, depth2, 16)
    got = fill_disocclusion_pallas(img2, depth2, 16)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_pallas_no_holes_noop():
    img, depth = _scene(32, 128, seed=2, hole_frac=0.0)
    depth = jnp.abs(depth) + 1.0
    got = fill_disocclusion_pallas(img, depth, 16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(img))


def test_fill_two_phase_small_holes_resolve_in_phase1():
    # scattered small holes: phase 1 (8 steps) settles everything and must
    # be bit-identical to the one-phase 32-step march
    img, depth = _scene(48, 256, seed=3, hole_frac=0.05)
    want = fill_disocclusion(img, depth, 32)
    got = fill_disocclusion_pallas(img, depth, 32, phase1_steps=8)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_two_phase_wide_hole_falls_back():
    # a hole wider than phase 1's reach: the lax.cond fallback must fire
    # and reproduce the exact full-march result
    img, depth = _scene(48, 256, seed=4, hole_frac=0.0)
    depth_np = np.asarray(depth).copy()
    depth_np[0, 10:38, 40:150] = 0.0  # 28 x 110 hole >> 8-step reach
    depth = jnp.asarray(depth_np)
    want = fill_disocclusion(img, depth, 64)
    got = fill_disocclusion_pallas(img, depth, 64, phase1_steps=8)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_roi_matches_inside_untouched_outside():
    # ROI fill: in-ROI pixels bit-identical to the full fill (march
    # sources unchanged), out-of-ROI holes left exactly as the input —
    # on both the one-phase and two-phase paths.
    img, depth = _scene(48, 256, seed=6)
    roi = (8, 40, 32, 224)
    full = np.asarray(fill_disocclusion(img, depth, 32))
    for kw in ({}, {"phase1_steps": 8}):
        got = np.asarray(fill_disocclusion_pallas(img, depth, 32, roi=roi,
                                                  **kw))
        y0, y1, x0, x1 = roi
        np.testing.assert_array_equal(got[:, y0:y1, x0:x1],
                                      full[:, y0:y1, x0:x1])
        outside = np.ones((48, 256), bool)
        outside[y0:y1, x0:x1] = False
        np.testing.assert_array_equal(got[:, outside],
                                      np.asarray(img)[:, outside])


def test_fill_fused_phase1_unresolved_flag():
    from kbe_tpu.ops.discfill_pallas import _fill_single_fused

    # small interior holes: every hole pixel finds a winner pair within
    # the provable phase-1 bound -> no fallback
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (48, 256, 4)).astype(np.float32))
    depth_np = np.full((48, 256, 1), 5.0, np.float32)
    depth_np[10:13, 30:33] = 0.0
    depth_np[30:32, 180:184] = 0.0
    _, unresolved = _fill_single_fused(img, jnp.asarray(depth_np), 8, True)
    assert not bool(jnp.any(unresolved))

    # a hole wider than the phase-1 reach in every direction -> fallback
    depth_np2 = depth_np.copy()
    depth_np2[10:38, 40:150] = 0.0
    _, unresolved = _fill_single_fused(img, jnp.asarray(depth_np2), 8,
                                       True)
    assert bool(jnp.any(unresolved))


def test_fill_phase0_bit_identical_noisy_scene():
    # scattered thin holes (the noisy-depth regime that saturates the
    # gated phase-1 march): the phase-0 resolver + gated marches must be
    # bit-identical to the one-phase full march
    img, depth = _scene(48, 256, seed=7, hole_frac=0.12)
    want = fill_disocclusion(img, depth, 32)
    got = fill_disocclusion_pallas(img, depth, 32, phase1_steps=8,
                                   phase0_steps=2)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_phase0_wide_hole_exact():
    # holes wider than every bound: phase-0 resolves nothing there,
    # phase-1 flags the tiles, phase-2 finishes — still bit-identical
    img, depth = _scene(48, 256, seed=8, hole_frac=0.03)
    depth_np = np.asarray(depth).copy()
    depth_np[0, 8:40, 40:150] = 0.0
    depth = jnp.asarray(depth_np)
    want = fill_disocclusion(img, depth, 64)
    got = fill_disocclusion_pallas(img, depth, 64, phase1_steps=8,
                                   phase0_steps=2)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_phase0_census_gate_both_branches():
    # the census-gated lax.cond must be bit-identical to the full march
    # whichever branch fires: a noisy scene (most tiles hold holes) takes
    # the phase-0 branch, a sparse scene takes the plain two-phase branch
    noisy, depth_noisy = _scene(48, 256, seed=11, hole_frac=0.12)
    want = fill_disocclusion(noisy, depth_noisy, 32)
    got = fill_disocclusion_pallas(noisy, depth_noisy, 32, phase1_steps=8,
                                   phase0_steps=2, phase0_gate=0.25)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    img, depth = _scene(48, 256, seed=12, hole_frac=0.0)
    depth_np = np.asarray(depth).copy()
    depth_np[0, 30:33, 60:70] = 0.0  # one small hole -> census below gate
    depth = jnp.asarray(depth_np)
    want = fill_disocclusion(img, depth, 32)
    got = fill_disocclusion_pallas(img, depth, 32, phase1_steps=8,
                                   phase0_steps=2, phase0_gate=0.25)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fill_phase0_roi():
    img, depth = _scene(48, 256, seed=9)
    roi = (8, 40, 32, 224)
    full = np.asarray(fill_disocclusion(img, depth, 32))
    got = np.asarray(fill_disocclusion_pallas(img, depth, 32, roi=roi,
                                              phase1_steps=8,
                                              phase0_steps=2))
    y0, y1, x0, x1 = roi
    np.testing.assert_array_equal(got[:, y0:y1, x0:x1],
                                  full[:, y0:y1, x0:x1])
    outside = np.ones((48, 256), bool)
    outside[y0:y1, x0:x1] = False
    np.testing.assert_array_equal(got[:, outside],
                                  np.asarray(img)[:, outside])


def test_resolve_thin_holes_sound_and_complete_on_thin():
    # the resolver's own contract: (a) every pixel it fills matches the
    # unbounded march exactly; (b) on 1-2px scattered holes it resolves
    # everything (no tile would enter the march)
    from kbe_tpu.ops.discfill import resolve_thin_holes

    rng = np.random.default_rng(10)
    img = jnp.asarray(rng.uniform(0, 1, (48, 256, 4)).astype(np.float32))
    depth_np = rng.uniform(10, 500, (48, 256, 1)).astype(np.float32)
    # scatter isolated 1px holes away from borders
    ys = rng.integers(3, 45, 60)
    xs = rng.integers(3, 253, 60)
    depth_np[ys, xs, 0] = 0.0
    depth = jnp.asarray(depth_np)
    filled0, unresolved = resolve_thin_holes(img, depth, 2)
    assert not bool(jnp.any(unresolved))
    want = fill_disocclusion(img[None], depth[None], 64)[0]
    hole = depth_np[..., 0] <= 0
    np.testing.assert_array_equal(np.asarray(filled0)[hole],
                                  np.asarray(want)[hole])
