"""Golden tests: Pallas window-march disocclusion fill vs the XLA spec."""

import numpy as np
import jax.numpy as jnp

from kbe_tpu.ops.discfill import fill_disocclusion
from kbe_tpu.ops.discfill_pallas import fill_disocclusion_pallas


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
