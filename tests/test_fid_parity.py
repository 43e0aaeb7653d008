"""FID numeric parity vs the reference's own code (utils/fid.py:31-233).

torchvision is unavailable offline, so the torch Inception-v3 itself
cannot be instantiated (its conversion into models/inception.py is
structure-tested in tests/test_convert.py). Everything downstream of the
activations IS the reference's code, imported with torchvision stubbed
the way tests/test_parity_full.py stubs cupy: activation statistics,
the Fréchet distance (both the regular and the near-singular eps branch),
and the cv2 preprocessing resize are asserted to produce the same numbers
as ours on identical inputs.
"""

import pytest

# InceptionV3 compile dominates; FID correctness is also pinned by the
# training-tier validation tests
pytestmark = pytest.mark.slow

import sys
import types

import numpy as np
import pytest

from kbe_tpu.train.fid import FID, preprocess_images


def _reference_fid_class():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _no_inception(*a, **k):  # only reached if FID() is built
            raise RuntimeError("torchvision unavailable offline")

        tv_models.inception_v3 = _no_inception
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    import utils.fid as ref_fid

    return ref_fid.FID


def test_activation_statistics_match_reference():
    RefFID = _reference_fid_class()
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(64, 128)).astype(np.float32)
    mu_ref, sigma_ref = RefFID.calculate_activation_statistics(None, acts)
    mu, sigma = FID.activation_statistics(acts)
    np.testing.assert_array_equal(mu, mu_ref)
    np.testing.assert_array_equal(sigma, sigma_ref)


def test_frechet_distance_matches_reference_well_conditioned():
    RefFID = _reference_fid_class()
    rng = np.random.default_rng(1)
    # N >> D: full-rank covariances, the regular sqrtm path
    a1 = rng.normal(size=(400, 16)).astype(np.float32)
    a2 = (rng.normal(size=(400, 16)) * 1.3 + 0.2).astype(np.float32)
    mu1, s1 = FID.activation_statistics(a1)
    mu2, s2 = FID.activation_statistics(a2)
    want = RefFID.calculate_frechet_distance(None, mu1, s1, mu2, s2)
    got = FID.frechet_distance(mu1, s1, mu2, s2)
    assert np.isclose(got, want, rtol=1e-9), (got, want)


def test_frechet_distance_matches_reference_singular_eps_branch():
    RefFID = _reference_fid_class()
    rng = np.random.default_rng(2)
    # N << D: rank-deficient covariance product; both implementations
    # must take the eps-offset retry and still agree
    a1 = rng.normal(size=(24, 256)).astype(np.float32)
    a2 = (rng.normal(size=(24, 256)) * 0.7 - 0.1).astype(np.float32)
    mu1, s1 = FID.activation_statistics(a1)
    mu2, s2 = FID.activation_statistics(a2)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = RefFID.calculate_frechet_distance(None, mu1, s1, mu2, s2)
    got = FID.frechet_distance(mu1, s1, mu2, s2)
    assert np.isclose(got, want, rtol=1e-6), (got, want)


def test_preprocess_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, (2, 181, 240, 3)).astype(np.float32)
    got = preprocess_images(imgs)
    want = np.stack([cv2.resize(im, (299, 299)) for im in imgs])
    assert got.shape == (2, 299, 299, 3)
    # cv2 resizes in fixed-point; measured max |diff| is ~1.8e-5
    np.testing.assert_allclose(got, want, atol=5e-5)
