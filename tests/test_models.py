"""Shape/structure tests for the Flax model zoo."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbe_tpu.models import (
    Disparity,
    Inpaint,
    MPDDiscriminator,
    MultiScaleDiscriminator,
    MultiScalePerceptualDiscriminator,
    PartialInpaint,
    PerceptualDiscriminator,
    Refine,
    RefinePretrained,
    Semantics,
    VGG16Features,
)
from kbe_tpu.models.discriminator import Discriminator, adversarial_loss
from kbe_tpu.models.gridnet import ContextNet
from kbe_tpu.models.layers import sample_norm_stats


KEY = jax.random.PRNGKey(0)


def test_semantics_shape():
    x = jnp.zeros((1, 64, 96, 3))
    m = Semantics()
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (1, 4, 6, 512)


def test_disparity_shape_and_odd_sizes():
    m = Disparity()
    for h, w in [(64, 64), (68, 100)]:
        img = jnp.zeros((1, h, w, 3))
        sem = jnp.zeros((1, (h + 15) // 16, (w + 15) // 16, 512))
        params = m.init(KEY, img, sem)
        out = m.apply(params, img, sem)
        assert out.shape == (1, (h + 1) // 2, (w + 1) // 2, 1)


def test_refine_shapes_and_norm_roundtrip():
    img = jax.random.uniform(KEY, (2, 32, 32, 3))
    disp = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1)) * 50
    for cls in (Refine, RefinePretrained):
        m = cls()
        params = m.init(KEY, img, disp)
        out = m.apply(params, img, disp)
        assert out.shape == (2, 32, 32, 1)


def test_sample_norm_matches_torch_std():
    import torch

    x = np.random.default_rng(0).uniform(0, 5, (3, 6, 7, 2)).astype(
        np.float32)
    mean, std = sample_norm_stats(jnp.asarray(x))
    t = torch.from_numpy(x).reshape(3, -1)
    np.testing.assert_allclose(np.asarray(mean).ravel(),
                               t.mean(1).numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std).ravel(),
                               t.std(1).numpy(), rtol=1e-4)


def test_inpaint_and_context_shapes():
    data = jnp.zeros((1, 32, 32, 68))
    masks = jnp.zeros((1, 32, 32, 1))
    m = Inpaint()
    params = m.init(KEY, data, masks)
    img, disp = m.apply(params, data, masks)
    assert img.shape == (1, 32, 32, 3) and disp.shape == (1, 32, 32, 1)

    ctx = ContextNet()
    cp = ctx.init(KEY, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)))
    c = ctx.apply(cp, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)))
    assert c.shape == (1, 32, 32, 64)


def test_partial_inpaint_shapes_and_mask_prop():
    data = jnp.ones((1, 32, 32, 68))
    masks = jnp.zeros((1, 32, 32, 1)).at[:, 8:24, 8:24].set(1.0)
    m = PartialInpaint()
    params = m.init(KEY, data, masks)
    img, disp, existing = m.apply(params, data, masks)
    assert img.shape == (1, 32, 32, 3)
    assert disp.shape == (1, 32, 32, 1)
    assert existing.shape == (1, 32, 32, 1)
    # mask should have dilated outwards from the valid square
    assert float(existing.sum()) >= float(masks.sum())


def test_discriminators_run():
    img = jnp.zeros((1, 64, 64, 3))
    disp = jnp.zeros((1, 64, 64, 1))

    d = Discriminator()
    v = d.init({"params": KEY}, img, train=False)
    out = d.apply(v, img, train=False)
    assert out.ndim == 4 and out.shape[-1] == 1
    assert float(adversarial_loss(out, True)) >= 0

    m = PerceptualDiscriminator()
    v = m.init({"params": KEY}, img, train=False)
    m.apply(v, img, train=False)

    # The dilated main head needs >= ~280 px inputs (the reference trains
    # on 378x512 crops; smaller inputs underflow the dilated conv stack).
    big = jnp.zeros((1, 288, 288, 3))
    bigd = jnp.zeros((1, 288, 288, 1))
    ms = MultiScaleDiscriminator()
    v = ms.init({"params": KEY}, big, train=False)
    outs = ms.apply(v, big, train=False)
    assert len(outs) == 3

    mpd = MPDDiscriminator()
    v = mpd.init({"params": KEY}, big, bigd, train=False)
    outs = mpd.apply(v, big, bigd, train=False)
    assert len(outs) == 3
    loss = adversarial_loss(outs, False)
    assert np.isfinite(float(loss))


def test_discriminator_bn_train_mode_mutable():
    img = jax.random.uniform(KEY, (2, 64, 64, 3))
    d = Discriminator()
    v = d.init({"params": KEY}, img, train=True)
    out, updates = d.apply(v, img, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_spectral_norm_variant():
    img = jax.random.uniform(KEY, (1, 64, 64, 3))
    d = Discriminator(spectral_norm=True)
    v = d.init({"params": KEY}, img, train=True)
    out, _ = d.apply(v, img, train=True, mutable=["batch_stats"])
    assert out.shape[-1] == 1


def test_disparity_grads_flow():
    m = Disparity()
    img = jax.random.uniform(KEY, (1, 64, 64, 3))
    sem = jax.random.uniform(KEY, (1, 4, 4, 512))
    params = m.init(KEY, img, sem)

    def loss(p):
        return jnp.mean(m.apply(p, img, sem) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_narrow_lattice_variants():
    """The dryrun/test-tier narrow grids (Disparity.rows / Inpaint.rows
    overrides) must run with the semantics projection mapped onto
    rows[3] — identical topology to the reference-width nets."""
    from kbe_tpu.models import Inpaint

    m = Disparity(rows=(8, 12, 16, 32))
    img = jax.random.uniform(KEY, (1, 64, 64, 3))
    sem = jax.random.uniform(KEY, (1, 4, 4, 512))
    params = m.init(KEY, img, sem)
    out = m.apply(params, img, sem)
    assert out.shape == (1, 32, 32, 1)

    inp = Inpaint(rows=(8, 16, 24, 32))
    data = jax.random.uniform(KEY, (1, 32, 32, 68))
    mask = jnp.ones((1, 32, 32, 1))
    p = inp.init(KEY, data, mask)
    im, dsp = inp.apply(p, data, mask)
    assert im.shape == (1, 32, 32, 3) and dsp.shape == (1, 32, 32, 1)
