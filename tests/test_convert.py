"""Torch->Flax conversion tests: structural match against model init and
numeric parity of the converted building blocks vs live torch modules."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from kbe_tpu.models import Disparity, Refine, RefinePretrained
from kbe_tpu.models.gridnet import ContextNet, Inpaint
from kbe_tpu.models.layers import Basic, Downsample, Upsample
from kbe_tpu.utils import torch_convert as tc


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)


def _rand_sd(module):
    sd = module.state_dict()
    g = torch.Generator().manual_seed(0)
    return {k: torch.randn(v.shape, generator=g) if v.ndim else v
            for k, v in sd.items()}


class TorchBasic(tnn.Module):
    """Reference-shaped Basic block (built from the spec in
    models/disparity_estimation.py:6-45) used as conversion ground truth."""

    def __init__(self, kind, c0, c1, c2, shortcut=True):
        super().__init__()
        if kind == "relu-conv-relu-conv":
            self.moduleMain = tnn.Sequential(
                tnn.PReLU(c0, 0.25), tnn.Conv2d(c0, c1, 3, 1, 1),
                tnn.PReLU(c1, 0.25), tnn.Conv2d(c1, c2, 3, 1, 1))
        else:
            self.moduleMain = tnn.Sequential(
                tnn.Conv2d(c0, c1, 3, 1, 1), tnn.PReLU(c1, 0.25),
                tnn.Conv2d(c1, c2, 3, 1, 1))
        if shortcut and c0 != c2:
            self.moduleShortcut = tnn.Conv2d(c0, c2, 1, 1, 0)
        else:
            self.moduleShortcut = None
        self.kind = kind
        self.shortcut = shortcut

    def forward(self, x):
        y = self.moduleMain(x)
        if not self.shortcut:
            return y
        if self.moduleShortcut is not None:
            return y + self.moduleShortcut(x)
        return y + x


def test_basic_block_numeric_parity():
    for kind in ("relu-conv-relu-conv", "conv-relu-conv"):
        for c0, c2 in ((8, 8), (8, 4)):
            tmod = TorchBasic(kind, c0, 6, c2).eval()
            sd = {f"x.{k}": v.detach().numpy()
                  for k, v in tmod.state_dict().items()}
            params = {"params": tc._basic(sd, "x", kind, True)}

            x = np.random.default_rng(0).standard_normal(
                (1, 10, 12, c0)).astype(np.float32)
            with torch.no_grad():
                want = tmod(torch.from_numpy(
                    np.transpose(x, (0, 3, 1, 2)))).numpy()
            fmod = Basic(kind, (c0, 6, c2), residual=True)
            with jax.default_matmul_precision("highest"):
                got = fmod.apply(params, jnp.asarray(x))
            np.testing.assert_allclose(
                np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                rtol=2e-4, atol=2e-5)


def test_down_up_numeric_parity():
    class TorchDown(tnn.Module):
        def __init__(self):
            super().__init__()
            self.moduleMain = tnn.Sequential(
                tnn.PReLU(6, 0.25), tnn.Conv2d(6, 8, 3, 2, 1),
                tnn.PReLU(8, 0.25), tnn.Conv2d(8, 8, 3, 1, 1))

        def forward(self, x):
            return self.moduleMain(x)

    class TorchUp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.moduleMain = tnn.Sequential(
                tnn.Upsample(scale_factor=2, mode="bilinear",
                             align_corners=False),
                tnn.PReLU(6, 0.25), tnn.Conv2d(6, 8, 3, 1, 1),
                tnn.PReLU(8, 0.25), tnn.Conv2d(8, 8, 3, 1, 1))

        def forward(self, x):
            return self.moduleMain(x)

    x = np.random.default_rng(1).standard_normal((1, 8, 10, 6)).astype(
        np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    tdown = TorchDown().eval()
    sd = {f"d.{k}": v.detach().numpy()
          for k, v in tdown.state_dict().items()}
    with torch.no_grad():
        want = tdown(xt).numpy()
    with jax.default_matmul_precision("highest"):
        got = Downsample((6, 8, 8)).apply({"params": tc._down(sd, "d")},
                                          jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=2e-4, atol=2e-5)

    tup = TorchUp().eval()
    sd = {f"u.{k}": v.detach().numpy() for k, v in tup.state_dict().items()}
    with torch.no_grad():
        want = tup(xt).numpy()
    with jax.default_matmul_precision("highest"):
        got = Upsample((6, 8, 8)).apply({"params": tc._up(sd, "u")},
                                        jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=2e-4, atol=2e-5)


def test_bn_folding_numeric():
    conv = tnn.Conv2d(3, 5, 3, 1, 1)
    bn = tnn.BatchNorm2d(5)
    with torch.no_grad():
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-1, 1)
    seq = tnn.Sequential(conv, bn).eval()
    sd = {f"m.0.{k}": v.detach().numpy()
          for k, v in conv.state_dict().items()}
    sd.update({f"m.1.{k}": v.detach().numpy()
               for k, v in bn.state_dict().items()})
    folded = tc._conv_bn_folded(sd, "m.0", "m.1")

    x = np.random.default_rng(2).standard_normal((1, 6, 7, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = seq(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    from jax import lax

    got = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(folded["kernel"]), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + folded["bias"]
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=2e-4, atol=1e-4)


def _reference_disparity_sd():
    """State dict with the reference Disparity's key names
    (models/disparity_estimation.py:125-150), random values."""
    sd = {}

    def add_conv(key, ci, co, k=3):
        sd[f"{key}.weight"] = np.random.randn(co, ci, k, k).astype(
            np.float32)
        sd[f"{key}.bias"] = np.random.randn(co).astype(np.float32)

    def add_prelu(key, c):
        sd[f"{key}.weight"] = np.full((c,), 0.25, np.float32)

    def add_basic(key, c0, c1, c2, kind="relu-conv-relu-conv"):
        if kind == "relu-conv-relu-conv":
            add_prelu(f"{key}.moduleMain.0", c0)
            add_conv(f"{key}.moduleMain.1", c0, c1)
            add_prelu(f"{key}.moduleMain.2", c1)
            add_conv(f"{key}.moduleMain.3", c1, c2)
        else:
            add_conv(f"{key}.moduleMain.0", c0, c1)
            add_prelu(f"{key}.moduleMain.1", c1)
            add_conv(f"{key}.moduleMain.2", c1, c2)
        if c0 != c2:
            add_conv(f"{key}.moduleShortcut", c0, c2, k=1)

    def add_down(key, c0, c1, c2):
        add_prelu(f"{key}.moduleMain.0", c0)
        add_conv(f"{key}.moduleMain.1", c0, c1)
        add_prelu(f"{key}.moduleMain.2", c1)
        add_conv(f"{key}.moduleMain.3", c1, c2)

    def add_up(key, c0, c1, c2):
        add_prelu(f"{key}.moduleMain.1", c0)
        add_conv(f"{key}.moduleMain.2", c0, c1)
        add_prelu(f"{key}.moduleMain.3", c1)
        add_conv(f"{key}.moduleMain.4", c1, c2)

    add_conv("moduleImage", 3, 32, k=7)
    add_conv("moduleSemantics", 512, 512)
    rows = [32, 48, 64, 512, 512, 512]
    for r, f in enumerate(rows):
        for c in (1, 2, 3):
            add_basic(f"{r}x{c - 1} - {r}x{c}", f, f, f)
    for c in (0, 1):
        for r in range(1, 6):
            add_down(f"{r - 1}x{c} - {r}x{c}", rows[r - 1], rows[r],
                     rows[r])
    for c in (2, 3):
        for r in range(5):
            add_up(f"{r + 1}x{c} - {r}x{c}", rows[r + 1], rows[r], rows[r])
    add_basic("moduleDisparity", 32, 32, 1, "conv-relu-conv")
    return sd


def test_disc_conv_block_numeric():
    """Reference ConvBlock (conv+BN+LeakyReLU) vs converted Flax ConvBlock
    with running stats, eval mode."""
    from kbe_tpu.models.discriminator import ConvBlock

    conv = tnn.Conv2d(6, 8, 4, stride=2, padding=1)
    bn = tnn.BatchNorm2d(8)
    with torch.no_grad():
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-1, 1)
    tblock = tnn.Sequential(conv, bn, tnn.LeakyReLU(0.2)).eval()
    sd = {f"k.conv.{k}": v.detach().numpy()
          for k, v in tblock.state_dict().items()}
    params, stats = tc._disc_conv_block(sd, "k", use_bn=True)

    x = np.random.default_rng(3).standard_normal((2, 8, 8, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = tblock(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    with jax.default_matmul_precision("highest"):
        got = ConvBlock(8).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=2e-4, atol=2e-4)


def test_spectral_norm_materialize():
    """A spectral-norm torch checkpoint converts to the eval-equivalent
    plain weight (utils/utils.py:176-186 toggles SN structurally)."""
    conv = tnn.Conv2d(5, 7, 3, padding=1)
    snconv = tnn.utils.spectral_norm(conv)
    x = torch.randn(1, 5, 6, 6)
    with torch.no_grad():
        snconv(x)  # advance the power iteration
    snconv.eval()
    with torch.no_grad():
        want = snconv(x).numpy()
    sd = tc._materialize_spectral_norm(
        {f"c.{k}": v.detach().numpy()
         for k, v in snconv.state_dict().items()})
    assert "c.weight" in sd and "c.weight_orig" not in sd
    folded = tc._conv(sd, "c")
    from jax import lax

    got = lax.conv_general_dilated(
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        jnp.asarray(folded["kernel"]), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + folded["bias"]
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=2e-4, atol=2e-4)


def _reference_mpd_sd():
    """State dict with the reference MPDDiscriminator's key names
    (models/discriminator.py:214-234), random values."""
    sd = {}

    def add_conv(key, ci, co, k):
        sd[f"{key}.weight"] = np.random.randn(co, ci, k, k).astype(
            np.float32)
        sd[f"{key}.bias"] = np.random.randn(co).astype(np.float32)

    def add_conv_block(key, ci, co):  # conv + BN
        add_conv(f"{key}.conv.0", ci, co, 4)
        sd[f"{key}.conv.1.weight"] = np.ones(co, np.float32)
        sd[f"{key}.conv.1.bias"] = np.zeros(co, np.float32)
        sd[f"{key}.conv.1.running_mean"] = np.zeros(co, np.float32)
        sd[f"{key}.conv.1.running_var"] = np.ones(co, np.float32)

    def add_vgg_block(key, ci, co, n):
        cs = [ci] + [co] * n
        for i in range(n):
            add_conv(f"{key}.block.{2 * i}", cs[i], cs[i + 1], 3)

    def add_patch(prefix, channels):
        for i in range(len(channels) - 1):
            add_conv_block(f"{prefix}.net.{i}", channels[i], channels[i + 1])
        add_conv(f"{prefix}.outConv", channels[-1], 1, 4)

    add_vgg_block("ConvBlock0", 4, 64, 2)
    add_vgg_block("ConvBlock1", 128, 128, 2)
    add_vgg_block("ConvBlock2", 256, 256, 3)
    add_patch("localD1", [256, 256, 256])
    add_patch("localD2", [512, 256, 256])
    add_patch("Dmain", [512, 256, 256, 256])
    vgg_widths = ((3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                  (256, 256), (256, 256))
    flat = [idx for block in tc._VGG16_PARTIAL_SLICES for idx in block]
    for (sl, idx), (ci, co) in zip(flat, vgg_widths):
        add_conv(f"extractor.{sl}.{idx}", ci, co, 3)
    return sd


def test_mpd_conversion_structure():
    from kbe_tpu.models.discriminator import MPDDiscriminator

    converted = tc.convert_discriminator(_reference_mpd_sd(), kind="mpd")
    model = MPDDiscriminator()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     jnp.zeros((1, 64, 64, 1)), train=False)
    got = _tree_shapes(jax.tree_util.tree_map(jnp.asarray, converted))
    want = _tree_shapes(ref)
    assert got == want

    # Dmain's dilated convs (8, 4, 1) need >= ~264 px input for a
    # non-empty patch map (the reference trains on 756x1024 crops).
    outs = model.apply(converted, jnp.zeros((1, 288, 288, 3)),
                       jnp.zeros((1, 288, 288, 1)), train=False)
    assert len(outs) == 3
    assert all(o.shape[1] > 0 and o.shape[2] > 0 for o in outs)


def _tv_inception_sd():
    """torchvision inception_v3 state dict (keys + shapes), random values,
    synthesized by inverting the converter mapping from our init shapes."""
    from kbe_tpu.models.inception import InceptionV3Features

    init = InceptionV3Features().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]
    sd = {}

    def add_unit(tv_key, kernel_shape):
        kh, kw, ci, co = kernel_shape
        sd[f"{tv_key}.conv.weight"] = np.random.randn(
            co, ci, kh, kw).astype(np.float32) * 0.05
        sd[f"{tv_key}.bn.weight"] = np.random.uniform(
            0.5, 1.5, co).astype(np.float32)
        sd[f"{tv_key}.bn.bias"] = np.zeros(co, np.float32)
        sd[f"{tv_key}.bn.running_mean"] = np.zeros(co, np.float32)
        sd[f"{tv_key}.bn.running_var"] = np.ones(co, np.float32)

    for ours, tv in tc._INCEPTION_STEM:
        add_unit(tv, init[ours]["conv"]["kernel"].shape)
    for block, branches in tc._INCEPTION_BLOCKS.items():
        for b in branches:
            add_unit(f"{block}.{tc._tv_branch(b)}",
                     init[block][b]["conv"]["kernel"].shape)
    return sd


def test_inception_conversion_structure():
    from kbe_tpu.models.inception import InceptionV3Features

    model = InceptionV3Features()
    converted = tc.convert_inception(_tv_inception_sd())
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    got = _tree_shapes(jax.tree_util.tree_map(jnp.asarray, converted))
    want = _tree_shapes(ref)
    assert got == want

    feats = model.apply(converted, jnp.zeros((2, 128, 128, 3)))
    assert feats.shape == (2, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_disparity_conversion_structure(tmp_path, monkeypatch):
    sd = _reference_disparity_sd()
    monkeypatch.setattr(tc, "_load_state_dict", lambda path: sd)
    converted = tc.convert_disparity("fake.tar")

    model = Disparity()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     jnp.zeros((1, 4, 4, 512)))
    want = _tree_shapes(ref)
    got = _tree_shapes(jax.tree_util.tree_map(jnp.asarray, converted))
    assert got == want

    # and the converted params actually run
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 4, 4, 512)))
    assert out.shape == (1, 32, 32, 1)
