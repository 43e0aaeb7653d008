"""Trainer smoke tests: one jitted step of each trainer decreases nothing
but must run, produce finite losses, and update params."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbe_tpu.config import CameraConfig
from kbe_tpu.models import Semantics, VGG16Features
from kbe_tpu.train.losses import (
    LOSS_WEIGHTS,
    compute_loss_grad,
    compute_loss_ord,
    compute_masked_grad_loss,
    depth_loss_schedule,
    inpainting_loss,
    inpainting_loss_adv,
)
from kbe_tpu.train.metrics import compute_depth_metrics, psnr
from kbe_tpu.train.trainer_depth import TrainerDepth
from kbe_tpu.train.trainer_inpaint import TrainerInpaint
from kbe_tpu.train.view_synthesis import masks_a_from_b, render_view_b


def rng():
    return np.random.default_rng(0)


def _zoom_batch(b, h, w):
    r = rng()
    cw = (w * r.uniform(0.6, 0.7, b)).astype(np.float32)
    return {
        "from_cu": (w * r.uniform(0.4, 0.6, b)).astype(np.float32),
        "from_cv": (h * r.uniform(0.4, 0.6, b)).astype(np.float32),
        "from_cw": cw,
        "from_ch": (h * 0.65 * np.ones(b)).astype(np.float32),
        "to_cu": (w * r.uniform(0.4, 0.6, b)).astype(np.float32),
        "to_cv": (h * r.uniform(0.4, 0.6, b)).astype(np.float32),
        "to_cw": (w * 0.62 * np.ones(b)).astype(np.float32),
        "to_ch": (h * 0.62 * np.ones(b)).astype(np.float32),
    }


def _depth_batch(b, h, w, with_masks=False):
    r = rng()
    batch = {
        "image": r.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "disparity": r.uniform(1, 60, (b, h // 2, w // 2, 1)).astype(
            np.float32),
        "mask": (r.uniform(0, 1, (b, h // 2, w // 2, 1)) > 0.2).astype(
            np.float32),
    }
    if with_masks:
        batch["instance_masks"] = (r.uniform(
            0, 1, (b, 2, h // 2, w // 2, 1)) > 0.7).astype(np.float32)
    return batch


# ---------------------------------------------------------------- losses


def test_loss_ord_modes_finite():
    r = rng()
    d = jnp.asarray(r.uniform(1, 50, (2, 16, 16, 1)).astype(np.float32))
    t = jnp.asarray(r.uniform(1, 50, (2, 16, 16, 1)).astype(np.float32))
    m = jnp.ones((2, 16, 16, 1))
    for mode in ("L1", "rmse", "logrmse"):
        v = float(compute_loss_ord(d, t, m, mode))
        assert np.isfinite(v)
    # empty mask -> zero loss, not NaN
    assert float(compute_loss_ord(d, t, jnp.zeros_like(m), "L1")) == 0.0


def test_loss_grad_and_masked_grad():
    r = rng()
    d = jnp.asarray(r.uniform(1, 50, (1, 32, 32, 1)).astype(np.float32))
    t = d * 1.1
    m = jnp.ones((1, 32, 32, 1))
    assert np.isfinite(float(compute_loss_grad(d, t, m)))
    assert np.isfinite(float(compute_masked_grad_loss(d, m, (1, 2), 0.5)))


def test_depth_schedule_limits():
    g0 = depth_loss_schedule(0)
    ginf = depth_loss_schedule(1_000_000)
    np.testing.assert_allclose(float(g0[0]), 0.09, rtol=1e-5)
    np.testing.assert_allclose(float(g0[1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(ginf[0]), 0.03, rtol=1e-4)
    np.testing.assert_allclose(float(ginf[1]), 1.0, rtol=1e-4)


def test_inpainting_loss_keys():
    r = rng()
    vgg = VGG16Features()
    x = jnp.asarray(r.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    vp = vgg.init(jax.random.PRNGKey(0), x)
    feats = lambda im: vgg.apply(vp, im)
    mask = jnp.ones((1, 32, 32, 1)).at[:, 8:16, 8:16].set(0.0)
    out = jnp.asarray(r.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    ld = inpainting_loss(feats, x * mask, mask, out, x)
    assert set(ld) == {"prc", "hole", "valid", "style", "tv"}
    total = sum(LOSS_WEIGHTS[k] * float(v) for k, v in ld.items())
    assert np.isfinite(total)

    disp = jnp.asarray(r.uniform(1, 50, (1, 32, 32, 1)).astype(np.float32))
    la = inpainting_loss_adv(x, mask, out, disp, disp * 1.05)
    assert set(la) == {"valid", "tv", "mask", "valid_depth"}


def test_depth_metrics_perfect_prediction():
    d = jnp.asarray(rng().uniform(1, 50, (1, 16, 16, 1)).astype(np.float32))
    m = compute_depth_metrics(d, d, jnp.ones_like(d))
    assert float(m["abs_rel"]) == 0.0
    assert float(m["a1"]) == 1.0
    assert float(psnr(d / 50, d / 50)) > 100


# ------------------------------------------------------- view synthesis


def test_view_synthesis_shapes():
    b, h, w = 2, 48, 64
    r = rng()
    img = jnp.asarray(r.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    # smooth disparity (noise disparity would fail the laplacian validity
    # filter everywhere, as it does in the reference)
    base = np.full((b, h, w, 1), 30.0, np.float32)
    base[:, 10:30, 20:50] = 50.0
    disp = jnp.asarray(base)
    camera = CameraConfig(focal=64.0, baseline=30.0)
    depth = camera.focal * camera.baseline / (disp + 1e-7)
    zoom = {k: jnp.asarray(v) for k, v in _zoom_batch(b, h, w).items()}
    masks, shift = masks_a_from_b(img, disp, depth, zoom, camera)
    assert masks.shape == (b, h, w, 1)
    assert shift.shape == (b, 3)
    assert 0.0 < float(masks.mean()) <= 1.0

    render, m2, pts, shift2 = render_view_b(img, disp, depth, zoom, camera)
    assert render.shape == (b, h, w, 4)
    assert m2.shape == (b, h, w, 1)


# ------------------------------------------------------------- trainers


def test_depth_trainer_step_updates_params():
    h, w = 64, 64
    sem = Semantics()
    sp = sem.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)))
    tr = TrainerDepth({"model_to_train": "disparity", "lr_estimation": 1e-4,
                       "gamma_lr": 0.9999},
                      semantics_params=sp,
                      logs_path="/tmp/kbe_runs/depth")
    state = tr.init_state((h, w))
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   _depth_batch(1, h, w, with_masks=True))
    state2, metrics = jax.jit(tr.disparity_train_step)(state, batch)
    assert int(state2.step) == 1
    for v in metrics.values():
        assert np.isfinite(float(v))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).sum()), state.params,
        state2.params)
    assert sum(jax.tree_util.tree_leaves(diff)) > 0


def test_refine_trainer_step():
    h, w = 64, 64
    sem = Semantics()
    sp = sem.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)))
    tr = TrainerDepth({"model_to_train": "refine", "lr_refine": 1e-5,
                       "gamma_lr": 0.9999, "estimation_size": 32},
                      semantics_params=sp, logs_path="/tmp/kbe_runs/refine")
    dstate, rstate = tr.init_state((h, w), "refine")
    r = rng()
    batch = {
        "image": jnp.asarray(r.uniform(-1, 1, (1, h, w, 3)).astype(
            np.float32)),
        "disparity": jnp.asarray(r.uniform(1, 60, (1, h, w, 1)).astype(
            np.float32)),
        "mask": jnp.ones((1, h, w, 1)),
    }
    rstate2, metrics = jax.jit(tr.refine_train_step)(dstate, rstate, batch)
    assert np.isfinite(float(metrics["total"]))


def test_inpaint_supervised_step():
    h, w = 48, 64
    tr = TrainerInpaint({"model_to_train": "inpainting", "lr_inpaint": 1e-4,
                         "gamma_lr": 0.9999},
                        camera=CameraConfig(focal=64.0, baseline=30.0),
                        logs_path="/tmp/kbe_runs/inpaint")
    state = tr.init_state((h, w))
    r = rng()
    disp = r.uniform(10, 60, (1, h, w, 1)).astype(np.float32)
    batch = {
        "image": r.uniform(-1, 1, (1, h, w, 3)).astype(np.float32),
        "disparity": disp,
        "depth": (64.0 * 30.0 / (disp + 1e-7)).astype(np.float32),
        "zoom": _zoom_batch(1, h, w),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state2, metrics = jax.jit(tr.supervised_step)(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total"]))


def test_inpaint_adversarial_step():
    h, w = 288, 288  # discriminator minimum size
    tr = TrainerInpaint({"model_to_train": "inpainting", "adversarial": True,
                         "lr_inpaint": 1e-4, "lr_D": 1e-4,
                         "gamma_lr": 0.9999},
                        camera=CameraConfig(focal=256.0, baseline=60.0),
                        logs_path="/tmp/kbe_runs/adv")
    state = tr.init_state((h, w))
    d_state = tr.init_disc_state((h, w))
    r = rng()
    disp = r.uniform(10, 60, (1, h, w, 1)).astype(np.float32)
    batch = {
        "image": r.uniform(-1, 1, (1, h, w, 3)).astype(np.float32),
        "disparity": disp,
        "depth": (256.0 * 60.0 / (disp + 1e-7)).astype(np.float32),
        "zoom": _zoom_batch(1, h, w),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    # D-only step (pretrain phase)
    state, d_state, m1 = tr.adversarial_step(state, d_state, batch, False)
    assert np.isfinite(float(m1["loss_d"]))
    # G+D step
    state, d_state, m2 = tr.adversarial_step(state, d_state, batch, True)
    assert np.isfinite(float(m2["total_g"]))
    assert np.isfinite(float(m2["loss_d"]))


def test_weights_init_selector_stats():
    from kbe_tpu.models.init import apply_weights_init

    params = {"conv": {"kernel": jnp.zeros((3, 3, 64, 128)),
                       "bias": jnp.ones((128,))},
              "prelu": {"slope": jnp.full((64,), 0.25)}}
    key = jax.random.PRNGKey(0)

    fan_in, fan_out = 64 * 9, 128 * 9
    out = apply_weights_init(params, key, "xavier", gain=1.4)
    std = float(jnp.std(out["conv"]["kernel"]))
    want = 1.4 * np.sqrt(2.0 / (fan_in + fan_out))
    assert abs(std - want) / want < 0.05
    # biases / PReLU untouched (reference touches only Conv weights)
    assert float(jnp.sum(out["prelu"]["slope"])) == pytest.approx(16.0)
    assert float(jnp.sum(out["conv"]["bias"])) == pytest.approx(128.0)

    out = apply_weights_init(params, key, "he")
    std = float(jnp.std(out["conv"]["kernel"]))
    want = np.sqrt(2.0 / fan_in)
    assert abs(std - want) / want < 0.05

    out = apply_weights_init(params, key, "normal", gain=1.4)
    assert abs(float(jnp.std(out["conv"]["kernel"])) - 1.4) / 1.4 < 0.05

    out = apply_weights_init(params, key, "orthogonal", gain=2.0)
    k = np.asarray(out["conv"]["kernel"], np.float64)
    mat = k.transpose(3, 0, 1, 2).reshape(128, fan_in) / 2.0
    np.testing.assert_allclose(mat @ mat.T, np.eye(128), atol=1e-4)

    assert apply_weights_init(params, key, "none") is params


def test_pretrained_warmstart_and_resume(tmp_path):
    """VERDICT item 4: refine mode trains from a saved estimation
    checkpoint, and a killed run resumes at its iteration count with
    optimizer state intact."""
    from kbe_tpu.train.checkpoint import (load_checkpoint,
                                          load_pretrained_params,
                                          save_checkpoint)

    h, w = 64, 64
    sem = Semantics()
    sp = sem.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)))
    tr = TrainerDepth({"model_to_train": "disparity", "lr_estimation": 1e-4,
                       "gamma_lr": 0.9999, "init": "none"},
                      semantics_params=sp,
                      logs_path=str(tmp_path / "logs"))
    state = tr.init_state((h, w))
    batch = jax.tree_util.tree_map(jnp.asarray, _depth_batch(1, h, w))
    state, _ = jax.jit(tr.disparity_train_step)(state, batch)

    path = save_checkpoint(str(tmp_path / "ck"), "est", state, 7)

    # (a) warm start: the loaded params equal the trained estimation net
    loaded = load_pretrained_params(path, "disparity")
    tr2 = TrainerDepth({"model_to_train": "refine", "lr_refine": 1e-5,
                        "gamma_lr": 0.9999, "estimation_size": 32,
                        "init": "none"},
                       semantics_params=sp,
                       logs_path=str(tmp_path / "logs2"))
    dstate, rstate = tr2.init_state((h, w), "refine",
                                    disparity_params=loaded)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), dstate.params,
        state.params)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    # and a refine step from the warm start runs
    rbatch = {
        "image": jnp.asarray(rng().uniform(-1, 1, (1, h, w, 3)).astype(
            np.float32)),
        "disparity": jnp.asarray(rng().uniform(1, 60, (1, h, w, 1)).astype(
            np.float32)),
        "mask": jnp.ones((1, h, w, 1)),
    }
    _, metrics = jax.jit(tr2.refine_train_step)(dstate, rstate, rbatch)
    assert np.isfinite(float(metrics["total"]))

    # (b) resume: full state (params + optimizer + step) round-trips
    restored, step = load_checkpoint(path, state)
    assert int(step) == 7
    same = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                   - jnp.asarray(b, jnp.float32)).max()),
        restored, state)
    assert max(jax.tree_util.tree_leaves(same)) == 0.0
    # the trainer picks up at the given iteration
    out_state = tr.train(iter([]), lambda: iter([]), (h, w),
                         resume_state=restored, resume_step=8)
    assert tr.iter_nb == 8
    assert int(out_state.step) == int(state.step)


def test_mesh_adversarial_step_8dev():
    """VERDICT item 5: a mesh-sharded GAN step over 8 virtual devices
    (states replicated, batch sharded, psum grad all-reduces)."""
    from kbe_tpu.parallel import data_mesh, replicate, shard_batch

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = data_mesh(8)
    h = w = 288
    tr = TrainerInpaint({"model_to_train": "inpainting",
                         "adversarial": True, "lr_inpaint": 1e-4,
                         "lr_D": 1e-4, "gamma_lr": 0.9999, "init": "none"},
                        camera=CameraConfig(focal=144.0, baseline=60.0),
                        logs_path="/tmp/kbe_runs/adv_mesh", mesh=mesh)
    with mesh:
        state = replicate(mesh, tr.init_state((h, w)))
        d_state = replicate(mesh, tr.init_disc_state((h, w)))
        r = rng()
        disp = r.uniform(10, 60, (8, h, w, 1)).astype(np.float32)
        batch = shard_batch(mesh, {
            "image": r.uniform(-1, 1, (8, h, w, 3)).astype(np.float32),
            "disparity": disp,
            "depth": (144.0 * 60.0 / (disp + 1e-7)).astype(np.float32),
            "zoom": _zoom_batch(8, h, w),
        })
        step = tr._jit("adv", tr.adversarial_step, static_argnums=(3,))
        state, d_state, m = step(state, d_state, batch, True)
        assert np.isfinite(float(m["loss_d"]))
        assert np.isfinite(float(m["total_g"]))
