"""End-to-end frame oracle: the reference's OWN pipeline code vs ours.

VERDICT round-1 "Missing #1b": the strongest available fidelity proof is
to run the reference's actual host code (utils/common.py
process_kenburns/process_inpaint/process_shift + the torch nets'
pointcloud_inpainting) on CPU with its CUDA kernel wrappers monkeypatched
to the numpy behaviour simulators (tests/reference_sim.py), then compare
the frames of our single-XLA-program pipeline — same converted weights,
same zoom trajectory — via SSIM. Target: mean SSIM > 0.99
(BASELINE.md north star).

Our pipeline runs with splat_method='scatter' + fill_impl='xla' here: the
Pallas kernels are bit-exactness-tested against those paths separately
(tests/test_splat_banded.py, tests/test_discfill_pallas.py), and the
all-XLA program compiles in seconds on the CPU test backend where the
interpret-mode Pallas path takes tens of minutes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_sim import fill_disocclusion_sim, render_pointcloud_sim
from tests.test_parity_full import _nchw, _reference_models, _save_sd


def _sim_render_pointcloud(tensorInput, tensorData, intWidth, intHeight,
                           dblFocal, dblBaseline):
    """Drop-in for reference utils/common.py:render_pointcloud (:428-686),
    backed by the numpy kernel simulator."""
    pts = tensorInput[0].detach().numpy().T.astype(np.float64)
    data = tensorData[0].detach().numpy().T.astype(np.float64)
    img, wt = render_pointcloud_sim(pts, data, intHeight, intWidth,
                                    float(dblFocal), float(dblBaseline))
    render = torch.from_numpy(np.ascontiguousarray(img[None])).float()
    existing = torch.from_numpy(
        np.ascontiguousarray(wt[None, None])).float()
    return render, existing


def _sim_fill_disocclusion(tensorInput, tensorDepth):
    """Drop-in for reference utils/common.py:fill_disocclusion
    (:833-937)."""
    img = tensorInput[0].detach().numpy()
    depth = tensorDepth[0, 0].detach().numpy()
    out = fill_disocclusion_sim(img, depth)
    return torch.from_numpy(np.ascontiguousarray(out[None])).float()


@pytest.fixture
def patched_reference():
    ref_est, ref_ref, _, ref_inp = _reference_models()
    import utils.common as ref_common

    saved = (ref_common.render_pointcloud, ref_common.fill_disocclusion,
             ref_inp.render_pointcloud, torch.Tensor.cuda)
    ref_common.render_pointcloud = _sim_render_pointcloud
    ref_common.fill_disocclusion = _sim_fill_disocclusion
    ref_inp.render_pointcloud = _sim_render_pointcloud
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield ref_est, ref_ref, ref_inp, ref_common
    finally:
        (ref_common.render_pointcloud, ref_common.fill_disocclusion,
         ref_inp.render_pointcloud, torch.Tensor.cuda) = saved


def _scene_image(h, w, seed=3):
    """A structured test image: smooth gradients + contrasting boxes (the
    CNNs are random-weight, any content works; structure helps SSIM be a
    meaningful measure)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    img = np.stack([0.3 + 0.5 * xx, 0.2 + 0.6 * yy,
                    0.5 + 0.3 * np.sin(6 * xx)], -1)
    for _ in range(5):
        y0, x0 = rng.integers(0, h - h // 5), rng.integers(0, w - w // 5)
        bh, bw = rng.integers(h // 8, h // 5, 2)
        img[y0:y0 + bh, x0:x0 + bw] = rng.uniform(0, 1, 3)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _oracle_compare(patched_reference, mode="3d", h=192, w=192, steps=3):
    """Run both pipelines in ``mode`` ('3d' | 'dolly' | '2d') and return
    per-frame SSIM scores."""
    ref_est, ref_ref, ref_inp, ref_common = patched_reference

    import os
    import tempfile

    from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings
    from kbe_tpu.models import Semantics
    from kbe_tpu.ops.image_ops import ssim
    from kbe_tpu.pipeline.kenburns import PipelineParams, build_effect_fn
    from kbe_tpu.utils.torch_convert import (convert_disparity,
                                             convert_inpaint,
                                             convert_refine)

    dolly = mode == "dolly"
    two_d = mode == "2d"
    margin = 64
    camera = CameraConfig(focal=float(w) / 2.0, baseline=40.0)
    zoom = (ZoomSettings.default_dolly(w, h) if dolly
            else ZoomSettings.default_3d(w, h))

    # ---- shared seeded torch nets -> converted Flax params
    torch.manual_seed(5)
    net_d = ref_est.Disparity().eval()
    net_r = ref_ref.Refine().eval()
    net_i = ref_inp.Inpaint().eval()
    params = {}
    for name, net, conv in (("d", net_d, convert_disparity),
                            ("r", net_r, convert_refine),
                            ("i", net_i, convert_inpaint)):
        path = _save_sd(net)
        try:
            params[name] = conv(path)
        finally:
            os.unlink(path)
    ctx_params, inp_params = params["i"]

    image01 = _scene_image(h, w)

    # ---- semantics features: our Flax Semantics (the reference's needs
    # torchvision's pretrained VGG19-bn, unavailable offline) — BOTH
    # pipelines consume the same features
    sem_def = Semantics()
    half = jax.image.resize(jnp.asarray(image01)[None],
                            (1, h // 2, w // 2, 3), "linear")
    sem_params = sem_def.init(jax.random.PRNGKey(2), half)

    # ---- our pipeline: one jitted program
    effect = EffectConfig(num_steps=steps, depth_range_margin=margin,
                          splat_method="scatter", fill_impl="xla",
                          dolly=dolly, two_d=two_d)
    fn = jax.jit(build_effect_fn(h, w, zoom, camera, effect))
    pp = PipelineParams(semantics=sem_params, disparity=params["d"],
                        refine=params["r"], context=ctx_params,
                        inpaint=inp_params)
    ours = np.asarray(fn(pp, jnp.asarray(image01)[None])).astype(np.uint8)

    # ---- oracle: the reference's own host pipeline (pipeline.py:59-118)
    # with simulator kernels
    import cv2
    import torch.nn.functional as F

    with torch.no_grad():
        img_t = _nchw(image01[None])
        # resize_image (utils/utils.py:60-73)
        ratio = w / h
        max_size = max(h, w) // 2
        nw = min(int(max_size * ratio), max_size)
        nh = min(int(max_size / ratio), max_size)
        resized = F.interpolate(img_t, size=(nh, nw), mode="bilinear",
                                align_corners=False)
        sem_feats = sem_def.apply(sem_params, jnp.asarray(
            np.transpose(resized.numpy(), (0, 2, 3, 1))))
        disp = net_d(resized, _nchw(np.asarray(sem_feats)))
        if two_d:
            disp = torch.ones_like(disp)   # pipeline.py:75-76
        disp = net_r(img_t, disp)          # pipeline.py:78
        if disp.min() < 0.0:
            disp = disp - disp.min()       # :79-80
        disp = disp / disp.max() * camera.baseline
        depth = (camera.focal * camera.baseline) / (disp + 1e-7)
        points = ref_common.depth_to_points(depth, camera.focal)

        object_common = {
            "dblFocal": camera.focal,
            "dblBaseline": camera.baseline,
            "intWidth": w,
            "intHeight": h,
            "objectDepthrange": cv2.minMaxLoc(
                depth[0, 0, margin:-margin, margin:-margin].numpy()),
            "tensorRawPoints": points.view(1, 3, -1),
            "tensorRawImage": img_t,
            "tensorRawDisparity": disp,
            "tensorRawDepth": depth,
        }
        zoom_from = {"dblCenterU": zoom.src.center_u,
                     "dblCenterV": zoom.src.center_v,
                     "intCropWidth": zoom.src.crop_width,
                     "intCropHeight": zoom.src.crop_height}
        zoom_to = {"dblCenterU": zoom.dst.center_u,
                   "dblCenterV": zoom.dst.center_v,
                   "intCropWidth": zoom.dst.crop_width,
                   "intCropHeight": zoom.dst.crop_height}
        frames = ref_common.process_kenburns(
            {"dblSteps": np.linspace(0.0, 1.0, steps).tolist(),
             "objectFrom": zoom_from, "objectTo": zoom_to,
             "boolInpaint": True, "dolly": dolly},
            object_common, net_i)

    oracle = np.stack(frames)

    scores = []
    for i in range(steps):
        a = jnp.asarray(ours[i], jnp.float32)[None] / 255.0
        b = jnp.asarray(oracle[i], jnp.float32)[None] / 255.0
        scores.append(float(jnp.mean(ssim(a, b))))
    return scores


def _assert_ssim(scores, bound=0.99):
    mean_ssim = float(np.mean(scores))
    print("per-frame SSIM vs reference oracle:",
          [round(s, 4) for s in scores])
    assert mean_ssim > bound, f"mean SSIM {mean_ssim:.4f} vs oracle"


def test_full_pipeline_ssim_vs_reference_oracle(patched_reference):
    _assert_ssim(_oracle_compare(patched_reference, "3d"))


def test_oracle_dolly_mode(patched_reference):
    # dolly: per-step focal interpolation, inpainting skipped
    # (utils/common.py:185-187,218-219,225-227)
    _assert_ssim(_oracle_compare(patched_reference, "dolly"))


def test_oracle_2d_mode(patched_reference):
    # 2D KBE: disparity := ones before refinement (utils/pipeline.py:75-76)
    _assert_ssim(_oracle_compare(patched_reference, "2d"))


@pytest.mark.slow
def test_oracle_3d_512(patched_reference):
    # production-scale resolution, 2 poses (numpy simulator renders are
    # the cost driver)
    _assert_ssim(_oracle_compare(patched_reference, "3d", h=512, w=512,
                                 steps=2))
