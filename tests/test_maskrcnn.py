"""Mask R-CNN (M9): converter structure test + static-shape inference
smoke. torchvision is unavailable offline, so (as with Inception,
tests/test_convert.py) the structure test builds a synthetic torchvision-
keyed state dict from the documented layout, converts it, and asserts it
loads into the Flax module's parameter tree exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbe_tpu.models.maskrcnn import MaskRCNN, maskrcnn_instance_masks
from kbe_tpu.utils import torch_convert as tc

pytestmark = pytest.mark.slow  # ResNet50 inits/forwards on CPU


def _small_rcnn():
    return MaskRCNN(num_proposals=32, pre_nms_top_n=64, num_detections=8)


def _tv_maskrcnn_sd(params):
    """Synthetic torchvision-format state dict matching our param tree."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv_entry(tv_key, kernel, bias=True, bn_key=None):
        kh, kw, cin, cout = kernel.shape
        sd[f"{tv_key}.weight"] = rng.normal(
            size=(cout, cin, kh, kw)).astype(np.float32)
        if bn_key is not None:
            for suffix, val in (("weight", rng.uniform(0.5, 1.5, cout)),
                                ("bias", rng.normal(size=cout)),
                                ("running_mean", rng.normal(size=cout)),
                                ("running_var",
                                 rng.uniform(0.5, 2.0, cout))):
                sd[f"{bn_key}.{suffix}"] = val.astype(np.float32)
        elif bias:
            sd[f"{tv_key}.bias"] = rng.normal(size=cout).astype(np.float32)

    p = params["params"]
    bb = p["backbone"]
    conv_entry("backbone.body.conv1", bb["stem"]["kernel"],
               bn_key="backbone.body.bn1")
    for s, blocks in enumerate(tc._RESNET50_BLOCKS):
        for b in range(blocks):
            ours = bb[f"layer{s + 1}_{b}"]
            key = f"backbone.body.layer{s + 1}.{b}"
            for i in (1, 2, 3):
                conv_entry(f"{key}.conv{i}", ours[f"conv{i}"]["kernel"],
                           bn_key=f"{key}.bn{i}")
            if "downsample" in ours:
                conv_entry(f"{key}.downsample.0",
                           ours["downsample"]["kernel"],
                           bn_key=f"{key}.downsample.1")
    for i in range(4):
        conv_entry(f"backbone.fpn.inner_blocks.{i}",
                   bb[f"fpn_inner{i}"]["kernel"])
        conv_entry(f"backbone.fpn.layer_blocks.{i}",
                   bb[f"fpn_layer{i}"]["kernel"])
    for name in ("conv", "cls_logits", "bbox_pred"):
        conv_entry(f"rpn.head.{name}", p["rpn"][name]["kernel"])
    for tv, ours in (("box_head.fc6", "fc6"), ("box_head.fc7", "fc7"),
                     ("box_predictor.cls_score", "cls_score"),
                     ("box_predictor.bbox_pred", "bbox_pred")):
        k = p["box_head"][ours]["kernel"]
        sd[f"roi_heads.{tv}.weight"] = rng.normal(
            size=(k.shape[1], k.shape[0])).astype(np.float32)
        sd[f"roi_heads.{tv}.bias"] = rng.normal(
            size=k.shape[1]).astype(np.float32)
    for i in (1, 2, 3, 4):
        conv_entry(f"roi_heads.mask_head.mask_fcn{i}",
                   p["mask_head"][f"mask_fcn{i}"]["kernel"])
    kt = p["mask_head"]["conv5_mask"]["kernel"]  # (kh, kw, in, out)
    sd["roi_heads.mask_predictor.conv5_mask.weight"] = rng.normal(
        size=(kt.shape[2], kt.shape[3], kt.shape[0], kt.shape[1])
    ).astype(np.float32)
    sd["roi_heads.mask_predictor.conv5_mask.bias"] = rng.normal(
        size=kt.shape[3]).astype(np.float32)
    conv_entry("roi_heads.mask_predictor.mask_fcn_logits",
               p["mask_head"]["mask_fcn_logits"]["kernel"])
    return sd


def test_maskrcnn_conversion_structure():
    model = _small_rcnn()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = _tv_maskrcnn_sd(init)
    converted = tc.convert_maskrcnn(sd)

    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    assert len(flat_i) == len(flat_c), (len(flat_i), len(flat_c))
    for path, leaf in flat_i:
        assert path in flat_c, path
        assert flat_c[path].shape == leaf.shape, (
            path, flat_c[path].shape, leaf.shape)
    # loaded params must run
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_maskrcnn_inference_static_shapes():
    model = _small_rcnn()
    h = w = 64
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, h, w, 3)))
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)), jnp.float32)
    out = jax.jit(model.apply)(params, imgs)
    assert out["masks"].shape == (2, model.num_detections, h, w)
    assert out["boxes"].shape == (2, model.num_detections, 4)
    assert out["scores"].shape == (2, model.num_detections)
    m = np.asarray(out["masks"])
    assert np.isfinite(m).all() and m.min() >= 0.0 and m.max() <= 1.0

    masks = maskrcnn_instance_masks(params, imgs, model,
                                    score_thresh=0.0)
    assert masks.shape == (2, model.num_detections, h, w, 1)
    assert set(np.unique(np.asarray(masks))) <= {0.0, 1.0}
