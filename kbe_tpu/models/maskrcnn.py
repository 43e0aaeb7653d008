"""TPU-native Mask R-CNN (ResNet50-FPN) — instance masks for the depth
mask loss.

The reference uses torchvision's ``maskrcnn_resnet50_fpn`` frozen, in
no_grad, purely as an instance-mask source for ``compute_masked_grad_loss``
(training/train_depth.py:55,151-163,261-288 — only ``pred['masks']`` is
consumed). This is a from-scratch Flax implementation of that inference
path with an XLA-friendly static-shape design:

  * frozen BatchNorm folded into convs at conversion (the torchvision
    model uses FrozenBatchNorm2d — eval stats always);
  * fixed-capacity proposal/detection sets (``num_proposals``,
    ``num_detections``) instead of data-dependent filtering: scores of
    suppressed/empty slots are zeroed, never dropped;
  * greedy NMS as a bounded ``lax.fori_loop`` over the sorted static set
    (class-offset trick for the per-class box NMS);
  * ROIAlign (sampling_ratio 2, aligned=False torchvision semantics) as
    vmapped bilinear gathers against every FPN level + a level-assignment
    select — no dynamic shapes anywhere.

Weights: utils/torch_convert.convert_maskrcnn maps a torchvision-format
``state_dict`` (structure-tested offline; real weights drop in the moment
they are downloadable). Random-weight forward passes are shape/finite-
tested in tests/test_maskrcnn.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any

_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

# ResNet50 stage config: (blocks, bottleneck width)
_STAGES: Tuple[Tuple[int, int], ...] = ((3, 64), (4, 128), (6, 256),
                                        (3, 512))
_ANCHOR_SIZES = (32.0, 64.0, 128.0, 256.0, 512.0)   # P2..P6
_ANCHOR_RATIOS = (0.5, 1.0, 2.0)
_NUM_CLASSES = 91  # COCO


def _conv(ch, k, s=1, p=None, name=None, dtype=jnp.float32):
    if p is None:
        p = k // 2
    return nn.Conv(ch, (k, k), strides=(s, s),
                   padding=((p, p), (p, p)), dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class Bottleneck(nn.Module):
    """ResNet bottleneck with folded BN (conv bias carries the BN)."""

    width: int
    stride: int = 1
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_conv(self.width, 1, name="conv1",
                          dtype=self.dtype)(x))
        y = nn.relu(_conv(self.width, 3, self.stride, name="conv2",
                          dtype=self.dtype)(y))
        y = _conv(self.width * 4, 1, name="conv3", dtype=self.dtype)(y)
        if self.project:
            x = _conv(self.width * 4, 1, self.stride, name="downsample",
                      dtype=self.dtype)(x)
        return nn.relu(x + y)


class ResNet50FPN(nn.Module):
    """Backbone + FPN: image (B, H, W, 3) -> P2..P6, 256 channels each."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(64, 7, 2, name="stem", dtype=self.dtype)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        cs = []
        for si, (blocks, width) in enumerate(_STAGES):
            for b in range(blocks):
                x = Bottleneck(width, stride=(2 if b == 0 and si > 0
                                              else 1),
                               project=(b == 0), dtype=self.dtype,
                               name=f"layer{si + 1}_{b}")(x)
            cs.append(x)

        # FPN: 1x1 lateral + top-down upsample + 3x3 output convs
        laterals = [
            _conv(256, 1, name=f"fpn_inner{i}", dtype=self.dtype)(c)
            for i, c in enumerate(cs)]
        ps = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(ps[0], laterals[i].shape, "nearest")
            ps.insert(0, laterals[i] + up)
        ps = [_conv(256, 3, name=f"fpn_layer{i}", dtype=self.dtype)(p)
              for i, p in enumerate(ps)]
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return ps + [p6]


class RPNHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = _conv(256, 3, name="conv", dtype=self.dtype)
        cls = _conv(len(_ANCHOR_RATIOS), 1, name="cls_logits",
                    dtype=self.dtype)
        bbox = _conv(len(_ANCHOR_RATIOS) * 4, 1, name="bbox_pred",
                     dtype=self.dtype)
        outs = []
        for f in feats:
            t = nn.relu(conv(f))
            outs.append((cls(t), bbox(t)))
        return outs


class BoxHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, 7, 7, 256)
        # torchvision flattens NCHW: (256, 7, 7) order
        x = jnp.transpose(rois, (0, 3, 1, 2)).reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc7")(x))
        scores = nn.Dense(_NUM_CLASSES, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_score")(x)
        deltas = nn.Dense(_NUM_CLASSES * 4, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, 14, 14, 256)
        x = rois
        for i in range(4):
            x = nn.relu(_conv(256, 3, name=f"mask_fcn{i + 1}",
                              dtype=self.dtype)(x))
        x = nn.relu(nn.ConvTranspose(
            256, (2, 2), strides=(2, 2), dtype=self.dtype,
            param_dtype=jnp.float32, name="conv5_mask")(x))
        return _conv(_NUM_CLASSES, 1, name="mask_fcn_logits",
                     dtype=self.dtype)(x)   # (N, 28, 28, 91)


# --------------------------------------------------------------- geometry

def _anchors_for_level(h, w, stride, size):
    """(h*w*A, 4) xyxy anchors, torchvision AnchorGenerator layout."""
    ws, hs = [], []
    for r in _ANCHOR_RATIOS:
        hr = math.sqrt(r)
        ws.append(size / hr)
        hs.append(size * hr)
    ws = jnp.asarray(ws, jnp.float32)
    hs = jnp.asarray(hs, jnp.float32)
    cx = (jnp.arange(w, dtype=jnp.float32) * stride)[None, :, None]
    cy = (jnp.arange(h, dtype=jnp.float32) * stride)[:, None, None]
    zeros = jnp.zeros((h, w, len(_ANCHOR_RATIOS)), jnp.float32)
    x1 = cx + zeros - ws / 2.0
    y1 = cy + zeros - hs / 2.0
    x2 = cx + zeros + ws / 2.0
    y2 = cy + zeros + hs / 2.0
    return jnp.stack([x1, y1, x2, y2], -1).reshape(-1, 4)


def _decode(boxes, deltas, wx=1.0, wy=1.0, ww=1.0, wh=1.0):
    """torchvision BoxCoder.decode (xyxy boxes, dxdydwdh deltas)."""
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * bw
    cy = boxes[:, 1] + 0.5 * bh
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, -20.0, math.log(1000.0 / 16))
    dh = jnp.clip(deltas[:, 3] / wh, -20.0, math.log(1000.0 / 16))
    pcx = cx + dx * bw
    pcy = cy + dy * bh
    pw = jnp.exp(dw) * bw
    ph = jnp.exp(dh) * bh
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], -1)


def _clip_boxes(boxes, h, w):
    return jnp.stack([jnp.clip(boxes[:, 0], 0.0, w),
                      jnp.clip(boxes[:, 1], 0.0, h),
                      jnp.clip(boxes[:, 2], 0.0, w),
                      jnp.clip(boxes[:, 3], 0.0, h)], -1)


def _iou_matrix(boxes):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0))
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _nms_keep(boxes, scores, iou_thresh):
    """Greedy NMS over a score-sorted static set: returns scores with
    suppressed entries zeroed (same order)."""
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    iou = _iou_matrix(b)
    n = boxes.shape[0]

    def body(i, alive):
        # if slot i is alive, kill all lower-scored overlapping slots
        kill = (iou[i] > iou_thresh) & (jnp.arange(n) > i) & alive[i]
        return alive & ~kill

    alive = lax.fori_loop(0, n, body,
                          jnp.ones((n,), jnp.bool_) & (s > 0))
    inv = jnp.argsort(order)
    return jnp.where(alive, s, 0.0)[inv]


def _roi_align(feat, boxes, out_size, spatial_scale):
    """torchvision ROIAlign (sampling_ratio=2, aligned=False).

    ``feat``: (H, W, C); ``boxes``: (N, 4) xyxy image coords.
    Returns (N, out_size, out_size, C).
    """
    fh, fw, c = feat.shape
    n = boxes.shape[0]
    ss = 2  # sampling ratio

    x1 = boxes[:, 0] * spatial_scale
    y1 = boxes[:, 1] * spatial_scale
    bw = jnp.maximum(boxes[:, 2] * spatial_scale - x1, 1.0)
    bh = jnp.maximum(boxes[:, 3] * spatial_scale - y1, 1.0)
    bin_w = bw / out_size
    bin_h = bh / out_size

    # sample grid: (out, ss) offsets per axis
    grid = (jnp.arange(out_size * ss, dtype=jnp.float32) + 0.5) / ss
    sx = x1[:, None] + bin_w[:, None] * grid[None, :]   # (N, out*ss)
    sy = y1[:, None] + bin_h[:, None] * grid[None, :]

    def gather_bilinear(px, py):
        # px, py: (N, S) continuous feature coords
        px = jnp.clip(px - 0.5, 0.0, fw - 1.0)
        py = jnp.clip(py - 0.5, 0.0, fh - 1.0)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        x1_ = jnp.minimum(x0 + 1, fw - 1)
        y1_ = jnp.minimum(y0 + 1, fh - 1)
        flat = feat.reshape(-1, c)

        # the sample grid is separable (sy x sx outer product), so one
        # (N, Sy, Sx) index outer-product per corner gathers everything
        def corner(yi, xi):
            idx = yi[:, :, None] * fw + xi[:, None, :]
            return flat[idx]

        v00 = corner(y0, x0)
        v01 = corner(y0, x1_)
        v10 = corner(y1_, x0)
        v11 = corner(y1_, x1_)
        wy0 = (1.0 - fy)[:, :, None, None]
        wy1 = fy[:, :, None, None]
        wx0 = (1.0 - fx)[:, None, :, None]
        wx1 = fx[:, None, :, None]
        return (v00 * wy0 * wx0 + v01 * wy0 * wx1
                + v10 * wy1 * wx0 + v11 * wy1 * wx1)

    samples = gather_bilinear(sx, sy)   # (N, out*ss, out*ss, C)
    samples = samples.reshape(n, out_size, ss, out_size, ss, c)
    return jnp.mean(samples, axis=(2, 4))


def _roi_align_pyramid(feats, boxes, out_size, canonical=224.0):
    """Multi-level ROIAlign with the FPN level-assignment rule
    (lvl = 4 + log2(sqrt(area)/224), clamped to P2..P5)."""
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    lvl = jnp.floor(4.0 + jnp.log2(jnp.sqrt(bw * bh) / canonical + 1e-8))
    lvl = jnp.clip(lvl, 2.0, 5.0).astype(jnp.int32)   # P2..P5
    outs = [
        _roi_align(feats[i][0], boxes, out_size, 1.0 / (2 ** (i + 2)))
        for i in range(4)]
    stacked = jnp.stack(outs)  # (4, N, out, out, C)
    sel = (lvl - 2)[None, :, None, None, None] == jnp.arange(
        4)[:, None, None, None, None]
    return jnp.sum(jnp.where(sel, stacked, 0.0), axis=0)


def _paste_masks(masks, boxes, h, w):
    """(N, 28, 28) sigmoid masks + (N, 4) boxes -> (N, h, w) soft masks
    (torchvision paste_masks_in_image bilinear semantics)."""
    m = masks.shape[1]

    def paste(mask, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - x1) / bw * m - 0.5
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - y1) / bh * m - 0.5
        x0 = jnp.clip(jnp.floor(xs), 0.0, m - 1.0)
        y0 = jnp.clip(jnp.floor(ys), 0.0, m - 1.0)
        fx = jnp.clip(xs - x0, 0.0, 1.0)
        fy = jnp.clip(ys - y0, 0.0, 1.0)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, m - 1)
        y1i = jnp.minimum(y0i + 1, m - 1)
        v00 = mask[y0i[:, None], x0i[None, :]]
        v01 = mask[y0i[:, None], x1i[None, :]]
        v10 = mask[y1i[:, None], x0i[None, :]]
        v11 = mask[y1i[:, None], x1i[None, :]]
        val = (v00 * (1 - fy[:, None]) * (1 - fx[None, :])
               + v01 * (1 - fy[:, None]) * fx[None, :]
               + v10 * fy[:, None] * (1 - fx[None, :])
               + v11 * fy[:, None] * fx[None, :])
        inside = ((jnp.arange(w, dtype=jnp.float32)[None, :] >= x1)
                  & (jnp.arange(w, dtype=jnp.float32)[None, :] < x2)
                  & (jnp.arange(h, dtype=jnp.float32)[:, None] >= y1)
                  & (jnp.arange(h, dtype=jnp.float32)[:, None] < y2))
        return jnp.where(inside, val, 0.0)

    return jax.vmap(paste)(masks, boxes)


class MaskRCNN(nn.Module):
    """Frozen Mask R-CNN inference: images -> instance masks.

    ``images``: (B, H, W, 3) RGB in [0, 1] (torchvision normalizes
    internally; the reference feeds its [-1, 1] tensors directly,
    training/train_depth.py:154 — callers reproduce that by passing the
    same). Returns dict with ``masks`` (B, num_detections, H, W) soft
    masks, ``scores``, ``labels`` — fixed-capacity, empty slots have
    score 0.
    """

    num_proposals: int = 256     # post-NMS RPN proposals kept
    pre_nms_top_n: int = 512     # per-level pre-NMS candidates
    num_detections: int = 32     # final detections per image
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        b, h, w, _ = images.shape
        x = ((images - _IMAGENET_MEAN) / _IMAGENET_STD).astype(self.dtype)
        feats = ResNet50FPN(dtype=self.dtype, name="backbone")(x)
        rpn_outs = RPNHead(dtype=self.dtype, name="rpn")(feats)
        box_head = BoxHead(dtype=self.dtype, name="box_head")
        mask_head = MaskHead(dtype=self.dtype, name="mask_head")

        def one_image(idx):
            # ---- RPN: per-level top-k -> decode -> clip -> NMS
            all_boxes, all_scores = [], []
            for li, (cls, bbox) in enumerate(rpn_outs):
                fh, fw = cls.shape[1], cls.shape[2]
                stride = 2 ** (li + 2)
                anchors = _anchors_for_level(fh, fw, stride,
                                             _ANCHOR_SIZES[li])
                scores = cls[idx].reshape(-1).astype(jnp.float32)
                deltas = bbox[idx].reshape(-1, 4).astype(jnp.float32)
                k = min(self.pre_nms_top_n, scores.shape[0])
                top, ti = lax.top_k(scores, k)
                boxes = _decode(anchors[ti], deltas[ti])
                boxes = _clip_boxes(boxes, float(h), float(w))
                # drop degenerate boxes (torchvision min_size 1e-3)
                ok = ((boxes[:, 2] - boxes[:, 0] > 1e-3)
                      & (boxes[:, 3] - boxes[:, 1] > 1e-3))
                s = jnp.where(ok, jax.nn.sigmoid(top), 0.0)
                s = _nms_keep(boxes, s, self.rpn_nms_thresh)
                all_boxes.append(boxes)
                all_scores.append(s)
            boxes = jnp.concatenate(all_boxes)
            scores = jnp.concatenate(all_scores)
            k = min(self.num_proposals, scores.shape[0])
            _, keep = lax.top_k(scores, k)
            proposals = boxes[keep]

            # ---- box head
            rois = _roi_align_pyramid(
                [f[idx:idx + 1] for f in feats], proposals, 7)
            cls_scores, deltas = box_head(rois)
            probs = jax.nn.softmax(cls_scores.astype(jnp.float32), -1)
            # best foreground class per proposal (torchvision evaluates
            # every class; the winning class dominates the mask-source
            # use case and keeps the set static)
            fg = probs[:, 1:]
            label = jnp.argmax(fg, -1) + 1
            score = jnp.max(fg, -1)
            dsel = jnp.take_along_axis(
                deltas.astype(jnp.float32).reshape(-1, _NUM_CLASSES, 4),
                label[:, None, None].repeat(4, -1), 1)[:, 0]
            det_boxes = _decode(proposals, dsel, 10.0, 10.0, 5.0, 5.0)
            det_boxes = _clip_boxes(det_boxes, float(h), float(w))
            score = jnp.where(score >= self.box_score_thresh, score, 0.0)
            # class-offset trick: per-class NMS in one pass
            off = label.astype(jnp.float32)[:, None] * (max(h, w) + 2.0)
            score = _nms_keep(det_boxes + off, score,
                              self.box_nms_thresh)
            k2 = min(self.num_detections, score.shape[0])
            top_s, di = lax.top_k(score, k2)
            det_boxes = det_boxes[di]
            det_labels = label[di]

            # ---- mask head
            mrois = _roi_align_pyramid(
                [f[idx:idx + 1] for f in feats], det_boxes, 14)
            logits = mask_head(mrois).astype(jnp.float32)  # (K,28,28,91)
            msel = jnp.take_along_axis(
                logits, det_labels[:, None, None, None].repeat(
                    28, 1).repeat(28, 2), 3)[..., 0]
            masks = _paste_masks(jax.nn.sigmoid(msel), det_boxes, h, w)
            masks = masks * (top_s > 0.0)[:, None, None]
            return {"boxes": det_boxes, "labels": det_labels,
                    "scores": top_s, "masks": masks}

        outs = [one_image(i) for i in range(b)]
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}


def maskrcnn_instance_masks(params, images, module: MaskRCNN = None,
                            score_thresh: float = 0.5):
    """Mask-source adapter for KBEDataset(mask_source=...) /
    TrainerDepth: (B, H, W, 3) [0,1] -> (B, K, H, W, 1) binary masks."""
    module = module or MaskRCNN()
    out = module.apply(params, images)
    keep = out["scores"] > score_thresh
    masks = (out["masks"] > 0.5) & keep[..., None, None]
    return masks.astype(jnp.float32)[..., None]
