"""Standalone depth evaluation.

Equivalent of reference training/eval_depth.py:17-122 (``DepthEval``):
full-resolution estimation + refinement forward over an eval dataset,
aggregated 7-metric report, plus a ``get_depths`` inspection helper for
notebooks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kbe_tpu.models import Disparity, Refine, RefinePretrained, Semantics
from kbe_tpu.ops.resize import resize_to_max
from kbe_tpu.train.metrics import DEPTH_METRIC_NAMES, compute_depth_metrics


@dataclasses.dataclass
class DepthEval:
    """``params``: dict with 'semantics', 'disparity', 'refine' params.
    ``eval_pretrained`` shifts inputs from [-1, 1] to [0, 1] (the released
    nets were trained that way, eval_depth.py:61-62)."""

    params: Dict[str, Any]
    eval_pretrained: bool = False
    pretrained_refine: bool = False
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.semantics = Semantics(dtype=self.dtype)
        self.disparity = Disparity(dtype=self.dtype)
        self.refine = (RefinePretrained if self.pretrained_refine
                       else Refine)(dtype=self.dtype)
        self._step = jax.jit(self._eval_step)

    def _forward(self, image):
        resized = resize_to_max(image, 512)
        sem = self.semantics.apply(self.params["semantics"], resized)
        disp = self.disparity.apply(self.params["disparity"], resized, sem)
        disp = self.refine.apply(self.params["refine"], image, disp)
        return jnp.maximum(disp, 0.0)

    def _eval_step(self, image, disparity_gt, mask):
        if self.eval_pretrained:
            image = (image + 1.0) / 2.0
        disp = self._forward(image)
        return compute_depth_metrics(disp, disparity_gt,
                                     jnp.clip(mask, 0.0, 1.0))

    def eval(self, batches: Iterable[Dict]) -> Dict[str, float]:
        acc, n = None, 0
        for batch in batches:
            m = self._step(jnp.asarray(batch["image"]),
                           jnp.asarray(batch["disparity"]),
                           jnp.asarray(batch["mask"]))
            m = {k: float(v) for k, v in m.items()}
            acc = m if acc is None else {k: acc[k] + m[k] for k in m}
            n += 1
        return {k: v / n for k, v in acc.items()} if acc else {}

    def get_depths(self, batch: Dict):
        """Estimation / refined / GT tensors for visual inspection
        (eval_depth.py:81-122 without the unused Mask-RCNN branch)."""
        image = jnp.asarray(batch["image"])
        if self.eval_pretrained:
            image = (image + 1.0) / 2.0
        resized = resize_to_max(image, 512)
        sem = self.semantics.apply(self.params["semantics"], resized)
        est = self.disparity.apply(self.params["disparity"], resized, sem)
        refined = self.refine.apply(self.params["refine"], image, est)
        return {
            "estimation": np.asarray(est),
            "refined": np.asarray(refined),
            "gt": np.asarray(batch["disparity"]),
            "image": np.asarray((image + 1.0) / 2.0
                                if not self.eval_pretrained else image),
            "mask": np.asarray(batch["mask"]),
        }
