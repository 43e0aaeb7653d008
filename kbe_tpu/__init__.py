"""kbe_tpu — a TPU-native (JAX/XLA/Pallas) 3D Ken Burns effect framework.

A from-scratch re-design of the capabilities of pierlj/ken-burns-effect
(3D Ken Burns from a single image, Niklaus et al. arXiv:1909.05483, plus
dolly-zoom, 2D KBE, semi-supervised inpainting training) for TPU hardware:

- compute path: jax / XLA / Pallas, NHWC layouts, static shapes, one XLA
  launch for the whole 75-frame effect,
- parallelism: ``jax.sharding.Mesh`` + ``shard_map``/jit batch data
  parallelism over ICI (the reference is single-GPU only; see
  reference utils/utils.py:17-18),
- deterministic splatting: the reference's racy CUDA atomics
  (reference utils/common.py:275-294) are replaced by XLA scatter-min /
  scatter-add which are reproducible run to run.

Layer map (mirrors SURVEY.md §1):
  ops/       L0/L1  geometry, filters, splat renderer, disocclusion fill
  models/    L2     Flax grid-nets, refinement, inpainting, discriminators
  pipeline/  L3     jit-compiled end-to-end effect
  train/     L4     losses, trainers, eval, metrics, data, checkpoints
  parallel/  —      device mesh + sharding (new; absent in reference)
"""

__version__ = "0.1.0"

from kbe_tpu.config import CameraConfig, EffectConfig, ZoomSettings, ZoomWindow

__all__ = [
    "CameraConfig",
    "EffectConfig",
    "ZoomSettings",
    "ZoomWindow",
]
