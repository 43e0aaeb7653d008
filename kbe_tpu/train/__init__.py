"""L4 — training, evaluation, metrics, data, checkpointing."""

from kbe_tpu.train.losses import (
    InpaintingLossConfig,
    LOSS_WEIGHTS,
    compute_loss_grad,
    compute_loss_ord,
    compute_masked_grad_loss,
    depth_loss_schedule,
    inpainting_loss,
    inpainting_loss_adv,
    joint_edge_loss,
)
from kbe_tpu.train.metrics import (
    compute_depth_metrics,
    compute_inpaint_metrics,
    psnr,
)

__all__ = [
    "InpaintingLossConfig",
    "LOSS_WEIGHTS",
    "compute_loss_grad",
    "compute_loss_ord",
    "compute_masked_grad_loss",
    "depth_loss_schedule",
    "inpainting_loss",
    "inpainting_loss_adv",
    "joint_edge_loss",
    "compute_depth_metrics",
    "compute_inpaint_metrics",
    "psnr",
]
