"""L3 — the jit-compiled end-to-end Ken Burns effect pipeline."""

from kbe_tpu.pipeline.kenburns import KenBurnsPipeline, build_effect_fn
from kbe_tpu.pipeline.inpaint_flow import pointcloud_inpainting
from kbe_tpu.pipeline.video import write_video

__all__ = [
    "KenBurnsPipeline",
    "build_effect_fn",
    "pointcloud_inpainting",
    "write_video",
]
