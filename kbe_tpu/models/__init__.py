"""L2 — neural network models (Flax, NHWC, bf16-capable).

Flax re-designs of the reference's PyTorch model zoo
(reference models/*.py): the grid-net family (Disparity, Inpaint), the
Refine U-nets, the VGG19-bn Semantics extractor, NVIDIA-style partial
convolutions, and the discriminator family.
"""

from kbe_tpu.models.layers import Basic, Downsample, PReLU, Upsample
from kbe_tpu.models.gridnet import Disparity, Inpaint
from kbe_tpu.models.refine import Refine, RefinePretrained
from kbe_tpu.models.semantics import Semantics
from kbe_tpu.models.partial_conv import PartialConv, PartialInpaint
from kbe_tpu.models.discriminator import (
    Discriminator,
    MPDDiscriminator,
    MultiScaleDiscriminator,
    MultiScalePerceptualDiscriminator,
    PerceptualDiscriminator,
)
from kbe_tpu.models.vgg import VGG16Features
from kbe_tpu.models.maskrcnn import MaskRCNN, maskrcnn_instance_masks

__all__ = [
    "Basic",
    "Downsample",
    "PReLU",
    "Upsample",
    "Disparity",
    "Inpaint",
    "Refine",
    "RefinePretrained",
    "Semantics",
    "PartialConv",
    "PartialInpaint",
    "Discriminator",
    "MPDDiscriminator",
    "MultiScaleDiscriminator",
    "MultiScalePerceptualDiscriminator",
    "PerceptualDiscriminator",
    "VGG16Features",
    "MaskRCNN",
    "maskrcnn_instance_masks",
]
