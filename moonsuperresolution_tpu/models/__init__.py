from moonsuperresolution_tpu.models.layers import (
    SPADE,
    SpadeResidualBlock,
    DownsampleBlock,
    InstanceNorm,
)
from moonsuperresolution_tpu.models.networks import (
    Encoder,
    SpadeGenerator,
    SpadeDiscriminator,
)
from moonsuperresolution_tpu.models.pix2pix import (
    Pix2PixGenerator,
    Pix2PixDiscriminator,
)
from moonsuperresolution_tpu.models.vgg import VGG19Features

__all__ = [
    "SPADE",
    "SpadeResidualBlock",
    "DownsampleBlock",
    "InstanceNorm",
    "Encoder",
    "SpadeGenerator",
    "SpadeDiscriminator",
    "Pix2PixGenerator",
    "Pix2PixDiscriminator",
    "VGG19Features",
]
