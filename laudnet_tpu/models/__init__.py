from laudnet_tpu.models.maskers import (
    SpatialMasker,
    ChannelMaskerMLP,
    ChannelMaskerConvLinear,
)
from laudnet_tpu.models.laud_resnet import (
    LAUDBottleneck,
    LAUDResNet,
    LAUDOutput,
    BlockStats,
    uni_resnet50,
    uni_resnet101,
)
from laudnet_tpu.models.resnet import ResNet, resnet50, resnet101

__all__ = [
    "SpatialMasker",
    "ChannelMaskerMLP",
    "ChannelMaskerConvLinear",
    "LAUDBottleneck",
    "LAUDResNet",
    "LAUDOutput",
    "BlockStats",
    "uni_resnet50",
    "uni_resnet101",
    "ResNet",
    "resnet50",
    "resnet101",
]
