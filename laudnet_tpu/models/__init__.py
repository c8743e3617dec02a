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
from laudnet_tpu.models.resnet import (
    ResNet,
    BasicBlock,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from laudnet_tpu.models.laud_vit import (
    LAUDViT,
    LAUDViTBlock,
    LAUDViTOutput,
    laud_deit_base,
    laud_deit_small,
    laud_deit_tiny,
    laud_t2t_vit_19_backbone,
    laud_t2t_vit_19,
)
from laudnet_tpu.models.laud_regnet import (
    LAUDRegNet,
    LAUDRegNetBlock,
    RegNetParams,
    regnet_params,
    regnet_static,
    lad_regnet_y_400mf,
    lad_regnet_y_800mf,
    lad_regnet_y_1_6gf,
    lad_regnet_y_3_2gf,
    lad_regnet_y_8gf,
    lad_regnet_y_16gf,
    lad_regnet_y_32gf,
    lad_regnet_y_128gf,
    lad_regnet_x_400mf,
    lad_regnet_x_800mf,
    lad_regnet_x_1_6gf,
    lad_regnet_x_3_2gf,
    lad_regnet_x_8gf,
    lad_regnet_x_16gf,
    lad_regnet_x_32gf,
)

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
