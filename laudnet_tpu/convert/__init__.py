from laudnet_tpu.convert.torch_loader import (
    convert_resnet_state_dict,
    load_pth_tar,
)

from laudnet_tpu.convert.torch_loader import (
    convert_detection_backbone_state_dict,
    convert_regnet_state_dict,
    merge_variables,
)
from laudnet_tpu.convert.torch_export import (
    export_resnet_state_dict,
    save_pth_tar,
)
from laudnet_tpu.convert.vit_loader import convert_vit_state_dict

__all__ = [
    "convert_vit_state_dict",
    "convert_resnet_state_dict",
    "convert_regnet_state_dict",
    "convert_detection_backbone_state_dict",
    "merge_variables",
    "load_pth_tar",
    "export_resnet_state_dict",
    "save_pth_tar",
]
