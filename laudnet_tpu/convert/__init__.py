from laudnet_tpu.convert.torch_loader import (
    convert_resnet_state_dict,
    load_pth_tar,
)

__all__ = ["convert_resnet_state_dict", "load_pth_tar"]
