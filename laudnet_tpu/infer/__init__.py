from laudnet_tpu.infer.layerskip import (
    build_layer_skip_resnet,
    build_layer_skip_vit,
)
from laudnet_tpu.infer.calibrate import (
    calibrate_token_capacity,
    calibrate_patch_capacity,
    calibrate_channel_masks,
    calibration_fidelity,
)
from laudnet_tpu.infer.export_pruned import export_pruned_resnet
from laudnet_tpu.infer.engine import ServingEngine

__all__ = [
    "ServingEngine",
    "build_layer_skip_resnet",
    "build_layer_skip_vit",
    "calibrate_token_capacity",
    "calibrate_patch_capacity",
    "calibrate_channel_masks",
    "calibration_fidelity",
    "export_pruned_resnet",
]
