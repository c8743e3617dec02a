from laudnet_tpu.infer.layerskip import build_layer_skip_resnet

__all__ = ["build_layer_skip_resnet"]
