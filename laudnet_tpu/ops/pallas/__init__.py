from laudnet_tpu.ops.pallas.masked_block import (
    fold_bn,
    masked_bottleneck_tail,
)

__all__ = ["fold_bn", "masked_bottleneck_tail"]
