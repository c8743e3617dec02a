from laudnet_tpu.ops.gating import gumbel_softmax, binary_gate
from laudnet_tpu.ops.quant import (
    QuantDense,
    int8_linear,
    quantize_rows,
    quantize_weight,
)
from laudnet_tpu.ops.masking import (
    apply_channel_mask,
    apply_spatial_mask,
    expand_mask,
    upsample_mask_nearest,
    adaptive_avg_pool,
)

__all__ = [
    "gumbel_softmax",
    "binary_gate",
    "apply_channel_mask",
    "apply_spatial_mask",
    "expand_mask",
    "upsample_mask_nearest",
    "adaptive_avg_pool",
    "QuantDense",
    "int8_linear",
    "quantize_rows",
    "quantize_weight",
]
