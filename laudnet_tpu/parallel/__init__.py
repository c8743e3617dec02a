from laudnet_tpu.parallel.mesh import (
    data_parallel_shardings,
    initialize_distributed,
    make_mesh,
    put_global_batch,
    replicate,
    shard_batch,
)
from laudnet_tpu.parallel.fsdp import fsdp_shard_params, fsdp_specs
from laudnet_tpu.parallel.pp import pipeline_apply, stack_layer_params
from laudnet_tpu.parallel.pp_train import (
    make_pp_mesh,
    make_pp_train_step,
    pp_vit_forward,
)
from laudnet_tpu.parallel.tp import (
    RESNET_TP_RULES,
    VIT_TP_RULES,
    sequence_parallel_constraint,
    shard_params,
    tensor_parallel_specs,
)

__all__ = [
    "data_parallel_shardings",
    "initialize_distributed",
    "make_mesh",
    "put_global_batch",
    "replicate",
    "shard_batch",
    "pipeline_apply",
    "stack_layer_params",
    "make_pp_mesh",
    "make_pp_train_step",
    "pp_vit_forward",
    "tensor_parallel_specs",
    "shard_params",
    "sequence_parallel_constraint",
    "VIT_TP_RULES",
    "RESNET_TP_RULES",
    "fsdp_specs",
    "fsdp_shard_params",
]
