from laudnet_tpu.parallel.mesh import (
    data_parallel_shardings,
    initialize_distributed,
    make_mesh,
    put_global_batch,
    replicate,
    shard_batch,
)

__all__ = [
    "data_parallel_shardings",
    "initialize_distributed",
    "make_mesh",
    "put_global_batch",
    "replicate",
    "shard_batch",
]
