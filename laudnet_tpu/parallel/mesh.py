"""Device mesh + sharding helpers (the TPU-native replacement for DDP/NCCL).

The reference's only parallelism is single-node data parallelism via
``torch.distributed`` + NCCL (`train/main.py:181-190,261-262,326-327`). On TPU
that becomes: one ``jax.sharding.Mesh`` over all chips, batch sharded on the
'data' axis, parameters replicated, and XLA inserts the gradient all-reduce
over ICI automatically when the jitted train step consumes sharded batches
with replicated params. Metrics come back replicated — no explicit collective
code is needed for pure DP; ``lax.psum`` appears only inside ``shard_map``
custom paths.

For multi-host slices call ``jax.distributed.initialize()`` first; everything
here uses ``jax.devices()`` and works unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (the `dist.init_process_group` analog,
    reference `train/main.py:261-262`). No-op for single-process runs; on a
    multi-host slice call this once before any device use, then every host
    runs the same program and the data loader shards by
    ``(jax.process_index(), jax.process_count())``."""
    if coordinator_address and not num_processes:
        # a coordinator without a process count must not silently degrade
        # to N independent single-process trainings (each would see
        # process_count()==1, train on the full dataset, and clobber the
        # shared checkpoints/logs)
        raise ValueError(
            "initialize_distributed: coordinator_address given but "
            "num_processes is unset — pass --dist_num_processes (and a "
            "per-host process_id)")
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(n_devices: int | None = None, axis_name: str = "data",
              model_parallel: int = 1) -> Mesh:
    """Data mesh over the first ``n_devices`` devices (default: all).

    ``model_parallel > 1`` returns a 2-D ``(data, model)`` mesh instead —
    the inner (fastest-varying, ICI-adjacent) axis carries the
    tensor-parallel group (`parallel/tp.py`)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_parallel > 1:
        if len(devices) % model_parallel:
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"model_parallel={model_parallel}")
        grid = np.asarray(devices).reshape(-1, model_parallel)
        return Mesh(grid, (axis_name, "model"))
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_shardings(mesh: Mesh, axis_name: str = "data"):
    """(batch_sharding, replicated_sharding) for a 1-D data mesh."""
    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return batch, repl


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch with its leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def put_global_batch(x, sharding):
    """Place a host-local batch as a (possibly multi-host) global array.

    Single-process: plain ``device_put``. Multi-process: each host
    contributes its local shard and the result is a global array with the
    full logical batch (``local_batch * process_count`` rows) — the data
    side of the DDP analog (`DistributedSampler` + per-GPU batches,
    reference `train/main.py:324-325,419-421`).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
