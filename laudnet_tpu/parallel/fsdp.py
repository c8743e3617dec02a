"""FSDP / ZeRO-3-style parameter sharding over the data axis.

The reference replicates all parameters per GPU (DDP); at LAUD scale that is
fine, but a production TPU deployment training larger variants wants the
memory of params + optimizer state divided across the data-parallel group.
On TPU this needs no wrapper class: place every large parameter with a
``NamedSharding`` that splits its largest dimension over the ``data`` axis
and jit the ordinary train step — GSPMD all-gathers each weight just before
use, re-shards the gradient (reduce-scatter instead of all-reduce), and
keeps the optimizer update fully sharded. Optimizer state inherits the
layout by sharding it with the same spec tree.

Composes with the Megatron layout (`parallel/tp.py`): apply TP rules first,
then FSDP-shard the still-replicated leaves on the orthogonal axis.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_specs(params, *, axis: str = "data", mesh: Mesh | None = None,
               min_size: int = 4096, base_specs=None):
    """PartitionSpec pytree sharding each large leaf's largest dim.

    Leaves smaller than ``min_size`` elements (biases, norms, gating heads)
    stay replicated — sharding them buys nothing and adds collectives. Dims
    already taken by ``base_specs`` (e.g. a TP layout) are respected: the
    FSDP axis goes on the largest dim the spec leaves free and the axis
    size divides. Pass ``mesh`` to get ``NamedSharding`` leaves.
    """
    axis_size = mesh.shape.get(axis, 1) if mesh is not None else None

    def leaf_spec(leaf, base):
        if isinstance(base, NamedSharding):  # tensor_parallel_specs(mesh=…)
            base = base.spec
        base_t = tuple(base) if base is not None else ()
        base_t = base_t + (None,) * (leaf.ndim - len(base_t))
        if leaf.size < min_size or leaf.ndim == 0:
            spec = base_t
        else:
            free = [
                i for i in range(leaf.ndim)
                if base_t[i] is None and (
                    axis_size is None or leaf.shape[i] % axis_size == 0
                )
            ]
            if not free:
                spec = base_t
            else:
                dim = max(free, key=lambda i: leaf.shape[i])
                spec = tuple(
                    axis if i == dim else base_t[i]
                    for i in range(leaf.ndim)
                )
        while spec and spec[-1] is None:
            spec = spec[:-1]
        p = P(*spec)
        return NamedSharding(mesh, p) if mesh is not None else p

    if base_specs is None:
        return jax.tree_util.tree_map(lambda a: leaf_spec(a, None), params)
    return jax.tree_util.tree_map(leaf_spec, params, base_specs)


def fsdp_shard_params(params, mesh: Mesh, *, axis: str = "data",
                      min_size: int = 4096, base_specs=None):
    """Place ``params`` on ``mesh`` with the FSDP layout."""
    shardings = fsdp_specs(params, axis=axis, mesh=mesh, min_size=min_size,
                           base_specs=base_specs)
    return jax.device_put(params, shardings)
