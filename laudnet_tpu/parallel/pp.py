"""Pipeline parallelism: a GPipe schedule as SPMD ``shard_map`` + ``ppermute``.

No reference analog (the reference is single-node DDP only); this is the
TPU-native way to run a model whose layers exceed one chip's HBM: place
consecutive layer groups (stages) on consecutive devices of a ``stage`` mesh
axis and stream microbatches through, rotating activations stage-to-stage
over ICI with ``lax.ppermute``.

The schedule is the standard single-program formulation: every device runs
the same scanned loop for ``M + S - 1`` ticks (M microbatches, S stages).
At tick ``t`` stage 0 injects microbatch ``min(t, M-1)``, every stage applies
its local layers to its current buffer, stage ``S-1`` collects finished
microbatch ``t - (S - 1)``, and a cyclic ``ppermute`` shifts every buffer to
the next stage. Ticks outside a stage's valid window compute garbage that is
never collected — the usual (S-1)/M bubble overhead, amortized by more
microbatches.

Activation shapes must be identical across stages (true for transformer
trunks); parameters arrive stacked with a leading stage dim and are unstacked
by ``shard_map`` so each device holds only its own stage's weights — the
memory win that motivates PP.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
try:
    from jax import shard_map as _shard_map

    _CHECK_KW = "check_vma"
except ImportError:  # older jax: experimental API, check_rep kwarg
    from jax.experimental.shard_map import shard_map as _shard_map

    _CHECK_KW = "check_rep"
from jax.sharding import Mesh, PartitionSpec as P


def shard_map(f, **kw):
    """`jax.shard_map` with replication checking off, spelled portably
    (the modern API calls the kwarg check_vma, the experimental one
    check_rep)."""
    kw[_CHECK_KW] = False
    return _shard_map(f, **kw)


def stack_layer_params(params: dict, prefix: str = "block_"):
    """Stack per-layer flax param subtrees ``{prefix}{i}`` along a new
    leading layer dim (ascending i). Returns (stacked_tree, n_layers)."""
    names = sorted(
        (k for k in params if k.startswith(prefix)),
        key=lambda k: int(k[len(prefix):]),
    )
    if not names:
        raise ValueError(f"no '{prefix}*' subtrees in params")
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[params[n] for n in names]
    )
    return stacked, len(names)


def pipeline_apply(fn: Callable[[Any, Any], Any], stage_params: Any, x: Any,
                   *, mesh: Mesh, axis: str = "stage",
                   microbatches: int, batch_axis: str | None = None) -> Any:
    """Run ``x`` through ``S = mesh.shape[axis]`` pipeline stages.

    ``stage_params``: pytree with leading dim S on every leaf (stage i's
    weights at index i) — build with ``stack_layer_params`` + a reshape of
    the layer dim to ``(S, layers_per_stage)``.
    ``fn(params_stage, x_mb) -> y_mb``: applies one stage's layers to one
    microbatch; input and output must be pytrees of identical structure
    and shape (the rotating activation buffer).
    ``x``: batch pytree; every leaf's leading dim must divide evenly into
    ``microbatches``.
    ``batch_axis``: optional second mesh axis carrying data parallelism —
    the microbatch (second) dim of every buffer leaf is sharded over it,
    composing pp x dp in one SPMD program (each data shard streams its
    slice of every microbatch through the same stage rotation).
    """
    n_stages = mesh.shape[axis]
    batch = jax.tree_util.tree_leaves(x)[0].shape[0]
    if batch % microbatches:
        raise ValueError(f"batch {batch} not divisible into "
                         f"{microbatches} microbatches")
    mb = batch // microbatches
    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape((microbatches, mb) + a.shape[1:]), x
    )
    ticks = microbatches + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def spmd(params_stacked, xs):
        params_local = jax.tree_util.tree_map(
            lambda a: a[0], params_stacked  # drop the sharded stage dim
        )
        idx = lax.axis_index(axis)
        zeros_mb = jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a[0]), xs
        )
        out0 = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), xs)

        def tick(carry, t):
            state, out = carry
            # stage 0 injects the next microbatch
            x_t = jax.tree_util.tree_map(
                lambda a: a[jnp.minimum(t, microbatches - 1)], xs
            )
            state = jax.tree_util.tree_map(
                lambda inj, st: jnp.where(idx == 0, inj, st), x_t, state
            )
            y = fn(params_local, state)
            # last stage collects finished microbatch t - (S - 1)
            k = t - (n_stages - 1)
            kc = jnp.clip(k, 0, microbatches - 1)
            take = (k >= 0) & (idx == n_stages - 1)
            out = jax.tree_util.tree_map(
                lambda ob, ya: ob.at[kc].set(jnp.where(take, ya, ob[kc])),
                out, y,
            )
            state = jax.tree_util.tree_map(
                lambda ya: lax.ppermute(ya, axis, perm), y
            )
            return (state, out), None

        (state, out), _ = lax.scan(
            tick, (zeros_mb, out0), jnp.arange(ticks)
        )
        # replicate the last stage's collected outputs to every device
        out = jax.tree_util.tree_map(
            lambda ob: lax.all_gather(ob, axis)[n_stages - 1], out
        )
        return out

    stage_spec = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stage_params
    )
    data_spec = P(None, batch_axis) if batch_axis else P()
    out_mb = shard_map(
        spmd, mesh=mesh,
        in_specs=(stage_spec, data_spec), out_specs=data_spec,
    )(stage_params, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((batch,) + a.shape[2:]), out_mb
    )
