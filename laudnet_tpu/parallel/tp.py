"""Tensor parallelism: Megatron-style sharding rules, GSPMD-executed.

The reference's only parallelism is data-parallel DDP (`train/main.py:261-262`);
scaling a LAUD model past one chip's HBM has no reference analog. On TPU the
idiomatic mechanism is *annotation-based* tensor parallelism: place each weight
matrix with a ``NamedSharding`` that splits it over the mesh's ``model`` axis
and let GSPMD propagate the activation shardings and insert the all-reduces
over ICI — no collective appears in user code.

The rules implement the Megatron layout for a transformer block:

* column-parallel ``qkv`` / ``fc1`` (split the OUTPUT feature dim, biases
  split to match) — each shard computes its own slice of heads / hidden
  units with zero communication;
* row-parallel ``proj`` / ``fc2`` (split the INPUT feature dim, biases
  replicated) — each shard holds the partial sum for its slice and GSPMD
  inserts ONE all-reduce per branch, the minimum for this decomposition;
* the classifier ``head`` column-parallel (vocab/class sharded logits);
* everything small (LayerNorms, policy/gating heads, maskers, cls/pos
  embeddings) replicated.

Sequence parallelism falls out of the same mechanism: batch stays on the
``data`` axis, and GSPMD re-shards the token dim around the LayerNorms when
that is cheaper — there is nothing to hand-schedule.

For LAUD-ResNets the analogous layout splits each bottleneck's 1x1 expand
conv (``conv3``) row-wise and the 3x3 (``conv2``) column-wise on the output
channel dim; maskers stay replicated so every shard agrees on the gates.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (param-path regex, PartitionSpec template) — first match wins; the
# template names the dim to split with 'model' and pads/truncates to the
# leaf's rank from the LEFT (kernels differ in rank: Dense (in, out),
# conv HWIO (h, w, in, out)).
VIT_TP_RULES: Tuple[Tuple[str, Tuple[Any, ...]], ...] = (
    (r".*(qkv|fc1)/kernel$", (None, "model")),   # column-parallel
    (r".*(qkv|fc1)/bias$", ("model",)),
    (r".*(proj|fc2)/kernel$", ("model", None)),  # row-parallel
    (r".*head/kernel$", (None, "model")),        # class-sharded logits
    (r".*head/bias$", ("model",)),
)

RESNET_TP_RULES: Tuple[Tuple[str, Tuple[Any, ...]], ...] = (
    (r".*conv2/kernel$", (None, "model")),       # 3x3: split out-channels
    (r".*conv3/kernel$", ("model", None)),       # 1x1 expand: row-parallel
    (r".*fc/kernel$", (None, "model")),
    (r".*fc/bias$", ("model",)),
)


def _spec_for(name: str, leaf, rules, axis: str, axis_size: int):
    for pattern, template in rules:
        if re.match(pattern, name):
            if leaf.ndim < len(template):
                return P()
            # left-pad with None so the template's trailing dims line up
            # with the leaf's trailing dims (conv kernels are rank 4).
            spec = (None,) * (leaf.ndim - len(template)) + tuple(
                axis if t == "model" else t for t in template
            )
            # only shard dims the axis divides evenly — otherwise
            # replicate. This is elementwise divisibility, NOT head
            # alignment: a 7-head T2T qkv (448, 1344) on a 2-way axis
            # passes and splits mid-head — GSPMD stays correct, but the
            # zero-communication column-parallel property is lost there
            # (extra resharding collectives appear around attention).
            dims_ok = all(
                s is None or leaf.shape[i] % axis_size == 0
                for i, s in enumerate(spec)
            )
            return P(*spec) if dims_ok else P()
    return P()


def tensor_parallel_specs(params, rules=VIT_TP_RULES, *,
                          axis: str = "model", mesh: Mesh | None = None):
    """PartitionSpec pytree for ``params`` under Megatron-style ``rules``.

    Pass ``mesh`` to get ``NamedSharding`` leaves (ready for
    ``jax.device_put`` / ``jit(..., in_shardings=...)``); omit it to get raw
    ``PartitionSpec`` leaves (for ``shard_map`` or logical-axis plumbing).
    """
    axis_size = 1
    if mesh is not None:
        axis_size = mesh.shape.get(axis, 1)

    def leaf_spec(path, leaf):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        spec = _spec_for(name, leaf, rules, axis, axis_size)
        return NamedSharding(mesh, spec) if mesh is not None else spec

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(params, mesh: Mesh, rules=VIT_TP_RULES,
                 *, axis: str = "model"):
    """Place ``params`` on ``mesh`` with the tensor-parallel layout."""
    shardings = tensor_parallel_specs(params, rules, axis=axis, mesh=mesh)
    return jax.device_put(params, shardings)


def tp_fused_vit_attention(qkv, key_mask, head_mask, num_heads: int,
                           sm_scale: float, mesh: Mesh, *,
                           model_axis: str = "model",
                           batch_axis: str = "data",
                           block_b: int = 8, interpret: bool = False):
    """Partition-aware fused Pallas attention: each model-axis shard runs
    :func:`~laudnet_tpu.ops.pallas.vit_attention.fused_vit_attention` on its
    LOCAL heads via ``shard_map``.

    Heads are the natural shard unit of the Megatron layout (column-parallel
    qkv ⇒ every shard owns complete heads), but the packed ``(B, L, 3*D)``
    qkv activation interleaves the three sections, so a contiguous lane
    split would hand shard 0 "all of q + half of k". Reshaping to
    ``(B, L, 3, H, dh)`` exposes the head dim as a real array axis; sharding
    THAT over the model axis gives each device ``(B_loc, L, 3, H/tp, dh)``
    — exactly its heads' q/k/v — which repacks (a free, layout-preserving
    reshape) into the kernel's local ``(B_loc, L, 3*D/tp)`` input. The
    merged output lands feature-sharded ``(B, L, D/tp per shard)``, which is
    precisely what the row-parallel ``proj`` consumes: GSPMD keeps the
    partial-sum + single all-reduce structure of the unfused TP graph.

    The kernel's ``custom_vjp`` differentiates through ``shard_map``, so the
    fused Pallas backward also runs per-shard on local heads.

    Requires ``num_heads % tp == 0`` (callers fall back to the reference
    graph otherwise — e.g. T2T's 7 heads on tp=2). An ODD local head count
    (DeiT-S: 6 heads / tp=2 = 3) takes the kernel's zero-padded fake-head
    path per shard.
    """
    from laudnet_tpu.parallel.pp import shard_map

    tp = mesh.shape.get(model_axis, 1)
    if num_heads % tp:
        raise ValueError(
            f"tp_fused_vit_attention: num_heads={num_heads} not divisible "
            f"by the {model_axis!r} axis ({tp}) — fall back to the "
            "reference attention graph for this geometry")
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    h_loc = num_heads // tp
    bspec = batch_axis if batch_axis in mesh.shape else None
    qkv5 = qkv.reshape(b, l, 3, num_heads, dh)
    gated = head_mask is not None

    def local_attn(qkv5_loc, km, *rest):
        from laudnet_tpu.ops.pallas.vit_attention import fused_vit_attention

        hm = rest[0] if gated else None
        bb, ll = qkv5_loc.shape[0], qkv5_loc.shape[1]
        packed = qkv5_loc.reshape(bb, ll, 3 * h_loc * dh)
        return fused_vit_attention(packed, km, hm, h_loc, sm_scale,
                                   block_b, interpret)

    in_specs = [P(bspec, None, None, model_axis, None), P(bspec, None)]
    args = [qkv5, key_mask]
    if gated:
        in_specs.append(P(bspec, model_axis))
        args.append(head_mask)
    return shard_map(
        local_attn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(bspec, None, model_axis),
    )(*args)


def sequence_parallel_constraint(x, mesh: Mesh, *, axis: str = "model",
                                 batch_axis: str = "data",
                                 token_axis: int = 1):
    """Megatron sequence parallelism (SP), the GSPMD way.

    Between the TP matmul pairs (column-parallel ``qkv``/``fc1`` x
    row-parallel ``proj``/``fc2``) the activations only pass through
    elementwise + LayerNorm work; under plain TP they sit fully
    replicated over the ``model`` axis there — tp_size copies of every
    activation, and every shard repeats the same VPU work. Constraining
    the TOKEN dim onto the ``model`` axis in those regions makes GSPMD
    emit the Megatron-SP collective pair instead — reduce-scatter out of
    the row-parallel matmul, all-gather back into the next
    column-parallel one — for identical math with 1/tp_size activation
    memory and LayerNorm work per device.

    Call inside ``jit`` on the block boundary / pre-LN activations
    ``(batch, tokens, features)``. Dims the axis does not divide still
    work (GSPMD handles ragged shards). No-op when ``mesh`` lacks the
    axis or it has size 1.
    """
    if axis not in mesh.shape or mesh.shape[axis] == 1:
        return x
    spec = [None] * x.ndim
    if batch_axis in mesh.shape:
        spec[0] = batch_axis
    spec[token_axis] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )
