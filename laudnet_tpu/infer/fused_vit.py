"""Fully fused ViT serving engine: patchify + per-layer fused block kernel
+ token policy / top-k selection between layers.

Composes `ops/pallas/vit_block.py::fused_vit_block` (LN1 -> qkv ->
attention -> proj -> residual -> LN2 -> MLP -> residual, one kernel per
layer) with exact re-implementations of the model's eval-time token gate
and fixed-capacity selection (`models/laud_vit.py::LAUDViTBlock` — gate
`logit0 >= logit1`, class token pinned, overflow drops lowest-confidence
kept tokens). Bit-matched to ``LAUDViT.apply`` on the dense and
token-selection paths (tests); head/layer gating paradigms keep the
attention-only fusion inside the flax model instead.

Like `infer/layerskip.py`, this is a serving-only engine over the raw
variables dict — the flax param tree is the single source of truth.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from laudnet_tpu.ops.pallas.vit_block import fused_vit_block


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def build_fused_vit(variables, *, depth: int, dim: int, num_heads: int,
                    patch_size: int = 16,
                    token_capacity: Optional[Sequence[float]] = None,
                    block_b: int = 1,
                    vmem_limit_bytes: Optional[int] = None,
                    interpret: bool = False):
    """Returns ``forward(x) -> logits`` running every transformer layer as
    one fused kernel. ``token_capacity`` enables the selection path (the
    variables must carry ``token_policy`` heads). The kernel runs
    batch-block 1 (measured v5e optimum on every geometry swept) and
    auto-raises Mosaic's scoped-VMEM limit for weights-dominated
    geometries (DeiT-B: ~14.2MB bf16/layer); ``vmem_limit_bytes``
    overrides that explicitly."""
    params = variables["params"]

    def forward(x):
        p = params
        b = x.shape[0]
        x = lax.conv_general_dilated(
            x, p["patch_embed"]["kernel"],
            window_strides=(patch_size, patch_size), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["patch_embed"]["bias"]
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, dim)
        cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b, 1, dim))
        x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(
            x.dtype)

        token_mask = jnp.ones((b, n + 1), jnp.float32)
        cur = n + 1
        for i in range(depth):
            blk = p[f"block_{i}"]
            if token_capacity is not None and "token_policy" in blk:
                tl = (x @ blk["token_policy"]["kernel"].astype(x.dtype)
                      + blk["token_policy"]["bias"].astype(x.dtype))
                tmask = (tl[..., 0] >= tl[..., 1]).astype(jnp.float32)
                tmask = tmask.at[:, 0].set(1.0)
                token_mask = token_mask * tmask
                score = (tl[..., 0] - tl[..., 1]).astype(jnp.float32)
                k = min(max(2, int(token_capacity[i] * (n + 1))), cur)
                if k < cur:
                    # rank kept above dropped; break ties by confidence;
                    # pin the class token (`laud_vit.py` selection)
                    conf = jax.nn.sigmoid(score)
                    rank = token_mask * 2.0 + conf
                    rank = rank.at[:, 0].add(4.0)
                    _, idx = lax.top_k(rank, k)
                    bidx = jnp.arange(b)[:, None]
                    x = x[bidx, idx]
                    token_mask = token_mask[bidx, idx]
                    cur = k
            bp = {"ln1": blk["norm1"], "qkv": blk["qkv"],
                  "proj": blk["proj"], "ln2": blk["norm2"],
                  "fc1": blk["fc1"], "fc2": blk["fc2"]}
            x = fused_vit_block(
                x, token_mask.reshape(b, 1, cur),
                token_mask.reshape(b, cur, 1), bp, num_heads=num_heads,
                block_b=block_b, vmem_limit_bytes=vmem_limit_bytes,
                interpret=interpret,
            )
        x = _ln(x, p["norm"])
        return (x[:, 0] @ p["head"]["kernel"].astype(x.dtype)
                + p["head"]["bias"].astype(x.dtype))

    return forward
