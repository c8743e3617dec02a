"""Batch-1 layer-skipping inference engine (real compute skipping).

The training graph multiplies skipped blocks by zero; this engine *actually
skips them* with ``lax.cond`` — the TPU executes only the taken branch, so a
LAUD-ResNet with layer target 0.5 runs ~half the block FLOPs. Per-sample
control flow only vectorizes at batch 1 (SURVEY.md §7 hard-parts #6), which
is the paper's edge-deployment scenario (TX2/Nano run batch 1,
`DyNetSimulator/eval_example.py:150-156`); for batched serving use the
dense-masked graph or the Pallas patch kernel.

Operates directly on converted :class:`~laudnet_tpu.models.LAUDResNet`
variables (layer mode), bit-matching ``model.apply`` eval logits.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


# one shared NHWC/HWIO conv wrapper for the infer/ engines
from laudnet_tpu.infer.export_pruned import _conv


def _bn(x, v, eps=1e-5):
    scale, bias = v["scale"], v["bias"]
    mean, var = v["mean"], v["var"]
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def build_layer_skip_resnet(variables, layers: Sequence[int] = (3, 4, 23, 3)):
    """Build ``forward(x) -> (logits, n_blocks_run)`` for a layer-mode
    LAUD-ResNet. ``x``: (1, H, W, 3); jit-compatible."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def block(x, scope, stride, has_ds):
        p = params[scope]
        s = stats[scope]

        # layer gate: GAP -> 1x1 conv -> keep iff logit0 >= logit1
        # (SpatialMasker with mask_size=1, `models/utils.py:35-65`)
        mk = p["masker_spatial"]["conv"]
        pooled = x.mean(axis=(1, 2), keepdims=True)
        logits = _conv(pooled, mk["kernel"]) + mk["bias"]
        keep = logits[0, 0, 0, 0] >= logits[0, 0, 0, 1]

        identity = x
        if has_ds:
            identity = _bn(
                _conv(x, p["downsample_conv"]["kernel"], stride=stride),
                {**p["downsample_bn"], **s["downsample_bn"]},
            )

        def run(x):
            h = jnp.maximum(_bn(_conv(x, p["conv1"]["kernel"]),
                                {**p["bn1"], **s["bn1"]}), 0.0)
            h = jnp.maximum(_bn(_conv(h, p["conv2"]["kernel"], stride=stride,
                                      padding=1),
                                {**p["bn2"], **s["bn2"]}), 0.0)
            h = _bn(_conv(h, p["conv3"]["kernel"]), {**p["bn3"], **s["bn3"]})
            return jnp.maximum(h + identity, 0.0)

        def skip(x):
            return jnp.maximum(identity, 0.0)

        out = lax.cond(keep, run, skip, x)
        return out, keep.astype(jnp.int32)

    def forward(x):
        if x.shape[0] != 1:
            # the gate reads image 0's masker logits; at B>1 every other
            # image would silently inherit its skip decisions
            raise ValueError(
                f"layer-skip engine is batch-1 (got batch {x.shape[0]}); "
                "shard_map per-device batches of 1, or use the masked "
                "graph")
        h = _conv(x, params["conv1"]["kernel"], stride=2, padding=3)
        h = jnp.maximum(_bn(h, {**params["bn1"], **stats["bn1"]}), 0.0)
        h = lax.reduce_window(
            h, jnp.asarray(-jnp.inf, h.dtype), lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        n_run = jnp.int32(0)
        inplanes = 64
        for s_i, depth in enumerate(layers):
            planes = 64 * (2**s_i)
            for b_i in range(depth):
                stride = (2 if s_i > 0 else 1) if b_i == 0 else 1
                has_ds = b_i == 0 and (stride != 1 or inplanes != planes * 4)
                h, ran = block(h, f"layer{s_i + 1}_{b_i}", stride, has_ds)
                n_run += ran
                inplanes = planes * 4
        pooled = h.mean(axis=(1, 2))
        fc = params["fc"]
        logits = pooled @ fc["kernel"] + fc["bias"]
        return logits, n_run

    return forward


def build_layer_skip_vit(variables, *, depth: int, dim: int,
                         num_heads: int, patch_size: int = 16,
                         interpret: bool = False):
    """Batch-1 layer-skipping LAUD-ViT engine (real compute skipping).

    The model's layer paradigm gates the attention and MLP branches
    independently per image (`models/laud_vit.py`: ``layer_policy`` on
    the class token, eval ``on >= off``; branch outputs multiplied by
    the gate). At batch 1 this engine turns each gate into a
    ``lax.cond`` so a skipped branch executes NOTHING — the ViT analog
    of :func:`build_layer_skip_resnet`. The attention branch runs the
    fused qkv-direct kernel (`ops/pallas/vit_attention.py`).

    Measured (v5e, DeiT-S, 6/12 blocks force-closed): 0.74x the
    dense-masked graph with the same gates — like the CNN engine
    (0.48x), per-branch ``lax.cond`` overhead on this chip exceeds what
    skipping saves at this model scale, so the masked graph stays the
    recommended batch-1 layer-mode path. The engine is kept as the
    exact real-skipping reference (and for future chips/geometries
    where the trade flips).

    Returns ``forward(x) -> (logits, n_branches_run)`` for ``x`` of
    shape (1, H, W, 3); bit-matches ``model.apply`` eval logits.
    """
    from laudnet_tpu.infer.fused_vit import _ln as ln, _patchify
    from laudnet_tpu.ops.pallas.vit_attention import fused_vit_attention

    params = variables["params"]
    dh = dim // num_heads
    sm_scale = dh**-0.5

    def forward(x):
        if x.shape[0] != 1:
            raise ValueError(
                f"layer-skip engine is batch-1 (got batch {x.shape[0]}); "
                "shard_map per-device batches of 1, or use the masked "
                "graph")
        p = params
        b = x.shape[0]
        x, n = _patchify(p, x, dim, patch_size)
        l = n + 1
        ones = jnp.ones((b, l), jnp.float32)

        n_run = jnp.int32(0)
        for i in range(depth):
            blk = p[f"block_{i}"]
            lp = blk["layer_policy"]
            lg = (x[:, 0] @ lp["kernel"].astype(x.dtype)
                  + lp["bias"].astype(x.dtype)).reshape(2, 2)
            attn_on = lg[0, 0] >= lg[1, 0]
            mlp_on = lg[0, 1] >= lg[1, 1]

            def attn_branch(x, blk=blk):
                h1 = ln(x, blk["norm1"])
                qkv = (h1 @ blk["qkv"]["kernel"].astype(x.dtype)
                       + blk["qkv"]["bias"].astype(x.dtype))
                out = fused_vit_attention(qkv, ones, None, num_heads,
                                          sm_scale, 8, interpret)
                out = (out @ blk["proj"]["kernel"].astype(x.dtype)
                       + blk["proj"]["bias"].astype(x.dtype))
                return x + out

            def mlp_branch(x, blk=blk):
                y = ln(x, blk["norm2"])
                u = jax.nn.gelu(
                    y @ blk["fc1"]["kernel"].astype(x.dtype)
                    + blk["fc1"]["bias"].astype(x.dtype),
                    approximate=False)
                return x + (u @ blk["fc2"]["kernel"].astype(x.dtype)
                            + blk["fc2"]["bias"].astype(x.dtype))

            x = lax.cond(attn_on, attn_branch, lambda x: x, x)
            x = lax.cond(mlp_on, mlp_branch, lambda x: x, x)
            n_run += attn_on.astype(jnp.int32) + mlp_on.astype(jnp.int32)

        x = ln(x, p["norm"])
        logits = (x[:, 0] @ p["head"]["kernel"].astype(x.dtype)
                  + p["head"]["bias"].astype(x.dtype))
        return logits, n_run

    return forward
