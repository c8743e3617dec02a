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


def _conv(x, kernel, stride=1, padding=0):
    pad = [(padding, padding), (padding, padding)]
    return lax.conv_general_dilated(
        x, kernel, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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
