"""Exact static export of channel-gated LAUD-ResNets.

LAUDNet's channel masks in practice converge to nearly input-independent
patterns; deploying them as a *static* slim model turns the 0/1 multiplies
into real FLOP reductions (conv2 shrinks quadratically). The subtlety that
makes naive weight slicing WRONG: the reference gates conv outputs *before*
BatchNorm (`laud_resnet.py:115-124`), so a masked-off channel is not dead —
after eval-BN it carries the constant ``relu(bias - mean * scale/std)``
into the next conv. This exporter folds those constants exactly:

* conv1: slice output channels to the kept set; bn1 sliced.
* conv2: slice in/out channels; the masked *inputs*' constant contribution
  is precomputed as a spatial bias map (one conv over a constant map at
  export time — exact including SAME-padding borders) and fused after bn2.
* conv3: slice input channels; the masked inputs are spatially uniform, so
  their contribution folds into a plain per-channel bias (1x1 conv).

For a fixed mask pattern the exported model reproduces the dynamic model's
eval outputs bit-near (test-verified). For input-dependent masks this is an
approximation whose accuracy must be re-validated on data — the standard
dynamic-to-static deployment tradeoff.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _bn_affine(p, s, eps=1e-5):
    # jnp.asarray first: numpy would promote bf16 + python float to f32
    scale = jnp.asarray(p["scale"])
    var = jnp.asarray(s["var"])
    a = scale / jnp.sqrt(var + jnp.asarray(eps, var.dtype))
    return a, jnp.asarray(p["bias"]) - jnp.asarray(s["mean"]) * a


def _conv(x, k, stride=1, padding=0):
    return lax.conv_general_dilated(
        x, k, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _quant_kernel(k):
    """Per-output-channel symmetric int8 for an HWIO conv kernel (last
    axis = cout): `ops/quant.py::quantize_weight` over the flattened
    reduce axes. Returns (int8 kernel, f32 per-cout scale)."""
    from laudnet_tpu.ops.quant import quantize_weight

    q, s = quantize_weight(k.reshape(-1, k.shape[-1]))
    return q.reshape(k.shape), s


def _qconv(x, kq, stride=1, padding=0, absmax=None):
    """W8A8 conv: per-tensor activation scale (dynamic abs-max, or a
    calibrated static ``absmax`` that skips the runtime reduce pass and
    saturates outliers), s8 x s8 -> s32 on the MXU, dequant by the
    activation scale only (the per-cout weight scale is folded into the
    following BN affine). Returns x.dtype."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf)) if absmax is None else jnp.float32(absmax)
    xs = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, kq, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs).astype(x.dtype)


def export_pruned_resnet(variables, block_masks: Sequence[np.ndarray],
                         layers: Sequence[int] = (3, 4, 23, 3),
                         channel_dyn_granularity: Sequence[int] = (2, 2, 2, 2),
                         input_size: int = 224, int8: bool = False,
                         act_scales: Sequence[float] = None,
                         record_act_scales: bool = False):
    """Build ``forward(x) -> logits`` from a channel-mode LAUD-ResNet.

    ``block_masks``: one 0/1 group-mask per block (raster order), each of
    length ``width // granularity``; at least one group must be kept per
    block. Returns a jit-compatible closure over the pruned weights.

    ``int8`` additionally quantizes every conv W8A8 (`ops/quant.py`
    scheme: per-output-channel weight scales — folded into the BN affine
    so the runtime dequant is the activation scale only — and per-tensor
    dynamic activation scales; the s8 MXU runs at 2x the bf16 peak). A
    second approximation on top of the frozen policy: re-validate
    accuracy, `bench.py --r101-static --int8` prints the measured logit
    agreement.

    Dynamic activation scales cost one abs-max reduce pass per conv.
    ``act_scales`` bakes calibrated per-site abs-max values instead
    (static quantization — the reduce disappears, outliers saturate):
    build once with ``record_act_scales=True`` — the forward then
    returns ``(logits, per_site_absmax)`` — feed calibration batches
    through it, and pass the (quantile of the) recorded scales back as
    ``act_scales`` (`calibrate_export_act_scales` does exactly this).
    Sites are ordered as the forward visits them: stem, then per block
    [downsample?, conv1, conv2, conv3].
    """
    if record_act_scales:
        int8 = False  # scales are recorded on the float path
    params = variables["params"]
    stats = variables["batch_stats"]

    scopes: List[str] = []
    strides: List[int] = []
    for s_i, depth in enumerate(layers):
        for b_i in range(depth):
            scopes.append(f"layer{s_i + 1}_{b_i}")
            strides.append((2 if s_i > 0 else 1) if b_i == 0 else 1)
    assert len(block_masks) == len(scopes)

    grans = []
    for s_i, depth in enumerate(layers):
        grans += [channel_dyn_granularity[s_i]] * depth

    # resolution of each block's conv2 output (for the bias maps)
    sizes = []
    for s_i, depth in enumerate(layers):
        sizes += [input_size // (2 ** (s_i + 2))] * depth

    pruned = []
    for scope, mask, gran, out_hw, stride in zip(
        scopes, block_masks, grans, sizes, strides
    ):
        p, s = params[scope], stats[scope]
        w = p["conv1"]["kernel"].shape[-1]
        if len(mask) * gran != w:
            # an undersized mask would silently slice trailing channels
            # out of conv1..conv3 while also excluding them from the
            # const1/const2 bias folding — wrong logits, no error
            raise ValueError(
                f"{scope}: mask has {len(mask)} groups x granularity "
                f"{gran} = {len(mask) * gran} channels, conv width is {w} "
                "— calibrate with the model's channel_dyn_granularity")
        ch_mask = np.repeat(np.asarray(mask).astype(bool), gran)
        kept = np.where(ch_mask)[0]
        dropped = np.where(~ch_mask)[0]
        assert kept.size > 0, f"{scope}: empty mask"

        a1, b1 = _bn_affine(p["bn1"], s["bn1"])
        a2, b2 = _bn_affine(p["bn2"], s["bn2"])
        a3, b3 = _bn_affine(p["bn3"], s["bn3"])

        # constant value of masked channels after bn1+relu (conv1 out = 0)
        const1 = jnp.maximum(b1, 0.0)  # (W,)

        w2 = p["conv2"]["kernel"]  # (3, 3, W, W)
        # exact bias map: conv2 over a constant map carrying const1 on the
        # dropped inputs only (captures SAME-padding border effects)
        in_hw = out_hw * stride
        const_map = jnp.zeros(
            (1, in_hw, in_hw, w), w2.dtype
        ).at[..., dropped].set(const1[dropped].astype(w2.dtype))
        bias_map2 = _conv(const_map, w2[:, :, :, kept], stride=stride,
                          padding=1)[0]  # (out_hw, out_hw, k)

        # masked conv2 outputs after bn2+relu are spatially uniform == 0
        # (they were gated to zero before bn2), value relu(b2):
        const2 = jnp.maximum(b2, 0.0)  # (W,)
        w3 = p["conv3"]["kernel"][0, 0]  # (W, Co)
        bias3 = const2[dropped] @ w3[dropped]  # (Co,)

        pruned.append({
            "w1": p["conv1"]["kernel"][:, :, :, kept],
            "a1": a1[kept], "b1": b1[kept],
            "w2": w2[:, :, kept][:, :, :, kept],
            "a2": a2[kept], "b2": b2[kept],
            "bias_map2": bias_map2 * a2[kept],  # pre-bn2-scaled
            "w3": w3[kept],
            "a3": a3, "b3": b3 + bias3 * a3,
            "ds": (
                {
                    "w": p["downsample_conv"]["kernel"],
                    "ab": _bn_affine(p["downsample_bn"], s["downsample_bn"]),
                } if "downsample_conv" in p else None
            ),
            "stride": stride,
        })

    a_stem, b_stem = _bn_affine(params["bn1"], stats["bn1"])
    stem_k = params["conv1"]["kernel"]
    fc = params["fc"]
    fc_k, fc_b = fc["kernel"], fc["bias"]

    if int8:
        # quantize every kernel; fold the per-cout weight scale into the
        # multiplier that already follows each conv (BN affine / fc scale)
        for blk in pruned:
            blk["w1"], s1 = _quant_kernel(blk["w1"])
            blk["a1"] = blk["a1"] * s1
            blk["w2"], s2 = _quant_kernel(blk["w2"])
            blk["a2"] = blk["a2"] * s2
            # bias_map2 is added AFTER the a2 multiply, so it needs no
            # rescale; w3 is stored (Cin, Co) — quantize as 1x1 HWIO
            w3q, s3 = _quant_kernel(blk["w3"][None, None])
            blk["w3"] = w3q[0, 0]
            blk["a3"] = blk["a3"] * s3
            if blk["ds"] is not None:
                blk["ds"]["w"], sd = _quant_kernel(blk["ds"]["w"])
                da, db = blk["ds"]["ab"]
                blk["ds"]["ab"] = (da * sd, db)
        stem_k, ss = _quant_kernel(stem_k)
        a_stem = a_stem * ss
        from laudnet_tpu.ops.quant import quantize_weight

        fc_q, fc_s = quantize_weight(fc_k)

    def forward(x):
        obs = []  # record mode: per-site activation abs-max, visit order
        site = [0]

        def conv(h, k, stride=1, padding=0):
            if record_act_scales:
                obs.append(jnp.max(jnp.abs(h.astype(jnp.float32))))
                return _conv(h, k, stride, padding)
            if int8:
                amax = (None if act_scales is None
                        else act_scales[site[0]])
                site[0] += 1
                return _qconv(h, k, stride, padding, absmax=amax)
            return _conv(h, k, stride, padding)

        h = conv(x, stem_k, stride=2, padding=3) * a_stem + b_stem
        h = jnp.maximum(h, 0.0)
        h = lax.reduce_window(h, jnp.asarray(-jnp.inf, h.dtype), lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
        for blk in pruned:
            identity = h
            if blk["ds"] is not None:
                da, db = blk["ds"]["ab"]
                identity = conv(h, blk["ds"]["w"],
                                stride=blk["stride"]) * da + db
            y = jnp.maximum(conv(h, blk["w1"]) * blk["a1"] + blk["b1"], 0.0)
            y = conv(y, blk["w2"], stride=blk["stride"], padding=1)
            y = jnp.maximum(y * blk["a2"] + blk["b2"] + blk["bias_map2"], 0.0)
            y = conv(y, blk["w3"][None, None]) * blk["a3"] + blk["b3"]
            h = jnp.maximum(y + identity, 0.0)
        pooled = h.mean(axis=(1, 2))
        if int8:
            from laudnet_tpu.ops.quant import int8_linear

            out = int8_linear(pooled, fc_q, fc_s, fc_b).astype(pooled.dtype)
        else:
            out = pooled @ fc_k + fc_b
        if record_act_scales:
            return out, jnp.stack(obs)
        return out

    return forward


def calibrate_export_act_scales(variables, block_masks, batches, *,
                                quantile: float = 1.0, margin: float = 0.0,
                                **export_kwargs):
    """Record per-conv-site activation abs-max over calibration batches
    for the static-scale int8 export. Returns a list ordered like the
    export's conv sites; pass it as ``act_scales`` (typically with a
    small ``margin``; values above the baked scale saturate at eval)."""

    fwd = jax.jit(export_pruned_resnet(
        variables, block_masks, record_act_scales=True, **export_kwargs))
    per_batch = [np.asarray(fwd(jnp.asarray(b))[1]) for b in batches]
    arr = np.stack(per_batch)  # (n_batches, n_sites)
    q = np.quantile(arr, quantile, axis=0) * (1.0 + margin)
    return [float(v) for v in q]
