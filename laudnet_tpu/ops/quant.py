"""Symmetric int8 quantization helpers (W8A8 serving).

The v5e MXU runs s8 x s8 -> s32 matmuls at 2x the bf16 peak (394 vs 197
TOPS), so quantizing the ViT's four weight matmuls (qkv/proj/fc1/fc2 —
~85% of DeiT FLOPs) halves the MXU time of the dominant ops. The scheme
is the standard production-serving one:

- weights: per-output-channel symmetric int8, quantized once at engine
  build time (`quantize_weight`);
- activations: per-row (per-token) dynamic symmetric int8, computed
  on-chip right before each matmul (`quantize_rows`) — no calibration
  data needed and no static activation-range risk;
- accumulation in int32, dequantized by the rank-1 outer product of the
  row and column scales (`int8_linear`).

This has no counterpart in the reference (pure fp32 torch); it is the
TPU-native serving extension. Everything here is jit/pallas-safe: pure
functions, static shapes, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array, eps: float = 1e-8):
    """Per-output-channel symmetric int8 for a (K, N) flax kernel.

    Returns ``(q, scale)`` with ``q`` int8 of w's shape and ``scale``
    f32 of shape (N,) such that ``q * scale ~= w``. Symmetric range
    [-127, 127] (the -128 code is unused, keeping the scheme symmetric).
    """
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(a, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_rows(x: jax.Array, eps: float = 1e-6):
    """Per-row dynamic symmetric int8 over the last axis.

    Returns ``(q, scale)`` with ``scale`` shaped like ``x`` with the last
    axis reduced to 1, such that ``q * scale ~= x``. Rows that are all
    zero (masked-out tokens) get scale eps/127 and quantize to zeros.
    """
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    # multiply-by-reciprocal, bit-identical to the in-kernel `_qrows`
    # (`ops/pallas/vit_block.py`) so the XLA reference path and the Pallas
    # kernel quantize to the same codes
    scale = jnp.maximum(a, eps) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127)
    return q.astype(jnp.int8), scale


def fake_quant_weight(w: jax.Array) -> jax.Array:
    """Quantize-dequantize with a straight-through gradient (QAT): the
    forward sees exactly the int8-representable weights the serving path
    will use; the backward passes gradients through unchanged."""
    q, s = quantize_weight(w)
    deq = (q.astype(jnp.float32) * s).astype(w.dtype)
    return w + jax.lax.stop_gradient(deq - w)


def fake_quant_rows(x: jax.Array) -> jax.Array:
    """Per-row activation fake-quant with straight-through gradient."""
    q, s = quantize_rows(x)
    deq = (q.astype(jnp.float32) * s).astype(x.dtype)
    return x + jax.lax.stop_gradient(deq - x)


def fake_quant_per_image(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-IMAGE activation fake-quant with straight-through gradient —
    the `QuantConv` serving scheme (one dynamic scale per image per conv
    input, so train-time noise matches serving and is independent of
    batch composition), used by CNN QAT
    (``LAUDResNet(conv_impl='int8_qat')``)."""
    xf = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim))
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=red, keepdims=True),
                    eps) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127)
    deq = (q * s).astype(x.dtype)
    return x + jax.lax.stop_gradient(deq - x)


class QuantDense:
    """Drop-in W8A8 replacement for ``nn.Dense`` (same param names/inits,
    so trained bf16/f32 checkpoints load unchanged). Weights are
    quantized per-output-channel inside the traced function — when params
    are jit ARGUMENTS (the usual apply pattern) that abs-max/round/clip
    re-executes every call; it is O(K*N) VPU work, small next to the
    matmul at serving batch sizes, and XLA folds it only if the caller
    closes over the params. Engine-build paths quantize once ahead of
    time instead (`infer/fused_vit.py`). The per-call runtime work is
    the per-row activation quant + s8 matmul + rank-1 dequant.

    Used by `models/laud_vit.py` ``linear_impl='int8'`` — the int8 path
    for geometries the fused block kernel cannot take (odd heads: T2T's
    7). ``fake=True`` builds the QAT variant instead: bf16/f32 matmul
    over fake-quantized weights and activations (straight-through
    gradients), so training sees the serving path's int8 numerics.
    Instantiated lazily to keep this module flax-free for kernels.
    """

    def __new__(cls, features: int, *, name=None, fake: bool = False,
                param_dtype=jnp.float32):
        import flax.linen as nn

        class _QuantDense(nn.Module):
            features: int
            fake: bool = False
            param_dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x):
                k = self.param(
                    "kernel", nn.initializers.lecun_normal(),
                    (x.shape[-1], self.features), self.param_dtype)
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), self.param_dtype)
                if self.fake:
                    return (fake_quant_rows(x)
                            @ fake_quant_weight(k).astype(x.dtype)
                            + b.astype(x.dtype))
                kq, ks = quantize_weight(k)
                return int8_linear(x, kq, ks, b).astype(x.dtype)

        return _QuantDense(features=features, name=name, fake=fake,
                           param_dtype=param_dtype)


class QuantConv:
    """Drop-in W8A8 replacement for ``flax.linen.Conv`` (same param
    name/shape/init, so trained checkpoints load unchanged): per-image
    dynamic activation scale, per-output-channel weight scales, s8
    conv -> s32 accumulate -> rank-1 dequant, returned in the input
    dtype. Covers the subset of nn.Conv the LAUD models use (NHWC,
    int-or-'SAME'/'VALID' padding, int strides/dilation, groups,
    use_bias=False). Used by ``LAUDResNet(conv_impl='int8')`` — int8
    dense-masked serving where the per-input masks stay fully dynamic
    and only the conv arithmetic quantizes. ``fake=True`` builds the QAT
    variant (``conv_impl='int8_qat'`` in training): a float conv over
    fake-quantized weights and per-image fake-quantized activations
    (straight-through gradients) — the train graph sees exactly the
    serving path's int8 numerics, including the gate flips its masker
    inputs cause, so fine-tuning re-stabilizes the gates under
    quantization noise."""

    def __new__(cls, features: int, kernel_size, *, strides=1, padding="SAME",
                kernel_dilation=1, feature_group_count: int = 1,
                use_bias: bool = False, kernel_init=None, name=None,
                fake: bool = False,
                param_dtype=jnp.float32, dtype=None):
        import flax.linen as nn

        assert not use_bias, "LAUD convs are bias-free (BN follows)"
        # ``dtype`` (the AMP compute dtype) is accepted for drop-in
        # signature parity with nn.Conv and ignored: int8 paths define
        # their own compute types (s8 operands, s32 accumulation, f32
        # dequant) and the fake-quant path must see the serving
        # numerics, not a bf16 re-rounding of them.
        del dtype

        class _QuantConv(nn.Module):
            features: int
            kernel_size: tuple
            strides: int = 1
            padding: object = "SAME"
            kernel_dilation: int = 1
            feature_group_count: int = 1
            fake: bool = False
            param_dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x):
                kh, kw = self.kernel_size
                cin = x.shape[-1] // self.feature_group_count
                k = self.param(
                    "kernel",
                    kernel_init or nn.initializers.lecun_normal(),
                    (kh, kw, cin, self.features), self.param_dtype)
                pad = self.padding
                if isinstance(pad, int):
                    pad = [(pad, pad), (pad, pad)]
                s = (self.strides if isinstance(self.strides, tuple)
                     else (self.strides, self.strides))
                d = (self.kernel_dilation
                     if isinstance(self.kernel_dilation, tuple)
                     else (self.kernel_dilation, self.kernel_dilation))
                if self.fake:
                    kf = fake_quant_weight(
                        k.reshape(-1, self.features)).reshape(k.shape)
                    return jax.lax.conv_general_dilated(
                        fake_quant_per_image(x), kf.astype(x.dtype), s, pad,
                        rhs_dilation=d,
                        feature_group_count=self.feature_group_count,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                kq, ks = quantize_weight(
                    k.reshape(-1, self.features))
                kq = kq.reshape(k.shape)
                xf = x.astype(jnp.float32)
                # per-IMAGE scale (not per-batch): one image's outlier
                # must not coarsen every other image's quantization, and
                # logits must not depend on batch composition (or on the
                # shard layout under shard_map)
                amax = jnp.maximum(
                    jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
                    1e-6)
                xs = amax * (1.0 / 127.0)
                xq = jnp.clip(jnp.round(xf / xs), -127, 127
                              ).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    xq, kq, s, pad, rhs_dilation=d,
                    feature_group_count=self.feature_group_count,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * xs * ks
                        ).astype(x.dtype)

        ks = (kernel_size if isinstance(kernel_size, tuple)
              else (kernel_size, kernel_size))
        return _QuantConv(features=features, kernel_size=ks,
                          strides=strides, padding=padding,
                          kernel_dilation=kernel_dilation,
                          feature_group_count=feature_group_count,
                          fake=fake, name=name, param_dtype=param_dtype)


def int8_linear(x: jax.Array, wq: jax.Array, wscale: jax.Array,
                bias=None) -> jax.Array:
    """W8A8 linear: dynamic per-row activation quant, s32 accumulation,
    rank-1 dequant. ``x``: (..., K) float; ``wq``: (K, N) int8;
    ``wscale``: (N,) f32. Returns f32 (..., N)."""
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * wscale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
