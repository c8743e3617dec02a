"""Mask algebra: application, receptive-field expansion, resizing, pooling.

TPU-native NHWC re-formulation of the reference's mask utilities
(`imagenet_classification/models/utils.py:18-89`). Group-to-channel broadcast
uses *contiguous* channel blocks (channel ``i`` belongs to group
``i // (C // G)``), which is exactly what the reference's
repeat/view/transpose/reshape dance computes.

Everything here is static-shape; masks stay dense 0/1 arrays so the training
graph is a plain differentiable program under ``jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def apply_channel_mask(x, mask):
    """Multiply NHWC activations by a per-sample channel-group mask.

    ``x``: (B, H, W, C); ``mask``: (B, G) with G dividing C (or G == 1 for a
    whole-layer gate). Group g covers the contiguous channel block
    [g*C/G, (g+1)*C/G) — reference `models/utils.py:18-25`.
    """
    c = x.shape[-1]
    g = mask.shape[-1]
    if g > 1 and g != c:
        mask = jnp.repeat(mask, c // g, axis=-1)
    return x * mask[:, None, None, :].astype(x.dtype)


def apply_spatial_mask(x, mask):
    """Multiply NHWC activations by a spatial (possibly group-wise) mask.

    ``x``: (B, H, W, C); ``mask``: (B, H, W, G). Same contiguous-block group
    broadcast as :func:`apply_channel_mask` — reference `models/utils.py:27-33`.
    """
    c = x.shape[-1]
    g = mask.shape[-1]
    if g > 1 and g != c:
        mask = jnp.repeat(mask, c // g, axis=-1)
    return x * mask.astype(x.dtype)


def upsample_mask_nearest(mask, size):
    """Nearest-neighbour upsample of an NHWC mask to ``size`` x ``size``.

    The mask resolution always divides the target here (mask_size =
    output_size // granularity), so nearest interpolation is an exact
    pixel-repeat — reference `models/laud_resnet.py:106` (``F.interpolate``).
    """
    h = mask.shape[1]
    if h == size:
        return mask
    factor = size // h
    mask = jnp.repeat(mask, factor, axis=1)
    mask = jnp.repeat(mask, factor, axis=2)
    return mask


def expand_mask(mask, stride=1, padding=1):
    """Dilate an output-side spatial mask to the input side of a conv.

    Reference `models/utils.py:67-89` (``ExpandMask``): for stride > 1 the
    mask is zero-upsampled (value at the top-left of each stride x stride
    cell), then dilated by an all-ones (2*padding+1)^2 kernel summed over all
    mask groups and thresholded > 0.5.

    Because the dense dilate kernel sums over *every* group, the torch op is
    exactly: OR over groups, spatial max-pool with window 2*padding+1, then
    broadcast back to all groups. We compute that directly with
    ``lax.reduce_window`` (VPU-friendly; no conv needed).

    ``mask``: (B, H, W, G) float or bool. Returns bool (B, H*stride, W*stride, G).
    """
    g = mask.shape[-1]
    m = jnp.any(mask > 0.5, axis=-1, keepdims=True)  # OR over groups
    if stride > 1:
        b, h, w, _ = m.shape
        m = m[:, :, None, :, None, :]
        m = jnp.pad(
            m, ((0, 0), (0, 0), (0, stride - 1), (0, 0), (0, stride - 1), (0, 0))
        )
        m = m.reshape(b, h * stride, w * stride, 1)
    if padding > 0:
        k = 2 * padding + 1
        m = lax.reduce_window(
            m,
            False,
            lax.bitwise_or,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
        )
    return jnp.broadcast_to(m, m.shape[:-1] + (g,))


def adaptive_avg_pool(x, out_size):
    """Average-pool NHWC ``x`` to (out_size, out_size) spatially.

    Only the exactly-divisible case is needed (and supported): identical to
    ``F.adaptive_avg_pool2d`` when H % out_size == 0 — a reshape + mean, which
    XLA fuses well. ``out_size`` may be an int or (h, w) tuple.
    """
    if isinstance(out_size, int):
        out_h = out_w = out_size
    else:
        out_h, out_w = out_size
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    if h % out_h or w % out_w:
        raise ValueError(f"adaptive_avg_pool needs divisible sizes, got {h}->{out_h}")
    # reduce_window lowers ~4x faster on TPU than the reshape-mean form
    # (measured on v5e; the reshape forces a slow relayout).
    kh, kw = h // out_h, w // out_w
    s = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, kh, kw, 1),
        padding="VALID",
    )
    return (s * (1.0 / (kh * kw))).astype(x.dtype)


def global_avg_pool(x):
    """GAP over NHWC spatial dims -> (B, C)."""
    return x.mean(axis=(1, 2))
