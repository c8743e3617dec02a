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
    """Nearest-neighbour upsample of an NHWC mask to ``size`` (int for
    square, or an ``(h, w)`` tuple for rectangular feature maps — the
    detection backbones interpolate a square-or-rect masker grid onto the
    rectangular stage output, reference `lad_mmdet_resnet.py:274`).

    When the mask resolution divides the target (the ImageNet case:
    mask_size = output_size // granularity) this is an exact pixel-repeat;
    otherwise it gathers with torch's ``F.interpolate(mode='nearest')``
    index rule ``src = floor(dst * in / out)``.
    """
    if isinstance(size, int):
        out_h = out_w = size
    else:
        out_h, out_w = size
    h, w = mask.shape[1], mask.shape[2]
    if h == out_h and w == out_w:
        return mask
    if out_h % h == 0 and out_w % w == 0:
        mask = jnp.repeat(mask, out_h // h, axis=1)
        mask = jnp.repeat(mask, out_w // w, axis=2)
        return mask
    import numpy as np

    ih = np.floor(np.arange(out_h) * h / out_h).astype(np.int32)
    iw = np.floor(np.arange(out_w) * w / out_w).astype(np.int32)
    return mask[:, ih][:, :, iw]


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


def _adaptive_pool_matrix(in_size: int, out_size: int):
    """(out, in) averaging matrix with torch ``adaptive_avg_pool``'s window
    rule: output cell i averages rows [floor(i*in/out), ceil((i+1)*in/out))."""
    import numpy as np

    p = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-(i + 1) * in_size // out_size)
        p[i, lo:hi] = 1.0 / (hi - lo)
    return p


def adaptive_avg_pool(x, out_size):
    """Average-pool NHWC ``x`` to ``out_size`` spatially (int or (h, w)).

    Matches ``F.adaptive_avg_pool2d`` exactly. Divisible sizes (the
    ImageNet path) lower to a strided ``reduce_window``; the general case
    (rectangular detection features) contracts with per-dimension
    window-averaging matrices — tiny matmuls at masker resolution.
    """
    if isinstance(out_size, int):
        out_h = out_w = out_size
    else:
        out_h, out_w = out_size
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    if h % out_h == 0 and w % out_w == 0:
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
    ph = jnp.asarray(_adaptive_pool_matrix(h, out_h))
    pw = jnp.asarray(_adaptive_pool_matrix(w, out_w))
    y = jnp.einsum("oh,bhwc->bowc", ph, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", pw, y)
    return y.astype(x.dtype)


def global_avg_pool(x):
    """GAP over NHWC spatial dims -> (B, C)."""
    return x.mean(axis=(1, 2))
