"""Static-shape block-sparse execution primitives (gather -> conv -> scatter).

The reference only *simulates* sparse dynamic-conv execution
(`DyNetSimulator/hardware_models/multi_cores.py:10-65,181-337`: gather active
patches, run the conv on the gathered batch, scatter-add the results); the
actual CUDA kernels are external. This module is the TPU realization: because
XLA demands static shapes, we use **fixed-capacity** patch selection — every
image contributes exactly ``capacity`` patch slots per block, active patches
first (via top-k on the 0/1 mask), padding slots masked to zero on scatter.

With ``capacity >= #active patches`` the result is bit-equivalent to the
dense-masked graph; throughput is set by the capacity, not the realized
density, which is exactly the latency-predictability property the LAUDNet
paper wants from coarse granularity.

All functions are NHWC and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_patches(mask_cells, capacity):
    """Pick up to ``capacity`` active patch indices per image.

    ``mask_cells``: (B, Hm, Wm) 0/1 float — one value per patch cell.
    Returns ``(idx, valid)``: flat cell indices (B, K) int32 and their 0/1
    weights (B, K) — the weight is the mask value of the selected cell, so
    padding slots (selected zeros) contribute nothing at scatter time.

    ``jax.lax.top_k`` is stable for equal values, so active cells (value 1)
    come first in raster order, then inactive ones.
    """
    b, hm, wm = mask_cells.shape
    flat = mask_cells.reshape(b, hm * wm)
    vals, idx = jax.lax.top_k(flat, capacity)
    return idx.astype(jnp.int32), vals


def gather_patches(x, idx, patch, halo):
    """Gather ``(patch + 2*halo)``-sized windows around the selected cells.

    ``x``: (B, H, W, C) with H = W = Hm * patch. ``idx``: (B, K) flat cell
    indices into the (Hm, Wm) cell grid. Returns (B, K, patch + 2*halo,
    patch + 2*halo, C); out-of-bounds halo reads are zero (conv padding
    semantics), implemented by gathering from a zero-padded copy.
    """
    b, h, w, c = x.shape
    wm = w // patch
    size = patch + 2 * halo

    if halo > 0:
        x = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)))

    ci = idx // wm  # cell row
    cj = idx % wm  # cell col
    # Top-left corner of each window in the padded image.
    r0 = ci * patch  # (B, K); +halo offset cancels with pad shift
    c0 = cj * patch

    dr = jnp.arange(size)
    rows = r0[:, :, None] + dr[None, None, :]  # (B, K, size)
    cols = c0[:, :, None] + dr[None, None, :]

    # Advanced-index gather: (B, K, size, size, C).
    bidx = jnp.arange(b)[:, None, None, None]
    return x[bidx, rows[:, :, :, None], cols[:, :, None, :], :]


def scatter_patches_add(base, patches, idx, valid, patch):
    """Scatter-add computed patches into ``base`` (the residual identity).

    ``base``: (B, H, W, C); ``patches``: (B, K, patch, patch, C);
    ``idx``/``valid`` from :func:`select_patches`. Padding slots are zeroed
    via ``valid``; duplicate indices are impossible by construction (top-k
    returns distinct cells), so add == write on active cells.
    """
    b, h, w, c = base.shape
    hm, wm = h // patch, w // patch

    patches = patches * valid[:, :, None, None, None].astype(patches.dtype)

    # View base as the cell grid, scatter on the flat cell axis.
    cells = base.reshape(b, hm, patch, wm, patch, c).transpose(0, 1, 3, 2, 4, 5)
    cells = cells.reshape(b, hm * wm, patch, patch, c)

    def one(cells_i, patches_i, idx_i):
        return cells_i.at[idx_i].add(patches_i, mode="drop")

    cells = jax.vmap(one)(cells, patches, idx)
    cells = cells.reshape(b, hm, wm, patch, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return cells.reshape(b, h, w, c)


# (a conv_on_patches helper used to live here; the model path inlines its
# own nn.Conv over gathered patches — laud_resnet.py — so it was removed
# rather than kept as drift-prone dead API)
