"""Fused Pallas kernel: block-sparse bottleneck tail on TPU.

This is the TPU realization of the dynamic convolution the reference only
simulates (`DyNetSimulator/hardware_models/multi_cores.py:181-337`): for each
*active* patch of the spatial mask, compute

    conv2 (3x3, VALID over a haloed window) -> BN -> ReLU ->
    conv3 (1x1) -> BN -> (+ identity window) -> write back

entirely in VMEM — gathered windows never materialize in HBM, which is what
makes this faster than the XLA gather/scatter pipeline (whose intermediate
(B, K, G+2, G+2, C) buffers triple the HBM traffic; measured 2-4x slower
than dense on v5e).

Static shapes via fixed capacity: every image contributes exactly K patch
slots (active cells first, via stable top-k); invalid slots are skipped with
predicated writes.

Mosaic layout notes (probed empirically on v5e):
* HBM->VMEM window DMAs with arbitrary window sizes require the channel axis
  pre-split as ``(..., C // 128, 128)`` — plain ``(win, win, C)`` copies only
  compile when ``win % 8 == 0`` and ``C == 128``/``256``-at-win8. We
  therefore view all spatial tensors as 5-D with a 128-lane minor axis
  (channels are zero-padded up to a multiple of 128 when needed).
* bf16 ``concatenate`` of shifted window slices fails to lower; the 3x3 conv
  is instead computed as nine accumulated matmuls (one per kernel tap),
  which lowers cleanly for all dtypes.

BN at eval folds into per-channel affines (see :func:`fold_bn`); the final
residual ReLU runs as one fused XLA epilogue outside the kernel (it must
also cover inactive cells, which hold the raw identity via aliasing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Fold eval-mode BatchNorm into a per-channel (a, b): y = a*x + b."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def _pad_channels(x):
    """Pad channels to the DMA-legal minimum: a multiple of 128 lanes, and
    at least 2x128 for bf16 (k=1 split windows fail to lower for bf16 —
    probed empirically)."""
    c = x.shape[-1]
    minimum = 2 * LANES if x.dtype == jnp.bfloat16 else LANES
    target = max(minimum, ((c + LANES - 1) // LANES) * LANES)
    if target != c:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - c)])
    return x


def _kernel(idx_ref, valid_ref,  # scalar prefetch (SMEM)
            x_ref, id_ref, w2_ref, a2_ref, b2_ref, w3_ref, a3_ref, b3_ref,
            out_ref,
            xwin, iwin, owin, in_sems, id_sems, out_sems,
            *, patches_per_step: int, patch: int, n_cells: int,
            cells_w: int, c_in: int, c_out: int):
    """One grid step: DMA P windows in, 9-tap matmuls, DMA P results out."""
    p_count = patches_per_step
    g = patch
    step = pl.program_id(0)

    def coords(p):
        flat = idx_ref[step * p_count + p]
        b = flat // n_cells
        cell = flat % n_cells
        return b, (cell // cells_w) * g, (cell % cells_w) * g

    def in_dmas(p):
        b, r0, c0 = coords(p)
        return (
            pltpu.make_async_copy(
                x_ref.at[b, pl.ds(r0, g + 2), pl.ds(c0, g + 2), :, :],
                xwin.at[p], in_sems.at[p],
            ),
            pltpu.make_async_copy(
                id_ref.at[b, pl.ds(r0, g), pl.ds(c0, g), :, :],
                iwin.at[p], id_sems.at[p],
            ),
        )

    for p in range(p_count):
        for dma in in_dmas(p):
            dma.start()
    for p in range(p_count):
        for dma in in_dmas(p):
            dma.wait()

    # --- conv2 as nine accumulated taps (bf16-safe, no concat) ----------
    rows = p_count * g * g
    xv = xwin[:].reshape(p_count, g + 2, g + 2, c_in)
    acc = jnp.zeros((rows, w2_ref.shape[-1]), jnp.float32)
    for ki in range(3):
        for kj in range(3):
            tap = xv[:, ki:ki + g, kj:kj + g, :].reshape(rows, c_in)
            acc += jnp.dot(tap, w2_ref[ki * 3 + kj],
                           preferred_element_type=jnp.float32)
    h = acc * a2_ref[:] + b2_ref[:]
    h = jnp.maximum(h, 0.0).astype(xwin.dtype)

    # --- conv3 (1x1) + folded BN + residual -----------------------------
    y = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
    y = y * a3_ref[:] + b3_ref[:]
    y = y.reshape(p_count, g, g, c_out)
    y = y + iwin[:].reshape(p_count, g, g, c_out).astype(jnp.float32)
    owin[:] = y.astype(out_ref.dtype).reshape(owin.shape)

    # --- scatter: write active patches back ------------------------------
    for p in range(p_count):
        b, r0, c0 = coords(p)

        @pl.when(valid_ref[step * p_count + p] > 0)
        def _():
            dma = pltpu.make_async_copy(
                owin.at[p],
                out_ref.at[b, pl.ds(r0, g), pl.ds(c0, g), :, :],
                out_sems.at[p],
            )
            dma.start()
            dma.wait()


def _rows_target(patch: int) -> int:
    """Patches per grid step so the matmul has ~256 rows."""
    return max(1, 256 // (patch * patch))


@functools.partial(jax.jit, static_argnames=("patch", "capacity"))
def masked_bottleneck_tail(x1, identity, mask_cells, w2, a2, b2, w3, a3, b3,
                           *, patch: int, capacity: int):
    """Run the fused sparse tail. Returns relu(scattered + identity).

    ``x1``: (B, H, W, C) conv1 output (post bn1/relu), stride-1 block.
    ``identity``: (B, H, W, Co) residual input (post-downsample if any).
    ``mask_cells``: (B, Hm, Wm) 0/1 — the masker's cell decisions.
    ``w2``: (3, 3, C, C) HWIO; ``a2``/``b2``: folded bn2; ``w3``: (C, Co)
    (1x1 kernel squeezed); ``a3``/``b3``: folded bn3.
    ``capacity``: patch slots per image (static).
    """
    b, hh, ww, c = x1.shape
    co = identity.shape[-1]
    hm, wm = mask_cells.shape[1], mask_cells.shape[2]
    n_cells = hm * wm
    assert hm * patch == hh and wm * patch == ww

    # --- select active cells (stable top-k: active first) ---------------
    flat = mask_cells.reshape(b, n_cells)
    vals, idx = jax.lax.top_k(flat, capacity)  # (B, K)
    flat_idx = (jnp.arange(b, dtype=jnp.int32)[:, None] * n_cells
                + idx.astype(jnp.int32)).reshape(-1)
    valid = (vals > 0.5).astype(jnp.int32).reshape(-1)

    p_per_step = _rows_target(patch)
    n_slots = b * capacity
    pad = (-n_slots) % p_per_step
    if pad:
        flat_idx = jnp.concatenate([flat_idx, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.int32)])
    n_steps = (n_slots + pad) // p_per_step

    # --- channel-split 5-D views (Mosaic DMA alignment, see module doc) --
    x_p = _pad_channels(jnp.pad(x1, ((0, 0), (1, 1), (1, 1), (0, 0))))
    c_pad = x_p.shape[-1]
    id_p = _pad_channels(identity)
    co_pad = id_p.shape[-1]
    x5 = x_p.reshape(b, hh + 2, ww + 2, c_pad // LANES, LANES)
    id5 = id_p.reshape(b, hh, ww, co_pad // LANES, LANES)

    # weights: (9, C_pad, Co2_pad) taps; conv2 keeps the true C outputs but
    # pads them to LANES so the conv3 matmul stays aligned.
    w2p = jnp.pad(
        w2, ((0, 0), (0, 0), (0, c_pad - c), (0, (-c) % LANES))
    ).reshape(9, c_pad, c + ((-c) % LANES))
    c_mid = w2p.shape[-1]
    w3p = jnp.pad(w3, ((0, c_mid - c), (0, co_pad - co)))

    row = lambda v, n: jnp.pad(v, (0, n - v.shape[0])).reshape(1, n).astype(
        jnp.float32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (5-D)
            pl.BlockSpec(memory_space=pl.ANY),  # identity (5-D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(
                (p_per_step, patch + 2, patch + 2, c_pad // LANES, LANES),
                x1.dtype,
            ),
            pltpu.VMEM(
                (p_per_step, patch, patch, co_pad // LANES, LANES),
                identity.dtype,
            ),
            pltpu.VMEM(
                (p_per_step, patch, patch, co_pad // LANES, LANES),
                identity.dtype,
            ),
            pltpu.SemaphoreType.DMA((p_per_step,)),
            pltpu.SemaphoreType.DMA((p_per_step,)),
            pltpu.SemaphoreType.DMA((p_per_step,)),
        ],
    )

    kernel = functools.partial(
        _kernel,
        patches_per_step=p_per_step,
        patch=patch,
        n_cells=n_cells,
        cells_w=wm,
        c_in=c_pad,
        c_out=co_pad,
    )

    out5 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(id5.shape, identity.dtype),
        input_output_aliases={3: 0},  # identity (after 2 prefetch + x) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat_idx, valid, x5, id5, w2p.astype(x1.dtype),
      row(a2, c_mid), row(b2, c_mid), w3p.astype(x1.dtype),
      row(a3, co_pad), row(b3, co_pad))

    out = out5.reshape(b, hh, ww, co_pad)[..., :co]
    return jnp.maximum(out, 0.0)
