"""Fused Pallas kernel: block-sparse bottleneck tail on TPU.

This is the TPU realization of the dynamic convolution the reference only
simulates (`DyNetSimulator/hardware_models/multi_cores.py:181-337`): for each
*active* patch of the spatial mask, compute

    conv2 (3x3, VALID over a haloed window) -> BN -> ReLU -> conv3 (1x1) -> BN

entirely in VMEM and scatter the result into a zero-initialized buffer; the
residual add + final ReLU run as one fused XLA epilogue
(``relu(identity + scattered)`` — inactive cells correctly reduce to
``relu(identity)``). Gathered windows never materialize in HBM, which is
what makes this faster than the XLA gather/scatter pipeline (measured 2-4x
slower than dense on v5e due to intermediate buffers).

Static shapes via fixed capacity: every image contributes exactly K patch
slots (active cells first, via stable top-k); invalid slots are skipped with
predicated writes.

Pipelining: input windows are double-buffered across grid steps (step i
starts step i+1's DMAs before computing), and output writes are
double-buffered with exact semaphore matching against each step's valid
pattern, so neither input nor output DMA latency sits on the critical path
— only issue cost does.

Mosaic layout notes (probed empirically on v5e):
* HBM->VMEM window DMAs with arbitrary window sizes require the channel axis
  pre-split as ``(..., C // 128, 128)``; bf16 additionally needs >= 2x128
  channels. Channels are zero-padded accordingly (free on the MXU, which
  pads to 128 lanes anyway).
* bf16 ``concatenate`` of shifted window slices fails to lower; the 3x3 conv
  is computed as nine accumulated matmuls (one per kernel tap) instead.

BN at eval folds into per-channel affines (see :func:`fold_bn`).
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
            x_ref, z_ref, w2_ref, a2_ref, b2_ref, w3_ref, a3_ref, b3_ref,
            out_ref,  # z_ref is the zeros initializer aliased into out_ref
            xwin, owin, in_sems, out_sems,
            *, patches_per_step: int, patch: int, n_cells: int,
            cells_w: int, c_in: int, c_out: int):
    p_count = patches_per_step
    g = patch
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    slot = step % 2

    def coords(step_v, p):
        flat = idx_ref[step_v * p_count + p]
        b = flat // n_cells
        cell = flat % n_cells
        return b, (cell // cells_w) * g, (cell % cells_w) * g

    def in_dma(step_v, slot_v, p):
        b, r0, c0 = coords(step_v, p)
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(r0, g + 2), pl.ds(c0, g + 2), :, :],
            xwin.at[slot_v, p], in_sems.at[slot_v, p],
        )

    def out_dma(step_v, slot_v, p):
        b, r0, c0 = coords(step_v, p)
        return pltpu.make_async_copy(
            owin.at[slot_v, p],
            out_ref.at[b, pl.ds(r0, g), pl.ds(c0, g), :, :],
            out_sems.at[slot_v, p],
        )

    # --- input pipeline: prime step 0, prefetch step+1 -------------------
    # Input DMAs are predicated on slot validity exactly like the output
    # scatters: a padding slot's compute result is discarded anyway, and
    # the per-DMA issue floor (~0.27 us) is the kernel's dominant cost, so
    # skipping invalid windows directly saves capacity-minus-realized work.
    @pl.when(step == 0)
    def _():
        for p in range(p_count):
            @pl.when(valid_ref[step * p_count + p] > 0)
            def _():
                in_dma(step, slot, p).start()

    @pl.when(step + 1 < n_steps)
    def _():
        for p in range(p_count):
            @pl.when(valid_ref[(step + 1) * p_count + p] > 0)
            def _():
                in_dma(step + 1, (step + 1) % 2, p).start()

    for p in range(p_count):
        @pl.when(valid_ref[step * p_count + p] > 0)
        def _():
            in_dma(step, slot, p).wait()

    # --- output slot reuse: wait step-2's writes on this slot ------------
    @pl.when(step >= 2)
    def _():
        for p in range(p_count):
            @pl.when(valid_ref[(step - 2) * p_count + p] > 0)
            def _():
                out_dma(step - 2, slot, p).wait()

    # --- conv2 as nine accumulated taps (bf16-safe, no concat) ----------
    rows = p_count * g * g
    xv = xwin[slot].reshape(p_count, g + 2, g + 2, c_in)
    acc = jnp.zeros((rows, w2_ref.shape[-1]), jnp.float32)
    for ki in range(3):
        for kj in range(3):
            tap = xv[:, ki:ki + g, kj:kj + g, :].reshape(rows, c_in)
            acc += jnp.dot(tap, w2_ref[ki * 3 + kj],
                           preferred_element_type=jnp.float32)
    h = acc * a2_ref[:] + b2_ref[:]
    h = jnp.maximum(h, 0.0).astype(xwin.dtype)

    # --- conv3 (1x1) + folded BN ------------------------------------------
    y = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
    y = y * a3_ref[:] + b3_ref[:]
    owin[slot] = y.astype(out_ref.dtype).reshape(owin.shape[1:])

    # --- scatter: start async writes for valid patches --------------------
    for p in range(p_count):
        @pl.when(valid_ref[step * p_count + p] > 0)
        def _():
            out_dma(step, slot, p).start()

    # --- drain at the end --------------------------------------------------
    @pl.when(step == n_steps - 1)
    def _():
        @pl.when(step >= 1)
        def _():
            for p in range(p_count):
                @pl.when(valid_ref[(step - 1) * p_count + p] > 0)
                def _():
                    out_dma(step - 1, (step - 1) % 2, p).wait()
        for p in range(p_count):
            @pl.when(valid_ref[step * p_count + p] > 0)
            def _():
                out_dma(step, slot, p).wait()


def _rows_target(patch: int) -> int:
    """Patches per grid step so the matmul has ~256 rows."""
    return max(1, 256 // (patch * patch))


@functools.partial(jax.jit, static_argnames=("patch", "capacity"))
def masked_bottleneck_tail(x1, identity, mask_cells, w2, a2, b2, w3, a3, b3,
                           *, patch: int, capacity: int):
    """Run the fused sparse tail. Returns relu(identity + scattered).

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
    co_pad = _pad_channels(identity[:1, :1, :1]).shape[-1]
    x5 = x_p.reshape(b, hh + 2, ww + 2, c_pad // LANES, LANES)
    zeros5 = jnp.zeros((b, hh, ww, co_pad // LANES, LANES), identity.dtype)

    # weights: (9, C_pad, C2_pad) taps; conv2 output padded to LANES so the
    # conv3 matmul stays aligned.
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
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to output)
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
                (2, p_per_step, patch + 2, patch + 2, c_pad // LANES, LANES),
                x1.dtype,
            ),
            pltpu.VMEM(
                (2, p_per_step, patch, patch, co_pad // LANES, LANES),
                identity.dtype,
            ),
            pltpu.SemaphoreType.DMA((2, p_per_step)),
            pltpu.SemaphoreType.DMA((2, p_per_step)),
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
        out_shape=jax.ShapeDtypeStruct(zeros5.shape, identity.dtype),
        input_output_aliases={3: 0},  # zeros (after 2 prefetch + x) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat_idx, valid, x5, zeros5, w2p.astype(x1.dtype),
      row(a2, c_mid), row(b2, c_mid), w3p.astype(x1.dtype),
      row(a3, co_pad), row(b3, co_pad))

    scattered = out5.reshape(b, hh, ww, co_pad)[..., :co]
    return jnp.maximum(identity + scattered, 0.0)
