"""Fused ViT attention Pallas kernel (qkv-direct, short-sequence regime).

The reference's latency model prices unfused attention — HBM-materialized
score tensors, separate softmax passes, and qkv head-split / output-merge
transposes (`DyNetSimulator/hardware_models/predictor_transformer.py:6-106`
models exactly those ops). This kernel is the TPU-native step past that:
one VMEM-resident pass per batch block computes, per head,

    scores = (q @ k^T) * scale + key_mask          (f32 accumulation)
    out    = softmax(scores) @ v  [* head_gate]

reading the *packed* ``(B, L, 3*D)`` qkv projection directly — the
``(B,L,3,H,dh)`` reshape/transpose the unfused path pays two HBM round
trips for never materializes, and the output lands pre-merged as
``(B, L, D)``, ready for the projection matmul.

Head addressing: ``dh=64`` is half a TPU lane tile, so per-head 64-lane
slices would relayout the whole block per head. Instead heads are
processed in 128-lane *pairs* (one aligned slice), with each head's
contraction isolated by a constant lane mask: ``(q2*mask_lo) . k2`` over
all 128 lanes equals head-a's 64-lane dot exactly (the masked lanes
contribute zeros). Matmuls run bf16 x bf16 with f32 accumulation on the
MXU — never f32 x f32, which is 8x slower.

Why not `jax.experimental.pallas.ops.tpu.flash_attention`? Its online-
softmax streaming targets long sequences; at ViT geometry (L~200, dh=64)
its best tuned block config measures 1.54 ms on v5e for DeiT-S bs128 —
no better than unfused XLA. Here the whole ``(L, L)`` score tile fits
VMEM, so no streaming is needed.

Key masking: ``key_mask`` (B, L) with 1 = attend / 0 = exclude is folded
in as an additive ``-1e9`` on masked keys — identical semantics to the
model's dense masked graph (`laudnet_tpu/models/laud_vit.py`), so the
fused serving path is numerically compatible with training. Padded or
ragged token buffers just extend the mask with zeros.

Gradients: :func:`fused_vit_attention` carries a ``custom_vjp``. On the
strip-kernel geometries (even heads on aligned 128-lane pairs, plus odd
head counts via the zero-padded fake head) the backward is itself a fused
Pallas kernel (`_fused_bwd_strips`): each grid step recomputes its pair's
softmax in VMEM (flash-style recompute — nothing but qkv is saved from
the forward) and emits dq/dk/dv strips and the head-gate gradient
without ever materializing a score-shaped tensor in HBM. The additive
key mask is stop-gradiented (structural removal, not a differentiable
gate; see `reference_vit_attention`), so dkey_mask is zeros. Geometries that fall to the whole-block forward keep the unfused
reference-graph backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _fused_fwd(qkv, key_mask, head_mask, num_heads: int, sm_scale: float,
               block_b: int, interpret: bool):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    if num_heads % 2 == 0 and (2 * dh) % 128 == 0 and d % 128 == 0:
        # even heads on aligned 128-lane pairs: strip-grid variant (one
        # head pair per grid step — small blocks pipeline DMA/compute and
        # keep VMEM flat in model width)
        return _fused_fwd_strips(qkv, key_mask, head_mask, num_heads,
                                 sm_scale, block_b, interpret)
    if num_heads % 2 == 1 and (2 * dh) % 128 == 0:
        # odd head counts (T2T-ViT's 7): zero-pad each q/k/v section with
        # one fake head so the aligned strip kernel applies. The fake
        # head's v lanes are zero, so its output lanes are zero and get
        # sliced away — two cheap pad/slice HBM passes instead of the
        # whole-block variant, whose unaligned 64-lane shifts make Mosaic
        # compile for many minutes at width 448.
        n_up = num_heads + 1
        pad = n_up * dh - d
        sections = [qkv[:, :, i * d:(i + 1) * d] for i in range(3)]
        qkv_p = jnp.concatenate(
            [jnp.pad(sec, ((0, 0), (0, 0), (0, pad))) for sec in sections],
            axis=-1,
        )
        hm_p = (None if head_mask is None
                else jnp.pad(head_mask, ((0, 0), (0, 1))))
        out = _fused_fwd_strips(qkv_p, key_mask, hm_p, n_up, sm_scale,
                                block_b, interpret)
        return out[:, :, :d]

    # whole-block variant (head widths below one lane pair): VMEM holds
    # the full (bb, L, 3D) block (double-buffered) + out + two f32 score
    # tiles — shrink bb until it fits the 16 MB scoped budget
    def vmem_bytes(bb):
        return (2 * bb * l * d3 * qkv.dtype.itemsize  # double-buffered in
                + bb * l * d * qkv.dtype.itemsize
                + 2 * bb * l * l * 4)

    bb = min(block_b, b)
    while bb > 1 and vmem_bytes(bb) > 12 * 2**20:
        bb -= 1
    while b % bb:
        bb -= 1
    grid = (b // bb,)
    # 3D (B, 1, L) masks keep every block dim either full or divisible —
    # Mosaic's (8, 128) block-shape rule for 2D (bb, L) would force bb >= 8
    mask3 = key_mask.reshape(b, 1, l)
    hm3 = None if head_mask is None else head_mask.reshape(b, 1, num_heads)

    in_specs = [
        pl.BlockSpec((bb, l, d3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1, l), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, mask3]
    if hm3 is not None:
        in_specs.append(pl.BlockSpec((bb, 1, num_heads),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(hm3)

    bnums = (((2,), (2,)), ((0,), (0,)))  # batched, contract last dims
    pv_nums = (((2,), (1,)), ((0,), (0,)))  # batched, p rows x v

    def kernel(qkv_ref, mask_ref, *rest):
        hmask_ref = rest[0] if hm3 is not None else None
        out_ref = rest[-1]
        x = qkv_ref[:]
        cdt = x.dtype
        neg = (1.0 - mask_ref[:].astype(jnp.float32)) * NEG  # (bb, 1, L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * dh), 2)
        m_lo = (lane < dh).astype(cdt)
        m_hi = 1.0 - m_lo.astype(jnp.float32)
        m_hi = m_hi.astype(cdt)

        def head_out(p, v_sel, hmask_col):
            o = jax.lax.dot_general(
                p.astype(cdt), v_sel, dimension_numbers=pv_nums,
                preferred_element_type=jnp.float32,
            )
            if hmask_ref is not None:
                g = hmask_ref[:, :, hmask_col].astype(jnp.float32)
                o = o * g[:, :, None]
            return o

        outs = []
        for hp in range(num_heads // 2):
            off = 2 * dh * hp
            q2 = x[:, :, off:off + 2 * dh]
            k2 = x[:, :, d + off:d + off + 2 * dh]
            v2 = x[:, :, 2 * d + off:2 * d + off + 2 * dh]
            pair = None
            for half, msk in ((0, m_lo), (1, m_hi)):
                s = jax.lax.dot_general(
                    q2 * msk, k2, dimension_numbers=bnums,
                    preferred_element_type=jnp.float32,
                ) * sm_scale + neg
                p = jax.nn.softmax(s, axis=-1)
                # v masked to this head's lanes -> the half-result lands in
                # its own 64 lanes with zeros elsewhere; summing the two
                # halves packs the pair
                o = head_out(p, v2 * msk, 2 * hp + half)
                pair = o if pair is None else pair + o
            outs.append(pair)
        if num_heads % 2:
            h = num_heads - 1
            q1 = x[:, :, h * dh:(h + 1) * dh]
            k1 = x[:, :, d + h * dh:d + (h + 1) * dh]
            v1 = x[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q1, k1, dimension_numbers=bnums,
                preferred_element_type=jnp.float32,
            ) * sm_scale + neg
            p = jax.nn.softmax(s, axis=-1)
            outs.append(head_out(p, v1, h))
        o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        out_ref[:] = o.astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        interpret=interpret,
    )(*args)
    return out


def _fused_fwd_strips(qkv, key_mask, head_mask, num_heads: int,
                      sm_scale: float, block_b: int, interpret: bool):
    """Even-head variant: grid (batch blocks, head pairs); each step DMAs
    three (bb, L, 128) q/k/v strips of its pair (BlockSpec index maps over
    the same qkv array) and computes both heads with lane-masked
    contractions. Total HBM read is still exactly one pass over qkv.

    block_b=8 is the measured v5e optimum for THIS kernel (DeiT-S bs128
    dense: 9338 img/s at bb8 > 9152/8881/8554 at bb4/2/1) — the opposite
    of the fully fused block kernel's bb=1: here each grid step is one
    small head-pair, so larger batch blocks amortize step boundaries,
    while the block kernel's huge per-step working set pipelines best
    minimal."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    pair_w = 2 * dh
    n_pairs = num_heads // 2

    def vmem_bytes(bb):
        return (2 * 3 * bb * l * pair_w * qkv.dtype.itemsize  # dbl-buffered
                + bb * l * pair_w * qkv.dtype.itemsize
                + 2 * bb * l * l * 4)  # f32 score tiles

    bb = min(block_b, b)
    while bb > 1 and vmem_bytes(bb) > 12 * 2**20:
        bb -= 1
    while b % bb:
        bb -= 1
    grid = (b // bb, n_pairs)

    def strip(section):
        return pl.BlockSpec(
            (bb, l, pair_w),
            lambda i, hp, s=section: (i, 0, s * num_heads // 2 + hp),
            memory_space=pltpu.VMEM,
        )

    mask3 = key_mask.reshape(b, 1, l)
    # head gates lane-expanded to (B, 1, D) so each grid step slices its
    # pair's 128 lanes via the block index — a program_id-dependent lane
    # index inside the kernel is not provably 128-aligned for Mosaic
    hm3 = (None if head_mask is None
           else jnp.repeat(head_mask, dh, axis=-1).reshape(b, 1, d))
    in_specs = [strip(0), strip(1), strip(2),
                pl.BlockSpec((bb, 1, l), lambda i, hp: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv, qkv, qkv, mask3]
    if hm3 is not None:
        in_specs.append(pl.BlockSpec((bb, 1, pair_w),
                                     lambda i, hp: (i, 0, hp),
                                     memory_space=pltpu.VMEM))
        args.append(hm3)

    bnums = (((2,), (2,)), ((0,), (0,)))
    pv_nums = (((2,), (1,)), ((0,), (0,)))

    def kernel(q_ref, k_ref, v_ref, mask_ref, *rest):
        hmask_ref = rest[0] if hm3 is not None else None
        out_ref = rest[-1]
        q2, k2, v2 = q_ref[:], k_ref[:], v_ref[:]
        cdt = q2.dtype
        neg = (1.0 - mask_ref[:].astype(jnp.float32)) * NEG  # (bb, 1, L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pair_w), 2)
        m_lo = (lane < dh).astype(cdt)
        m_hi = (lane >= dh).astype(cdt)
        pair = None
        for msk in (m_lo, m_hi):
            s = jax.lax.dot_general(
                q2 * msk, k2, dimension_numbers=bnums,
                preferred_element_type=jnp.float32,
            ) * sm_scale + neg
            p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot_general(
                p.astype(cdt), v2 * msk, dimension_numbers=pv_nums,
                preferred_element_type=jnp.float32,
            )
            pair = o if pair is None else pair + o
        if hmask_ref is not None:
            # lane-expanded head gates: each head's 64 lanes carry its gate
            pair = pair * hmask_ref[:].astype(jnp.float32)
        out_ref[:] = pair.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, l, pair_w), lambda i, hp: (i, 0, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        interpret=interpret,
    )(*args)


def reference_vit_attention(qkv, key_mask, head_mask, num_heads: int,
                            sm_scale: float):
    """Unfused reference graph with identical semantics (the model's dense
    masked attention) — used for the custom-vjp backward and for tests."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    x = qkv.reshape(b, l, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = x[0], x[1], x[2]  # (B, H, L, dh)
    s = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)
         ) * sm_scale
    # stop_gradient: the additive key mask is structural removal, not a
    # differentiable gate — without it d(key_mask) carries a term scaled
    # by the arbitrary NEG constant (~1e13 at init) that explodes the
    # token-policy heads. Gate gradients flow through the model's
    # multiplicative output masking instead (`models/laud_vit.py`).
    s = s + jax.lax.stop_gradient(
        (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * NEG)
    p = jax.nn.softmax(s, axis=-1)
    o = p @ v.astype(jnp.float32)
    if head_mask is not None:
        o = o * head_mask.astype(jnp.float32)[:, :, None, None]
    return o.transpose(0, 2, 1, 3).reshape(b, l, d).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_vit_attention(qkv, key_mask, head_mask, num_heads: int,
                        sm_scale: float, block_b: int = 8,
                        interpret: bool = False):
    """Fused masked multi-head attention over a packed qkv projection.

    ``qkv``: (B, L, 3*D) in the reference feature layout (3, H, dh);
    ``key_mask``: (B, L) 1/0 keep mask (padding rows get 0);
    ``head_mask``: optional (B, H) per-head output gate.
    Returns (B, L, D) with heads already merged.
    """
    return _fused_fwd(qkv, key_mask, head_mask, num_heads, sm_scale,
                      block_b, interpret)


def _vjp_fwd(qkv, key_mask, head_mask, num_heads, sm_scale, block_b,
             interpret):
    out = _fused_fwd(qkv, key_mask, head_mask, num_heads, sm_scale,
                     block_b, interpret)
    return out, (qkv, key_mask, head_mask)


def _fused_bwd_strips(qkv, key_mask, head_mask, g, num_heads: int,
                      sm_scale: float, block_b: int, interpret: bool):
    """Fused backward for the strip geometry. Grid (batch blocks, head
    pairs); each step recomputes its pair's masked softmax (per-half lane
    masking exactly as the forward, so the recomputed ``p`` is the
    forward's bit pattern) and derives

        dv = p^T (dout*gate)          dp = (dout*gate) v^T
        ds = p * (dp - rowsum(dp*p))
        dq = ds k * scale             dk = ds^T q * scale
        dgate = sum_rows (o_pre * dout)

    The additive key mask is stop-gradiented (see
    ``reference_vit_attention``), so no d(key_mask) is produced — the
    returned dkey_mask is zeros. All intermediates VMEM-resident — the (L, L)-shaped s/p/dp/ds tensors never touch
    HBM (the unfused backward materializes each of them, twice the
    forward's traffic). Returns (dqkv, dkey_mask, dhead_mask)."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    pair_w = 2 * dh
    n_pairs = num_heads // 2
    it = qkv.dtype.itemsize
    gated = head_mask is not None

    def vmem_bytes(bb):
        return (2 * 4 * bb * l * pair_w * it      # q/k/v/dout dbl-buffered
                + 3 * bb * l * pair_w * it        # dq/dk/dv out
                + 6 * bb * l * l * 4)             # s/p/dp/ds + temps (f32)

    bb = min(block_b, b)
    while bb > 1 and (b % bb or vmem_bytes(bb) > 12 * 2**20):
        bb -= 1
    grid = (b // bb, n_pairs)

    def strip_in(section):
        return pl.BlockSpec(
            (bb, l, pair_w),
            lambda i, hp, s=section: (i, 0, s * n_pairs + hp),
            memory_space=pltpu.VMEM,
        )

    gstrip = pl.BlockSpec((bb, l, pair_w), lambda i, hp: (i, 0, hp),
                          memory_space=pltpu.VMEM)
    mask3 = key_mask.reshape(b, 1, l)
    in_specs = [strip_in(0), strip_in(1), strip_in(2), gstrip,
                pl.BlockSpec((bb, 1, l), lambda i, hp: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv, qkv, qkv, g, mask3]
    if gated:
        hm3 = jnp.repeat(head_mask, dh, axis=-1).reshape(b, 1, d)
        in_specs.append(pl.BlockSpec((bb, 1, pair_w),
                                     lambda i, hp: (i, 0, hp),
                                     memory_space=pltpu.VMEM))
        args.append(hm3)

    qk_nums = (((2,), (2,)), ((0,), (0,)))    # contract lanes -> (bb,Lq,Lk)
    pv_nums = (((2,), (1,)), ((0,), (0,)))    # p rows x v -> (bb,Lq,w)
    pt_nums = (((1,), (1,)), ((0,), (0,)))    # contract q rows -> (bb,Lk,w)

    def kernel(q_ref, k_ref, v_ref, g_ref, mask_ref, *rest):
        hmask_ref = rest[0] if gated else None
        dq_ref, dk_ref, dv_ref = rest[-4:-1] if gated else rest[-3:]
        dg_ref = rest[-1] if gated else None
        q2, k2, v2, do2 = q_ref[:], k_ref[:], v_ref[:], g_ref[:]
        cdt = q2.dtype
        neg = (1.0 - mask_ref[:].astype(jnp.float32)) * NEG  # (bb,1,L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pair_w), 2)
        m_lo = (lane < dh).astype(cdt)
        m_hi = (lane >= dh).astype(cdt)
        if gated:
            gate = hmask_ref[:].astype(jnp.float32)      # (bb,1,pair_w)
            do_eff = (do2.astype(jnp.float32) * gate).astype(cdt)
        else:
            do_eff = do2
        dq = dk = dv = None
        dg = None
        for msk in (m_lo, m_hi):
            s = jax.lax.dot_general(
                q2 * msk, k2, dimension_numbers=qk_nums,
                preferred_element_type=jnp.float32,
            ) * sm_scale + neg
            p = jax.nn.softmax(s, axis=-1)               # (bb,Lq,Lk) f32
            pc = p.astype(cdt)
            doh = do_eff * msk                           # (bb,L,w)
            dvh = jax.lax.dot_general(
                pc, doh, dimension_numbers=pt_nums,
                preferred_element_type=jnp.float32,
            )                                            # (bb,Lk,w) lanes msk
            dp = jax.lax.dot_general(
                doh, v2 * msk, dimension_numbers=qk_nums,
                preferred_element_type=jnp.float32,
            )                                            # (bb,Lq,Lk)
            ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
            dsc = ds.astype(cdt)
            dqh = jax.lax.dot_general(
                dsc, k2 * msk, dimension_numbers=pv_nums,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            dkh = jax.lax.dot_general(
                dsc, q2 * msk, dimension_numbers=pt_nums,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            dq = dqh if dq is None else dq + dqh
            dk = dkh if dk is None else dk + dkh
            dv = dvh if dv is None else dv + dvh
            if gated:
                o_pre = jax.lax.dot_general(
                    pc, v2 * msk, dimension_numbers=pv_nums,
                    preferred_element_type=jnp.float32,
                )
                dgh = (o_pre * do2.astype(jnp.float32)).sum(
                    axis=1, keepdims=True)               # (bb,1,w) msk lanes
                dg = dgh if dg is None else dg + dgh
        dq_ref[:] = dq.astype(dq_ref.dtype)
        dk_ref[:] = dk.astype(dk_ref.dtype)
        dv_ref[:] = dv.astype(dv_ref.dtype)
        if gated:
            dg_ref[:] = dg.astype(jnp.float32)

    strip_out = pl.BlockSpec((bb, l, pair_w), lambda i, hp: (i, 0, hp),
                             memory_space=pltpu.VMEM)
    out_specs = [strip_out, strip_out, strip_out]
    out_shape = [jax.ShapeDtypeStruct((b, l, d), qkv.dtype)] * 3
    if gated:
        out_specs.append(pl.BlockSpec((bb, 1, pair_w),
                                      lambda i, hp: (i, 0, hp),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 1, d), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    dqs, dks, dvs = outs[:3]
    dqkv = jnp.concatenate([dqs, dks, dvs], axis=-1)
    # additive key mask is stop-gradiented (structural removal, not a
    # differentiable gate) — zero cotangent, matching the reference vjp
    dmask = jnp.zeros_like(key_mask)
    dhead = None
    if gated:
        dhead = outs[3].reshape(b, num_heads, dh).sum(-1).astype(
            head_mask.dtype)
    return dqkv, dmask, dhead


def _fused_bwd(qkv, key_mask, head_mask, g, num_heads, sm_scale, block_b,
               interpret):
    """Dispatch mirror of `_fused_fwd` for the backward pass."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    if num_heads % 2 == 0 and (2 * dh) % 128 == 0 and d % 128 == 0:
        return _fused_bwd_strips(qkv, key_mask, head_mask, g, num_heads,
                                 sm_scale, block_b, interpret)
    if num_heads % 2 == 1 and (2 * dh) % 128 == 0:
        # odd heads: zero-pad a fake head (exactly as the forward). The
        # fake head's q/k/v and dout lanes are zero, so its dq/dk/dv and
        # ds vanish — no contribution leaks into dmask/dqkv.
        n_up = num_heads + 1
        pad = n_up * dh - d
        sections = [qkv[:, :, i * d:(i + 1) * d] for i in range(3)]
        qkv_p = jnp.concatenate(
            [jnp.pad(sec, ((0, 0), (0, 0), (0, pad))) for sec in sections],
            axis=-1,
        )
        hm_p = (None if head_mask is None
                else jnp.pad(head_mask, ((0, 0), (0, 1))))
        g_p = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
        dqkv_p, dmask, dhead_p = _fused_bwd_strips(
            qkv_p, key_mask, hm_p, g_p, n_up, sm_scale, block_b, interpret)
        d_up = n_up * dh
        dqkv = jnp.concatenate(
            [dqkv_p[:, :, i * d_up:i * d_up + d] for i in range(3)],
            axis=-1,
        )
        dhead = None if dhead_p is None else dhead_p[:, :num_heads]
        return dqkv, dmask, dhead
    # whole-block geometries: unfused reference backward
    _, vjp = jax.vjp(
        lambda a, m, hm: reference_vit_attention(a, m, hm, num_heads,
                                                 sm_scale),
        qkv, key_mask, head_mask,
    )
    return vjp(g)


def _vjp_bwd(num_heads, sm_scale, block_b, interpret, res, g):
    qkv, key_mask, head_mask = res
    if head_mask is None:
        d3 = qkv.shape[-1]
        d = d3 // 3
        dh = d // num_heads
        if (2 * dh) % 128 == 0 and (num_heads % 2 == 1 or d % 128 == 0):
            dqkv, dmask, _ = _fused_bwd(qkv, key_mask, None, g, num_heads,
                                        sm_scale, block_b, interpret)
            return dqkv, dmask, None
        _, vjp = jax.vjp(
            lambda a, m: reference_vit_attention(a, m, None, num_heads,
                                                 sm_scale),
            qkv, key_mask,
        )
        return vjp(g) + (None,)
    return _fused_bwd(qkv, key_mask, head_mask, g, num_heads, sm_scale,
                      block_b, interpret)


fused_vit_attention.defvjp(_vjp_fwd, _vjp_bwd)
