"""Fully fused ViT transformer block — one Pallas kernel per layer.

The fused *attention* kernel (`vit_attention.py`) removed the score-tensor
HBM round trips; this kernel removes everything else: LayerNorm read/write
passes, the qkv/proj/fc1/fc2 matmul boundary materializations, and the
residual re-reads. One grid step loads a batch block of the token stream
plus the layer's weights into VMEM and runs

    x2  = x + proj(attn(LN1(x))) * token_row_mask
    out = x2 + fc2(gelu(fc1(LN2(x2)))) * token_row_mask

entirely on-chip; per layer the only HBM traffic is x in, out out, and one
weight fetch. Attention uses the lane-masked head-pair scheme of
`vit_attention.py` (bf16 MXU, f32 accumulation, additive key mask).

This is the serving fast path for dense, token-selection and head-gated
LAUD-ViT (`infer/fused_vit.py` composes it with the policy heads and top-k
selection between blocks); layer gating modulates the residual structure
per sample, so those models use the attention-only fusion instead. Odd
head counts (T2T-ViT's 7) ride a zero-padded fake head prepared by the
engine at build time (see `fused_vit_block`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _ln_onepass(x, scale, bias, eps=1e-6):
    """One-pass LayerNorm: var = E[x^2] - mu^2 (a single read of x instead
    of two). Catastrophic cancellation needs |mu| >> std, which the
    residual stream never exhibits; measured deviation vs the two-pass
    form is at bf16-ulp level (probe_block_budget.py). Saves ~0.22
    us/img/layer at DeiT-S bs128 (measured v5e)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = (xf * xf).mean(axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _gelu_exact(x):
    """Exact (erf) GELU with an in-kernel erf: Mosaic has no erf/erfc
    lowering, so use Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 —
    below bf16 resolution)."""
    z = x * 0.7071067811865476
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _gelu_tanh(x):
    """The canonical tanh GELU approximation (max abs deviation from the
    erf form ~3e-4, one bf16 ulp at |x|~0.5). One tanh replaces the
    exp + divide + polynomial of the A-S erf; measured ~0.5 us/img/layer
    cheaper at DeiT-S bs128 (probe_block_budget.py fast_tanh vs
    fast_exact)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _qrows(x, eps=1e-6):
    """In-kernel per-row dynamic symmetric int8 (`ops/quant.py` semantics,
    inlined so it runs on the VPU over VMEM-resident rows)."""
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(a, eps) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


_BNUMS = (((2,), (2,)), ((0,), (0,)))
_PV_NUMS = (((2,), (1,)), ((0,), (0,)))


def _pair_attention(qkv, neg, d, dh, n_pairs, sm_scale, cdt, fast=False):
    """Lane-masked head-PAIR attention over a packed (bb, L, 3D) qkv
    buffer (shared by the bf16 and int8 block kernels): dh=64 is half a
    128-lane tile, so heads process in pairs with constant lane masks —
    (q2*m_lo)@k2 isolates head a exactly. f32 scores/softmax in VMEM,
    additive key mask ``neg``; returns the merged (bb, L, D) output.

    ``fast`` defers the softmax normalization to AFTER prob @ V: the
    (L, L) probability tensor skips its divide; the (L, 2*dh) output is
    divided by the row sums instead — L/(2*dh) ~ 1.5x fewer VPU divides
    and one fewer (L, L) pass. Mathematically identical (softmax(s) @ v
    == (exp(s - max) @ v) / sum(exp(s - max))); deviation is fp
    reordering only, bf16-ulp level (probe_block_budget.py 'unnorm',
    measured -0.63 us/img/layer at DeiT-S bs128).

    V is NOT masked: prob @ v2 computes each half's valid output in its
    own head's lanes (the other lanes carry the cross-head garbage), and
    the merge lane-SELECTS half a's lo lanes and half b's hi lanes —
    bit-identical to masking v before the matmul (the selected lanes are
    the same f32 contraction) but two fewer (L, 128) VPU multiplies per
    pair (probe 'post_vselect', measured -0.13 us/img/layer). Folding
    the q mask into zeroed weight columns was also probed and measured
    SLOWER ('post_premask': the widened q matmul costs more than the
    mask multiply it removes), so q keeps the lane-mask multiply."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * dh), 2)
    m_lo = (lane < dh).astype(cdt)
    m_hi = (lane >= dh).astype(cdt)
    outs = []
    for hp in range(n_pairs):
        off = 2 * dh * hp
        q2 = qkv[:, :, off:off + 2 * dh]
        k2 = qkv[:, :, d + off:d + off + 2 * dh]
        v2 = qkv[:, :, 2 * d + off:2 * d + off + 2 * dh]
        halves = []
        for msk in (m_lo, m_hi):
            s = jax.lax.dot_general(
                q2 * msk, k2, dimension_numbers=_BNUMS,
                preferred_element_type=jnp.float32,
            ) * sm_scale + neg
            if fast:
                p = jnp.exp(s - jax.lax.stop_gradient(
                    s.max(axis=-1, keepdims=True)))
            else:
                p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot_general(
                p.astype(cdt), v2, dimension_numbers=_PV_NUMS,
                preferred_element_type=jnp.float32,
            )
            if fast:
                o = o / p.sum(axis=-1, keepdims=True)
            halves.append(o)
        outs.append(jnp.where(lane < dh, halves[0],
                              halves[1]).astype(cdt))
    return jnp.concatenate(outs, axis=-1)


def _spec_for(a, batched, bb):
    """BlockSpec: batch-blocked leading dim for per-image operands, whole
    array for weights/scales."""
    if batched:
        return pl.BlockSpec((bb,) + a.shape[1:],
                            lambda i: (i,) + (0,) * (a.ndim - 1),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _pick_bb(b, block_b, vmem_bytes, vmem_limit_bytes):
    """Walk the batch block down until the working set fits the scoped
    VMEM limit; auto-raise the limit for weights-dominated geometries
    (v5e has 128MB physical; Mosaic's default scoped limit is 16MB)."""
    HEAD = 2 * 2**20                    # headroom for Mosaic's own scratch
    limit = vmem_limit_bytes or 16 * 2**20
    bb = min(block_b, b)
    while bb > 1 and (b % bb or vmem_bytes(bb) > limit - HEAD):
        bb -= 1
    if vmem_limit_bytes is None and vmem_bytes(bb) > limit - HEAD:
        vmem_limit_bytes = min(100 * 2**20, vmem_bytes(bb) + 8 * 2**20)
    return bb, vmem_limit_bytes


def fused_vit_block_int8(x, key_mask, row_mask, qparams, *, num_heads: int,
                         head_gate=None, ln_eps: float = 1e-6,
                         block_b: int = 1, vmem_limit_bytes: int = None,
                         interpret: bool = False):
    """W8A8 fully fused ViT block: the four weight matmuls (qkv, proj,
    fc1, fc2) run s8 x s8 -> s32 on the MXU (2x the bf16 peak on v5e),
    with per-output-channel weight scales (baked at engine build,
    `ops/quant.py::quantize_weight`) and per-token dynamic activation
    scales computed on-chip right before each matmul. Attention itself
    (scores, softmax, prob x V) stays bf16 — it is ~15% of the FLOPs and
    softmax wants the f32 path anyway. LayerNorms, residuals, and GELU run
    f32 exactly like the bf16 kernel, so the ONLY deviation from
    `fused_vit_block` is the quantization of the weight-matmul operands.

    ``qparams``: dict with ln1/ln2 (scale, bias) and qkv/proj/fc1/fc2 as
    {"kernel_q": int8 (K, N), "scale": f32 (N,), "bias": (N,)}.
    Same geometry requirements and batch-block policy as
    `fused_vit_block` (including the zero-padded fake head for odd head
    counts — fake columns quantize to 0 with the eps-floored scale);
    int8 weights additionally HALVE the per-layer
    weight DMA (DeiT-B: 7.1MB vs 14.2MB), so weights-dominated geometries
    fit Mosaic's default scoped-VMEM limit again. No ``mlp_chunk``
    escape hatch here (bf16-only): the auto-raised VMEM limit covers
    every geometry the engine admits; a geometry too large for that
    should serve the bf16 kernel with chunking instead.
    """
    b, l, d = x.shape
    dh = d // num_heads
    da = qparams["qkv"]["kernel_q"].shape[1] // 3
    n_up = num_heads + num_heads % 2
    assert da == n_up * dh and (2 * dh) % 128 == 0 and da % 128 == 0, (
        "fused_vit_block_int8 needs 128-aligned head pairs "
        "(odd head counts: pre-pad qkv/proj with a zero fake head)"
    )
    hidden = qparams["fc1"]["kernel_q"].shape[1]
    n_pairs = n_up // 2
    sm_scale = dh**-0.5
    it = x.dtype.itemsize

    def vmem_bytes(bb):
        tok = bb * l
        return (4 * tok * d * it                      # x in + out, dbl-buf
                + tok * 3 * da * it                   # qkv buffer
                + 2 * bb * l * l * 4                  # f32 score + prob
                + 2 * tok * d * 4                     # f32 x2 + LN temp
                + tok * max(d, hidden)                # int8 operand
                + tok * (da + d) * it                 # attn concat + h2
                + tok * (hidden + d) * 4              # mlp f32
                + d * 3 * da + da * d + 2 * d * hidden  # int8 weights
                + (4 * d + 4 * da + hidden) * 4
                + (d + 4 * da + hidden) * 4)          # ln/scales/biases

    bb, vmem_limit_bytes = _pick_bb(b, block_b, vmem_bytes,
                                    vmem_limit_bytes)
    grid = (b // bb,)

    w = qparams
    gated = head_gate is not None
    args = [x, key_mask, row_mask]
    if gated:
        args.append(head_gate)
    n_batched = len(args)
    args += [
        w["ln1"]["scale"].reshape(1, d), w["ln1"]["bias"].reshape(1, d),
        w["qkv"]["kernel_q"], w["qkv"]["scale"].reshape(1, 3 * da),
        w["qkv"]["bias"].reshape(1, 3 * da),
        w["proj"]["kernel_q"], w["proj"]["scale"].reshape(1, d),
        w["proj"]["bias"].reshape(1, d),
        w["ln2"]["scale"].reshape(1, d), w["ln2"]["bias"].reshape(1, d),
        w["fc1"]["kernel_q"], w["fc1"]["scale"].reshape(1, hidden),
        w["fc1"]["bias"].reshape(1, hidden),
        w["fc2"]["kernel_q"], w["fc2"]["scale"].reshape(1, d),
        w["fc2"]["bias"].reshape(1, d),
    ]

    in_specs = [_spec_for(a, k < n_batched, bb) for k, a in enumerate(args)]

    def qmm(xf, wq_ref, wscale_ref, bias_ref):
        """f32 rows -> dynamic int8 -> s32 MXU matmul -> rank-1 dequant."""
        xq, xs = _qrows(xf)
        acc = jax.lax.dot_general(
            xq, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * xs
                * wscale_ref[:].astype(jnp.float32)
                + bias_ref[:].astype(jnp.float32))

    def kernel(x_ref, kmask_ref, rmask_ref, *rest):
        hg_ref = rest[0] if gated else None
        (ln1s, ln1b, wqkv, sqkv, bqkv, wproj, sproj, bproj, ln2s, ln2b,
         w1, s1, b1, w2, s2, b2, out_ref) = rest[1 if gated else 0:]
        xin = x_ref[:]
        cdt = xin.dtype
        neg = (1.0 - kmask_ref[:].astype(jnp.float32)) * NEG
        rmask = rmask_ref[:].astype(jnp.float32)

        h1 = _ln(xin, ln1s[0], ln1b[0], ln_eps)  # f32 (bb, l, d)
        qkv = qmm(h1.reshape(bb * l, d), wqkv, sqkv, bqkv).astype(cdt)
        qkv = qkv.reshape(bb, l, 3 * da)

        attn = _pair_attention(qkv, neg, da, dh, n_pairs, sm_scale, cdt)
        if hg_ref is not None:
            attn = attn * hg_ref[:].astype(cdt)

        proj = qmm(attn.astype(jnp.float32).reshape(bb * l, da),
                   wproj, sproj, bproj).reshape(bb, l, d)
        x2 = xin.astype(jnp.float32) + proj * rmask

        h2 = _ln(x2, ln2s[0], ln2b[0], ln_eps)
        u = _gelu_exact(qmm(h2.reshape(bb * l, d), w1, s1, b1))
        y = qmm(u, w2, s2, b2).reshape(bb, l, d)
        out_ref[:] = (x2 + y * rmask).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
        interpret=interpret,
    )(*args)


def fused_vit_block(x, key_mask, row_mask, params, *, num_heads: int,
                    head_gate=None,
                    ln_eps: float = 1e-6, block_b: int = 1,
                    mlp_chunk: int = None, vmem_limit_bytes: int = None,
                    fast_math: bool = False, interpret: bool = False):
    """One transformer block, fully fused.

    ``fast_math`` swaps three VPU-bound elementwise stages for cheaper
    forms measured on v5e (`tools/probe_block_budget.py`): deferred
    softmax normalization (exact math, fp reordering only), one-pass
    LayerNorm (bf16-ulp deviation), and tanh GELU (max abs deviation
    3e-4 vs erf). Combined: -1.5 us/img/layer of the ~7 us DeiT-S bs128
    block (~21%); end-to-end deviation one bf16 ulp on the residual
    stream. The MXU matmuls are untouched — the budget probe showed the
    block is VPU-bound (stacking the head-pair score matmul to halve
    logical MXU FLOPs measured SLOWER). Default off: the exact kernel
    remains the test oracle; the serving engine turns it on.

    ``x``: (B, L, D); ``key_mask``: (B, 1, L) 1/0 over keys; ``row_mask``:
    (B, L, 1) 1/0 over token rows (the model multiplies both branch
    outputs by the token mask); ``params``: dict with ln1/ln2 (scale,
    bias), qkv/proj/fc1/fc2 (kernel, bias) in the flax layouts.
    ``head_gate``: optional (B, 1, Da) per-head 0/1 gate lane-expanded to
    feature lanes (each head's dh lanes carry its gate — the model
    multiplies per-head attention outputs before the merge,
    `models/laud_vit.py` head_skip; identical after merge). Requires
    128-aligned head pairs: (2*dh) % 128 == 0. Odd head counts (T2T's
    7 heads / D=448) ride a zero-padded FAKE head: the caller pads the
    qkv kernel/bias with one all-zero head per q/k/v section (columns)
    and the proj kernel with dh zero rows (`infer/fused_vit.py` does
    this at build time), giving a padded attention width
    Da = (H+1)*dh with 128-aligned slice offsets. The fake head's q/k/v
    are exactly zero, so its pair-masked scores are 0, its attention
    output is 0, and the zero proj rows discard it — bit-exact vs the
    unpadded math. Returns (B, L, D).

    Batch-block choice: ``block_b=1`` — a v5e sweep (DeiT-S and DeiT-B,
    L=197/138/99, bs128) found batch-block 1 beats every larger block on
    every geometry (S dense: bb1 10760 > bb2 10382 > bb4/8/16
    9797/8615/9147 img/s; S select: bb1 13671 > mixed-bb 13103 > bb2
    12476; B dense: bb1 4034 > bb2 3823 > bb4 3283): the minimal
    per-step working set pipelines DMA/compute deepest, and grid-step
    boundaries are cheaper than lost overlap at every size tried.
    ``block_b`` raises the MAX block for experiments; the VMEM estimate
    still walks it down to fit.

    Weights-dominated geometries (DeiT-B: ~14.2MB bf16/layer) exceed
    Mosaic's 16MB default scoped-VMEM limit even at bb=1; the kernel
    auto-raises the limit (v5e has 128MB physical VMEM).
    ``vmem_limit_bytes`` overrides that explicitly.

    ``mlp_chunk`` optionally runs fc1/gelu/fc2 in row slices (the ops are
    row-independent; bit-equal on the MXU) to shrink the f32 hidden
    buffer; it costs ~5% at DeiT-S size (measured), so it stays off
    unless a geometry cannot fit otherwise.
    """
    b, l, d = x.shape
    dh = d // num_heads
    da = params["qkv"]["kernel"].shape[1] // 3
    n_up = num_heads + num_heads % 2
    assert da == n_up * dh and (2 * dh) % 128 == 0 and da % 128 == 0, (
        "fused_vit_block needs 128-aligned head pairs "
        "(odd head counts: pre-pad qkv/proj with a zero fake head)"
    )
    hidden = params["fc1"]["kernel"].shape[1]
    n_pairs = n_up // 2
    sm_scale = dh**-0.5
    it = x.dtype.itemsize

    def vmem_bytes(bb):
        tok = bb * l
        rows = tok if mlp_chunk is None else min(mlp_chunk, tok)
        return (4 * tok * d * it                      # x in + out, dbl-buf
                + tok * 3 * da * it                   # qkv buffer
                + 2 * bb * l * l * 4                  # f32 score + prob
                + 2 * tok * d * 4                     # f32 x2 + LN temp
                + tok * (da + d) * it                 # attn concat + h2
                + rows * (hidden + d) * 4             # mlp slice f32
                + (d * 3 * da + da * d + 2 * d * hidden
                   + 4 * d + 4 * da + hidden) * it)

    bb, vmem_limit_bytes = _pick_bb(b, block_b, vmem_bytes,
                                    vmem_limit_bytes)
    grid = (b // bb,)

    w = params
    gated = head_gate is not None
    args = [x, key_mask, row_mask]
    if gated:
        args.append(head_gate)
    n_batched = len(args)
    args += [
        w["ln1"]["scale"].reshape(1, d), w["ln1"]["bias"].reshape(1, d),
        w["qkv"]["kernel"], w["qkv"]["bias"].reshape(1, 3 * da),
        w["proj"]["kernel"], w["proj"]["bias"].reshape(1, d),
        w["ln2"]["scale"].reshape(1, d), w["ln2"]["bias"].reshape(1, d),
        w["fc1"]["kernel"], w["fc1"]["bias"].reshape(1, hidden),
        w["fc2"]["kernel"], w["fc2"]["bias"].reshape(1, d),
    ]

    in_specs = [_spec_for(a, k < n_batched, bb) for k, a in enumerate(args)]

    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)

    ln = _ln_onepass if fast_math else _ln
    gelu = _gelu_tanh if fast_math else _gelu_exact

    def kernel(x_ref, kmask_ref, rmask_ref, *rest):
        hg_ref = rest[0] if gated else None
        (ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b, w1, b1, w2,
         b2, out_ref) = rest[1 if gated else 0:]
        xin = x_ref[:]
        cdt = xin.dtype
        neg = (1.0 - kmask_ref[:].astype(jnp.float32)) * NEG  # (bb,1,L)
        rmask = rmask_ref[:].astype(jnp.float32)  # (bb, L, 1)

        h1 = ln(xin, ln1s[0], ln1b[0], ln_eps).astype(cdt)
        qkv = (mm(h1.reshape(bb * l, d), wqkv[:])
               + bqkv[:].astype(jnp.float32)).astype(cdt)
        qkv = qkv.reshape(bb, l, 3 * da)

        attn = _pair_attention(qkv, neg, da, dh, n_pairs, sm_scale, cdt,
                               fast=fast_math)
        if hg_ref is not None:
            # lane-expanded per-head gate; each head's dh lanes carry it
            attn = attn * hg_ref[:].astype(cdt)

        proj = (mm(attn.reshape(bb * l, da), wproj[:])
                + bproj[:].astype(jnp.float32)).reshape(bb, l, d)
        x2 = xin.astype(jnp.float32) + proj * rmask

        h2 = ln(x2.astype(cdt), ln2s[0], ln2b[0], ln_eps).astype(cdt)
        if mlp_chunk is None:
            u = (mm(h2.reshape(bb * l, d), w1[:])
                 + b1[:].astype(jnp.float32))
            u = gelu(u).astype(cdt)
            y = (mm(u, w2[:]) + b2[:].astype(jnp.float32)).reshape(bb, l, d)
            out_ref[:] = (x2 + y * rmask).astype(out_ref.dtype)
        else:
            h2r = h2.reshape(bb * l, d)
            x2r = x2.reshape(bb * l, d)
            rr = rmask.reshape(bb * l, 1)
            rows = bb * l
            oc = []
            for r0 in range(0, rows, mlp_chunk):
                r1 = min(rows, r0 + mlp_chunk)
                u = mm(h2r[r0:r1], w1[:]) + b1[:].astype(jnp.float32)
                u = gelu(u).astype(cdt)
                yc = mm(u, w2[:]) + b2[:].astype(jnp.float32)
                oc.append((x2r[r0:r1]
                           + yc * rr[r0:r1]).astype(out_ref.dtype))
            out_ref[:] = jnp.concatenate(oc, axis=0).reshape(bb, l, d)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
        interpret=interpret,
    )(*args)


def fused_vit_segment(x, token_mask, params_list, *, num_heads: int,
                      ln_eps: float = 1e-6, block_b: int = 1,
                      vmem_limit_bytes: int = None,
                      fast_math: bool = False, interpret: bool = False):
    """A SEGMENT of transformer layers in one Pallas kernel.

    `fused_vit_block` pays a per-grid-step boundary (~0.8us) and an
    x-in/x-out HBM round trip per LAYER. Between token-selection gather
    points the sequence length is constant, so consecutive layers can
    share one kernel: all their weights stay VMEM-resident across the
    batch grid (constant index_map -> fetched once), x makes ONE round
    trip for the whole segment, and the per-layer token gates compose
    IN-KERNEL. DeiT-S's 1.0x3/0.7x4/0.5x5 schedule becomes 3 kernels +
    2 selection ops instead of 12 kernels.

    ``x``: (B, L, D); ``token_mask``: (B, L) composed 0/1 gate state at
    segment entry (the segment's first layer's own gate/selection is
    applied OUTSIDE, at the gather point). ``params_list``: one dict per
    layer with ln1/qkv/proj/ln2/fc1/fc2 (odd head counts: pre-padded
    with the zero fake head, see `fused_vit_block`); a layer dict may
    also carry ``token_policy`` {kernel (D,2), bias (2,)} — then that
    layer's eval token gate (logit0 >= logit1, class token pinned)
    is computed from x at its entry and composed into the running mask,
    exactly as `infer/fused_vit.py` does between per-layer kernels.

    Layouts: Mosaic requires each operand's last-two block dims to be
    (8,128)-aligned or whole, so the mask rides in BOTH broadcast-ready
    shapes — key layout (B,1,L) and row layout (B,L,1) — as separate
    operands (the per-block kernel's scheme), avoiding any (bb,L)-block
    mask operand. In-kernel gate updates keep both layouts live: the
    row update slices logit lanes directly, the key update pays one
    tiny (bb,L,1)->(bb,1,L) swap per policy layer.

    Returns ``(out, token_mask_out)`` with ``token_mask_out`` (B, L) —
    the final mask feeds the next segment / gather point. Head/layer
    gating models keep the per-block kernels (their gates need the
    class token's policy head per layer).
    """
    b, l, d = x.shape
    dh = d // num_heads
    da = params_list[0]["qkv"]["kernel"].shape[1] // 3
    n_up = num_heads + num_heads % 2
    assert da == n_up * dh and (2 * dh) % 128 == 0 and da % 128 == 0, (
        "fused_vit_segment needs 128-aligned head pairs "
        "(odd head counts: pre-pad qkv/proj with a zero fake head)"
    )
    hidden = params_list[0]["fc1"]["kernel"].shape[1]
    n_layers = len(params_list)
    n_pairs = n_up // 2
    sm_scale = dh**-0.5
    it = x.dtype.itemsize

    def vmem_bytes(bb):
        tok = bb * l
        return (4 * tok * d * it + 6 * bb * l * 4      # x io + mask bufs
                + tok * 3 * da * it
                + 2 * bb * l * l * 4
                + 2 * tok * d * 4
                + tok * (da + d) * it
                + tok * (hidden + d) * 4
                + n_layers * (d * 3 * da + da * d + 2 * d * hidden
                              + 4 * d + 4 * da + hidden + 3 * d) * it)

    bb, vmem_limit_bytes = _pick_bb(b, block_b, vmem_bytes,
                                    vmem_limit_bytes)
    grid = (b // bb,)

    mask_key = token_mask.reshape(b, 1, l)
    mask_row = token_mask.reshape(b, l, 1)
    args = [x, mask_key, mask_row]
    layer_keys = []
    for w in params_list:
        keys = ["ln1_s", "ln1_b", "qkv_k", "qkv_b", "proj_k", "proj_b",
                "ln2_s", "ln2_b", "fc1_k", "fc1_b", "fc2_k", "fc2_b"]
        args += [
            w["ln1"]["scale"].reshape(1, d), w["ln1"]["bias"].reshape(1, d),
            w["qkv"]["kernel"], w["qkv"]["bias"].reshape(1, 3 * da),
            w["proj"]["kernel"], w["proj"]["bias"].reshape(1, d),
            w["ln2"]["scale"].reshape(1, d), w["ln2"]["bias"].reshape(1, d),
            w["fc1"]["kernel"], w["fc1"]["bias"].reshape(1, hidden),
            w["fc2"]["kernel"], w["fc2"]["bias"].reshape(1, d),
        ]
        if "token_policy" in w:
            keys += ["tp_k", "tp_b"]
            args += [w["token_policy"]["kernel"],
                     w["token_policy"]["bias"].reshape(1, 2)]
        layer_keys.append(keys)

    in_specs = [_spec_for(a, k < 3, bb) for k, a in enumerate(args)]

    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)

    ln = _ln_onepass if fast_math else _ln
    gelu = _gelu_tanh if fast_math else _gelu_exact

    def kernel(x_ref, mkey_ref, mrow_ref, *rest):
        refs = list(rest[:-2])
        out_ref, mask_out_ref = rest[-2], rest[-1]
        xin = x_ref[:]
        cdt = xin.dtype
        mask_key = mkey_ref[:].astype(jnp.float32)  # (bb, 1, L)
        mask_row = mrow_ref[:].astype(jnp.float32)  # (bb, L, 1)
        pos_row = jax.lax.broadcasted_iota(jnp.int32, (bb, l, 1), 1)

        for keys in layer_keys:
            w = {k: refs.pop(0) for k in keys}
            if "tp_k" in w:
                # eval token gate at block entry (logit0 >= logit1),
                # class token pinned open; gates compose. The row
                # update slices logit lanes in place; the key layout
                # pays one (bb,L,1)->(bb,1,L) swap. Logits round to the
                # compute dtype BEFORE the bias add and compare, exactly
                # like the out-of-kernel path (`infer/fused_vit.py`
                # entry_policy: x @ k + b in x.dtype) — an f32 compare
                # could keep a different token set in bf16 serving.
                tl = (mm(xin.reshape(bb * l, d).astype(cdt),
                         w["tp_k"][:]).astype(cdt)
                      + w["tp_b"][:].astype(cdt))
                tl = tl.reshape(bb, l, 2).astype(jnp.float32)
                tm = (tl[:, :, 0:1] >= tl[:, :, 1:2]).astype(jnp.float32)
                tm = jnp.where(pos_row == 0, 1.0, tm)  # (bb, L, 1)
                mask_row = mask_row * tm
                mask_key = mask_key * jnp.swapaxes(tm, 1, 2)
            neg = (1.0 - mask_key) * NEG  # (bb, 1, L)
            rmask = mask_row              # (bb, L, 1)

            h1 = ln(xin, w["ln1_s"][0], w["ln1_b"][0], ln_eps).astype(cdt)
            qkv = (mm(h1.reshape(bb * l, d), w["qkv_k"][:])
                   + w["qkv_b"][:].astype(jnp.float32)).astype(cdt)
            qkv = qkv.reshape(bb, l, 3 * da)
            attn = _pair_attention(qkv, neg, da, dh, n_pairs, sm_scale,
                                   cdt, fast=fast_math)
            proj = (mm(attn.reshape(bb * l, da), w["proj_k"][:])
                    + w["proj_b"][:].astype(jnp.float32)).reshape(bb, l, d)
            x2 = xin.astype(jnp.float32) + proj * rmask

            h2 = ln(x2.astype(cdt), w["ln2_s"][0], w["ln2_b"][0],
                    ln_eps).astype(cdt)
            u = (mm(h2.reshape(bb * l, d), w["fc1_k"][:])
                 + w["fc1_b"][:].astype(jnp.float32))
            u = gelu(u).astype(cdt)
            y = (mm(u, w["fc2_k"][:])
                 + w["fc2_b"][:].astype(jnp.float32)).reshape(bb, l, d)
            xin = (x2 + y * rmask).astype(cdt)

        out_ref[:] = xin.astype(out_ref.dtype)
        mask_out_ref[:] = mask_key.astype(mask_out_ref.dtype)

    out, mask_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, 1, l), token_mask.dtype),
        ],
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
        interpret=interpret,
    )(*args)
    return out, mask_out.reshape(b, l)
