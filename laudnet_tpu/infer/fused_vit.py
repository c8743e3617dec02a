"""Fully fused ViT serving engine: patchify + per-layer fused block kernel
+ token policy / top-k selection between layers.

Composes `ops/pallas/vit_block.py::fused_vit_block` (LN1 -> qkv ->
attention -> proj -> residual -> LN2 -> MLP -> residual, one kernel per
layer) with exact re-implementations of the model's eval-time token gate
and fixed-capacity selection (`models/laud_vit.py::LAUDViTBlock` — gate
`logit0 >= logit1`, class token pinned, overflow drops lowest-confidence
kept tokens). Bit-matched to ``LAUDViT.apply`` on the dense and
token-selection paths (tests); head/layer gating paradigms keep the
attention-only fusion inside the flax model instead.

Like `infer/layerskip.py`, this is a serving-only engine over the raw
variables dict — the flax param tree is the single source of truth.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from laudnet_tpu.ops.pallas.vit_block import (fused_vit_block,
                                              fused_vit_block_int8)
from laudnet_tpu.ops.quant import quantize_weight


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _patchify(p, x, dim: int, patch_size: int):
    """Patch-embed + cls-token concat + position embed (the ViT prologue
    shared by every serving engine; numerics must match
    `models/laud_vit.py::LAUDViT` eval exactly). Returns ``(x, n)`` with
    ``x`` of shape (B, n+1, dim)."""
    b = x.shape[0]
    x = lax.conv_general_dilated(
        x, p["patch_embed"]["kernel"],
        window_strides=(patch_size, patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["bias"]
    n = x.shape[1] * x.shape[2]
    x = x.reshape(b, n, dim)
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b, 1, dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(x.dtype)
    return x, n


def snap_capacity_to_tiles(k: int) -> int:
    """Latency-aware capacity snapping (measured v5e, r3): the MXU pads
    token counts to 8 sublanes in matmul rows and 128 lanes in the
    attention score tiles, so a capacity of 137 pays for 256 score
    lanes. Snap DOWN to the tile grid — floor to a multiple of 8
    always, and additionally to a multiple of 128 when that drops <10%
    of the tokens. The nominal DeiT-S 0.7/0.5 schedule (k=137/98)
    serves 13903 img/s; snapped (k=128/96) 15037 (+8%, 1.38x dense) —
    the TPU analog of the paper's hardware-aware granularity choice."""
    k8 = max(8, (k // 8) * 8)
    k128 = (k // 128) * 128
    if k128 >= 128 and (k8 - k128) / k8 < 0.10:
        return k128
    return k8


def _pad_fake_head(blk, dim: int, num_heads: int):
    """Zero-pad one fake head into a block's qkv/proj params so the
    128-aligned pair kernel applies to odd head counts (T2T's 7): qkv
    gains dh all-zero output columns per q/k/v section, proj gains dh
    all-zero input rows. The fake head's q/k/v are exactly zero, its
    attention output is zero, and the zero proj rows discard it —
    bit-exact (`ops/pallas/vit_block.py::fused_vit_block`)."""
    dh = dim // num_heads
    qk = blk["qkv"]["kernel"].reshape(dim, 3, num_heads, dh)
    qk = jnp.pad(qk, ((0, 0), (0, 0), (0, 1), (0, 0)))
    qb = blk["qkv"]["bias"].reshape(3, num_heads, dh)
    qb = jnp.pad(qb, ((0, 0), (0, 1), (0, 0)))
    out = dict(blk)
    out["qkv"] = {"kernel": qk.reshape(dim, 3 * (num_heads + 1) * dh),
                  "bias": qb.reshape(3 * (num_heads + 1) * dh)}
    out["proj"] = {"kernel": jnp.pad(blk["proj"]["kernel"],
                                     ((0, dh), (0, 0))),
                   "bias": blk["proj"]["bias"]}
    return out


def build_fused_vit(variables, *, depth: int, dim: int, num_heads: int,
                    patch_size: int = 16,
                    stem: str = "patch",
                    token_capacity: Optional[Sequence[float]] = None,
                    snap_capacities: bool = False,
                    head_gating: bool = False,
                    int8: bool = False,
                    segments: bool = True,
                    block_b: int = 1,
                    vmem_limit_bytes: Optional[int] = None,
                    fast_math: bool = True,
                    interpret: bool = False):
    """Returns ``forward(x) -> logits`` running every transformer layer as
    one fused kernel. ``token_capacity`` enables the selection path (the
    variables must carry ``token_policy`` heads). ``fast_math``
    (default ON — this is the serving engine) runs the bf16 kernels with
    deferred softmax normalization (exact math, fp reordering only),
    one-pass LayerNorm, and tanh GELU (max abs deviation 3e-4 vs erf):
    measured -1.5 us/img/layer of the ~7 us DeiT-S bs128 block on v5e
    (`tools/probe_block_budget.py`), end-to-end deviation one bf16 ulp
    on the residual stream (pinned by
    `tests/test_fused_vit_block.py::test_fast_math_*`). Pass False for
    the exact kernels (the test oracle). The kernel runs
    batch-block 1 (measured v5e optimum on every geometry swept) and
    auto-raises Mosaic's scoped-VMEM limit for weights-dominated
    geometries (DeiT-B: ~14.2MB bf16/layer); ``vmem_limit_bytes``
    overrides that explicitly. ``snap_capacities`` floors each layer's
    token capacity onto the MXU tile grid (`snap_capacity_to_tiles`) —
    a slightly stricter keep budget in exchange for measurably faster
    tiles (+8% on the DeiT-S schedule); off by default because it
    changes which tokens are kept. ``head_gating`` applies the model's
    eval-time per-head gates (``head_policy`` on the class token,
    ``on >= off`` — `models/laud_vit.py` head_skip) inside the kernel
    via lane-expanded multiplies, so head-gated models can serve the
    block engine too. ``int8`` serves the W8A8 variant
    (`fused_vit_block_int8`): the four weight matmuls run s8 MXU (2x
    bf16 peak) with per-channel weight scales quantized here at build
    time and per-token dynamic activation scales on-chip; INEXACT
    (quantization error) — callers opt in and should report agreement
    vs the bf16 engine (`bench.py --int8` prints it).

    ``stem='t2t'`` runs the tokens-to-token performer stem
    (`models/t2t.py::T2TStem`, params under ``t2t_stem``) as the token
    prologue instead of conv patchify — the full T2T-ViT serving path.
    Odd ``num_heads`` (T2T's 7) are handled by padding a zero fake head
    into each block's qkv/proj at build time (`_pad_fake_head`).

    ``segments`` (default on; engages only on bf16 token-selection
    paths): consecutive layers between token-selection gather points
    share ONE kernel (`fused_vit_segment`) — the segment's weights stay
    VMEM-resident across the batch grid, x makes one HBM round trip per
    segment instead of per layer, and per-layer token gates compose
    in-kernel. Measured v5e: +2.0% on the snapped DeiT-S schedule
    (natural 3/4/5-layer segments, 15294 vs 15003 img/s) but a LOSS on
    dense paths (0.90x DeiT-S / 0.92x DeiT-B with long segments —
    VMEM-resident weights crowd out pipelining), so dense serving keeps
    one kernel per layer regardless of this flag. Segments are capped
    at 5 layers (the measured sweet spot; sweep in
    `tools/probe_segments.py --sweep`) and split so resident weights
    stay under ~72MB. Bit-equal to the per-block path (tests); pass an
    int to cap segment length explicitly, False for strictly per-block
    kernels."""
    params = variables["params"]
    odd = num_heads % 2 == 1
    blocks = []
    for i in range(depth):
        blk = params[f"block_{i}"]
        bp = {"norm1": blk["norm1"], "norm2": blk["norm2"],
              "qkv": blk["qkv"], "proj": blk["proj"],
              "fc1": blk["fc1"], "fc2": blk["fc2"]}
        blocks.append(_pad_fake_head(bp, dim, num_heads) if odd else bp)
    qblocks = None
    if int8:
        qblocks = []
        for blk in blocks:
            qb = {"ln1": blk["norm1"], "ln2": blk["norm2"]}
            for name in ("qkv", "proj", "fc1", "fc2"):
                kq, ks = quantize_weight(blk[name]["kernel"])
                qb[name] = {"kernel_q": kq, "scale": ks,
                            "bias": blk[name]["bias"]}
            qblocks.append(qb)

    if stem == "t2t":
        from laudnet_tpu.models.t2t import t2t_stem_conv_apply

    # Default True engages only on selection paths (dense measured
    # slower under segments); an explicit int engages everywhere (the
    # probe/sweep escape hatch).
    seg_ok = (bool(segments) and not head_gating and qblocks is None
              and depth > 0
              and (token_capacity is not None or segments is not True))
    if seg_ok:
        from laudnet_tpu.ops.pallas.vit_block import fused_vit_segment

        dh0 = dim // num_heads
        da = (num_heads + num_heads % 2) * dh0
        hidden = params["block_0"]["fc1"]["kernel"].shape[1]
        itb = jnp.dtype(params["block_0"]["qkv"]["kernel"].dtype).itemsize
        wl_bytes = itb * (dim * 3 * da + da * dim + 2 * dim * hidden)
        n_max = max(1, min(5, int((72 * 2**20) // max(wl_bytes, 1))))
        if segments is not True:  # an int caps layers per segment
            n_max = min(n_max, max(1, int(segments)))

    def forward(x):
        p = params
        b = x.shape[0]
        if stem == "t2t":
            # conv-folded performer stem (`models/t2t.py::
            # t2t_stem_conv_apply` — unfold+LN+kqv as convs, the patch
            # tensors never materialize), then the cls/pos prologue
            # shared with the patch path
            t = t2t_stem_conv_apply(p["t2t_stem"], x, embed_dim=dim)
            n = t.shape[1]
            cls = jnp.broadcast_to(p["cls_token"].astype(t.dtype),
                                   (b, 1, dim))
            x = (jnp.concatenate([cls, t], axis=1)
                 + p["pos_embed"].astype(t.dtype))
        else:
            x, n = _patchify(p, x, dim, patch_size)

        token_mask = jnp.ones((b, n + 1), jnp.float32)
        cur = n + 1

        def entry_policy(i, x, token_mask, cur):
            """Layer ``i``'s eval token gate + optional fixed-capacity
            gather, applied at block entry (outside the kernels — the
            gather needs top_k and the confidence scores)."""
            blk = p[f"block_{i}"]
            if token_capacity is None or "token_policy" not in blk:
                return x, token_mask, cur
            tl = (x @ blk["token_policy"]["kernel"].astype(x.dtype)
                  + blk["token_policy"]["bias"].astype(x.dtype))
            tmask = (tl[..., 0] >= tl[..., 1]).astype(jnp.float32)
            tmask = tmask.at[:, 0].set(1.0)
            token_mask = token_mask * tmask
            score = (tl[..., 0] - tl[..., 1]).astype(jnp.float32)
            k = min(max(2, int(token_capacity[i] * (n + 1))), cur)
            if snap_capacities and k < cur:
                k = min(max(2, snap_capacity_to_tiles(k)), cur)
            if k < cur:
                # rank kept above dropped; break ties by confidence;
                # pin the class token (`laud_vit.py` selection)
                conf = jax.nn.sigmoid(score)
                rank = token_mask * 2.0 + conf
                rank = rank.at[:, 0].add(4.0)
                _, idx = lax.top_k(rank, k)
                bidx = jnp.arange(b)[:, None]
                x = x[bidx, idx]
                token_mask = token_mask[bidx, idx]
                cur = k
            return x, token_mask, cur

        def gathers_at(t, cur):
            if token_capacity is None or (
                    "token_policy" not in p[f"block_{t}"]):
                return False
            k = min(max(2, int(token_capacity[t] * (n + 1))), cur)
            if snap_capacities and k < cur:
                k = min(max(2, snap_capacity_to_tiles(k)), cur)
            return k < cur

        if seg_ok:
            i = 0
            while i < depth:
                x, token_mask, cur = entry_policy(i, x, token_mask, cur)
                j = i + 1
                while (j < depth and (j - i) < n_max
                       and not gathers_at(j, cur)):
                    j += 1
                plist = []
                for t in range(i, j):
                    pb = blocks[t]
                    d_ = {"ln1": pb["norm1"], "qkv": pb["qkv"],
                          "proj": pb["proj"], "ln2": pb["norm2"],
                          "fc1": pb["fc1"], "fc2": pb["fc2"]}
                    if (t > i and token_capacity is not None
                            and "token_policy" in p[f"block_{t}"]):
                        d_["token_policy"] = p[f"block_{t}"]["token_policy"]
                    plist.append(d_)
                x, token_mask = fused_vit_segment(
                    x, token_mask, plist, num_heads=num_heads,
                    block_b=block_b, vmem_limit_bytes=vmem_limit_bytes,
                    fast_math=fast_math, interpret=interpret)
                i = j
            x = _ln(x, p["norm"])
            return (x[:, 0] @ p["head"]["kernel"].astype(x.dtype)
                    + p["head"]["bias"].astype(x.dtype))

        for i in range(depth):
            blk = p[f"block_{i}"]
            x, token_mask, cur = entry_policy(i, x, token_mask, cur)
            hg = None
            if head_gating and "head_policy" in blk:
                # eval head gate on the class token (selection pins cls
                # at index 0, so x[:, 0] is the block-entry cls either
                # way); lane-expand so each head's dh lanes carry it
                hl = (x[:, 0] @ blk["head_policy"]["kernel"].astype(
                    x.dtype)
                    + blk["head_policy"]["bias"].astype(x.dtype))
                hl = hl.reshape(b, 2, num_heads)
                hmask = (hl[:, 0] >= hl[:, 1]).astype(jnp.float32)
                if odd:  # fake head: gate value irrelevant (attn is 0)
                    hmask = jnp.pad(hmask, ((0, 0), (0, 1)),
                                    constant_values=1.0)
                dh = dim // num_heads
                hg = jnp.repeat(hmask, dh, axis=-1).reshape(
                    b, 1, hmask.shape[-1] * dh)
            if qblocks is not None:
                x = fused_vit_block_int8(
                    x, token_mask.reshape(b, 1, cur),
                    token_mask.reshape(b, cur, 1), qblocks[i],
                    num_heads=num_heads, head_gate=hg, block_b=block_b,
                    vmem_limit_bytes=vmem_limit_bytes, interpret=interpret,
                )
            else:
                pb = blocks[i]
                bp = {"ln1": pb["norm1"], "qkv": pb["qkv"],
                      "proj": pb["proj"], "ln2": pb["norm2"],
                      "fc1": pb["fc1"], "fc2": pb["fc2"]}
                x = fused_vit_block(
                    x, token_mask.reshape(b, 1, cur),
                    token_mask.reshape(b, cur, 1), bp, num_heads=num_heads,
                    head_gate=hg,
                    block_b=block_b, vmem_limit_bytes=vmem_limit_bytes,
                    fast_math=fast_math, interpret=interpret,
                )
        x = _ln(x, p["norm"])
        return (x[:, 0] @ p["head"]["kernel"].astype(x.dtype)
                + p["head"]["bias"].astype(x.dtype))

    return forward
