"""LAUD-ViT: vision transformer with token / head / block (layer) skipping.

The reference repo only *simulates* its ViT paradigms (README points to the
external AdaViT repo for training; `DyNetSimulator/adavit/simulate_adavit.py`
has the latency model). This module is a native, TPU-first implementation of
the three paradigms on a DeiT-style backbone:

* **token skipping** — a per-token binary gate; masked tokens are excluded
  from attention via additive key masking and contribute nothing to the
  residual stream. Shapes stay static (the mask is dense 0/1); the
  fixed-capacity top-k *selection* path is the serving-time optimization.
* **head skipping** — a per-head binary gate multiplying each head's output
  (equivalently: gathered qkv/proj rows at serving time).
* **block skipping** — per-sample gates on the attention and MLP residual
  branches (AdaViT's layer policy).

All gates are Gumbel-ST trained / argmax eval, reusing
:mod:`laudnet_tpu.ops.gating`. The policy heads follow AdaViT: one shared
linear on the class token emits layer+head logits; a per-token linear emits
token logits. FLOPs bookkeeping mirrors the simulator's cost model
(`simulate_adavit.py:77-147`) so the same sparsity losses apply.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from laudnet_tpu.ops import gating


@flax.struct.dataclass
class ViTBlockStats:
    token_density: jnp.ndarray
    head_density: jnp.ndarray
    attn_density: jnp.ndarray  # layer gate on the attention branch
    mlp_density: jnp.ndarray  # layer gate on the MLP branch
    flops_perc: jnp.ndarray
    sparse_flops: jnp.ndarray
    token_keep: Any = None  # (B,) per-image kept-token fraction
    token_score: Any = None  # (B, L) token-gate logit margin (keep - skip)


@flax.struct.dataclass
class LAUDViTOutput:
    logits: jnp.ndarray
    token_density: jnp.ndarray  # (depth,)
    head_density: jnp.ndarray
    attn_density: jnp.ndarray
    mlp_density: jnp.ndarray
    flops_perc: jnp.ndarray  # (depth,)
    flops: jnp.ndarray
    # (depth, B) per-image kept-token fractions. Capacity calibration
    # quantiles over these — batch means hide the per-image tail.
    token_keep: Any = None


def vit_block_bookkeeping(tok, hd, ak, mk, *, l_book: int, d: int, h: int,
                          hidden: int, policy_flops: float):
    """The block FLOPs model (simulator cost frame,
    `DyNetSimulator/adavit/simulate_adavit.py:77-147`) as a standalone
    function of the four densities: returns ``(sparse, dense)``
    multiply-adds. Shared by the in-block bookkeeping and the
    pipeline-parallel path (`parallel/pp_train.py`), which recomputes it
    from globally averaged densities so pp and dp report identical
    flops_perc."""
    dh = d // h
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    one = f32(1.0)

    def block_flops(tok, hd, ak, mk):
        qkv_f = 3 * l_book * d * d * hd
        attn_f = 2 * h * (l_book * tok) ** 2 * dh * hd
        proj_f = (l_book * tok) * d * d * hd * hd
        mlp_f = (l_book * tok) * d * hidden * (hd + 1.0)
        return ak * (qkv_f + attn_f + proj_f) + mk * mlp_f

    sparse = f32(policy_flops) + block_flops(f32(tok), f32(hd), f32(ak),
                                             f32(mk))
    dense = f32(policy_flops) + block_flops(one, one, one, one)
    return sparse, dense


def vit_policy_flops(l_book: int, d: int, h: int, *, token_skip: bool,
                     head_skip: bool, layer_skip: bool) -> float:
    """Multiply-adds of the AdaViT policy heads a block runs (matches the
    in-block ``policy_flops`` accumulation)."""
    flops = 0
    if layer_skip:
        flops += d * 4
    if head_skip:
        flops += d * 2 * h
    if token_skip:
        flops += l_book * d * 2
    return flops


class LAUDViTBlock(nn.Module):
    """Transformer block with the three gating paradigms."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    token_skip: bool = True
    head_skip: bool = True
    layer_skip: bool = True
    # Serving-time token selection: static keep count applied right after
    # the token gate, BEFORE this block's attention/MLP — the gate is
    # computed at block entry, so gathering here is exactly equivalent to
    # the masked graph whenever capacity covers the realized keep count,
    # and this block's own matmuls already run at the reduced length.
    capacity: Any = None
    # FLOPs-bookkeeping length: the ORIGINAL token count (N+1), so reported
    # FLOPs stay in the masked-graph frame even after earlier blocks have
    # gathered the buffer down (None -> the incoming buffer length).
    book_len: Any = None
    # 'reference' = unfused masked attention (HBM-materialized scores);
    # 'fused' = the qkv-direct Pallas kernel
    # (`ops/pallas/vit_attention.py`) — same semantics, one VMEM pass.
    attn_impl: str = "reference"
    # Tensor-parallel mesh: when set (a jax.sharding.Mesh with a >1
    # 'model' axis) and attn_impl == 'fused', attention runs the
    # partition-aware shard_map path (`parallel/tp.py::
    # tp_fused_vit_attention`) — each shard executes the Pallas kernel
    # on its local heads. Requires num_heads % tp == 0.
    tp_mesh: Any = None
    # 'dense' = bf16/f32 matmuls; 'int8' = W8A8 qkv/proj/fc1/fc2 at EVAL
    # (`ops/quant.py::QuantDense`, checkpoint-compatible params) — the
    # int8 serving path for geometries the fused block kernel cannot
    # take (odd heads: T2T's 7). Training always runs dense math.
    linear_impl: str = "dense"
    param_dtype: Any = jnp.float32
    # AMP compute dtype for the body matmuls/norms (None = exact f32).
    # Policy heads always promote to f32 (their params stay f32 and no
    # dtype is passed), so gate decisions are f32 under AMP; softmax in
    # the unfused attention path is explicitly f32 either way.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, token_mask, temperature, *, training: bool):
        b, l, d = x.shape
        l_book = self.book_len or l  # masked-graph bookkeeping length
        h = self.num_heads
        dh = d // h
        hidden = int(d * self.mlp_ratio)
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        one = f32(1.0)

        key = lambda: self.make_rng("gumbel") if training else None
        cls = x[:, 0]

        # Policy biases initialize gates OPEN (keep-logit +2, skip-logit
        # -2) so a fresh model starts dense and the sparsity loss anneals
        # it down — the reference maskers' init philosophy
        # (`models/utils.py:107-111`: bias[:g]=2.0, bias[g+1:]=-2.0).
        def open_bias(split):
            def init(key, shape, dtype=jnp.float32):
                b = jnp.full(shape, -2.0, dtype)
                return b.at[:split].set(2.0)

            return init

        # --- policy heads (AdaViT: linear heads on the class token) -----
        attn_keep = mlp_keep = one
        attn_gate = mlp_gate = None
        policy_flops = 0
        if self.layer_skip:
            logits = nn.Dense(4, name="layer_policy",
                              bias_init=open_bias(2),
                              param_dtype=self.param_dtype)(cls)
            pair = logits.reshape(b, 2, 2)  # (B, on/off, [attn, mlp])
            gate = gating.binary_gate(pair, temperature, training=training,
                                      key=key())
            attn_gate, mlp_gate = gate[:, 0], gate[:, 1]
            attn_keep, mlp_keep = attn_gate.mean(), mlp_gate.mean()
            policy_flops += d * 4

        head_mask = None
        head_density = one
        if self.head_skip:
            hlogits = nn.Dense(2 * h, name="head_policy",
                               bias_init=open_bias(h),
                               param_dtype=self.param_dtype)(cls)
            head_mask = gating.binary_gate(
                hlogits.reshape(b, 2, h), temperature, training=training,
                key=key(),
            )  # (B, H)
            head_density = head_mask.mean()
            policy_flops += d * 2 * h

        token_score = jnp.zeros((b, l), jnp.float32)
        if self.token_skip:
            tlogits = nn.Dense(2, name="token_policy",
                               bias_init=open_bias(1),
                               param_dtype=self.param_dtype)(x)
            tmask = gating.binary_gate(
                tlogits.reshape(b, l, 2, 1), temperature, training=training,
                key=key(),
            )[..., 0]  # (B, L)
            # class token always kept; gates compose across depth
            tmask = tmask.at[:, 0].set(1.0)
            token_mask = token_mask * tmask
            token_score = (tlogits[..., 0] - tlogits[..., 1]).astype(
                jnp.float32
            )
            policy_flops += l_book * d * 2
        # Bookkeeping frame: full length for the dense-shape terms (qkv,
        # policy), kept-token COUNT for the gated terms. token_density is a
        # fraction of the current buffer; rescale it to the full length so
        # l_book * density == kept count regardless of earlier gathers
        # (zombie slots removed by selection are gate-0 either way).
        token_density = token_mask.mean() * (l / l_book)
        token_keep = token_mask.mean(axis=1) * (l / l_book)

        if (self.capacity is not None and not training
                and self.capacity < l):
            # Rank kept (mask 1) strictly above dropped tokens; break ties
            # among kept tokens by gate confidence so budget overflow drops
            # the least-confident tokens, and pin the class token.
            conf = jax.nn.sigmoid(token_score)
            rank = token_mask.astype(jnp.float32) * 2.0 + conf
            rank = rank.at[:, 0].add(4.0)
            _, idx = jax.lax.top_k(rank, self.capacity)
            bidx = jnp.arange(b)[:, None]
            x = x[bidx, idx]
            token_mask = token_mask[bidx, idx]
            token_score = token_score[bidx, idx]
            l = self.capacity

        # body matmuls: nn.Dense, the checkpoint-compatible W8A8
        # QuantDense at eval ('int8'), or its fake-quant QAT variant in
        # training ('int8_qat': straight-through int8 numerics in the
        # train graph, real s8 at eval). Policy heads / norms stay float.
        if (self.linear_impl == "int8" and not training) or (
                self.linear_impl == "int8_qat"):
            from laudnet_tpu.ops.quant import QuantDense

            fake = self.linear_impl == "int8_qat" and training
            mk_dense = lambda f, name: QuantDense(
                f, name=name, fake=fake, param_dtype=self.param_dtype)
        else:
            mk_dense = lambda f, name: nn.Dense(
                f, name=name, dtype=self.dtype,
                param_dtype=self.param_dtype)

        # --- attention branch -------------------------------------------
        y = nn.LayerNorm(name="norm1", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        qkv = mk_dense(3 * d, "qkv")(y)
        scale = dh**-0.5
        if self.attn_impl == "fused":
            tp = (self.tp_mesh.shape.get("model", 1)
                  if self.tp_mesh is not None else 1)
            interp = jax.default_backend() != "tpu"  # interpret off-TPU
            if tp > 1:
                from laudnet_tpu.parallel.tp import tp_fused_vit_attention

                out = tp_fused_vit_attention(
                    qkv, token_mask.astype(jnp.float32),
                    None if head_mask is None
                    else head_mask.astype(jnp.float32),
                    h, scale, self.tp_mesh, block_b=8, interpret=interp,
                )
            else:
                from laudnet_tpu.ops.pallas.vit_attention import (
                    fused_vit_attention,
                )

                out = fused_vit_attention(
                    qkv, token_mask.astype(jnp.float32),
                    None if head_mask is None
                    else head_mask.astype(jnp.float32),
                    h, scale, 8, interp,
                )
        else:
            qkv = qkv.reshape(b, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, L, dh)

            attn = (q @ k.transpose(0, 1, 3, 2)) * scale  # (B, H, L, L)
            # exclude skipped tokens as keys; f32 scores/softmax always
            # (no-op at f32; under AMP this is the standard stable path
            # and matches the fused kernel's in-VMEM f32 softmax).
            # stop_gradient: the additive mask is a structural "remove
            # key" op — without it, dL/d(gate) picks up a term scaled by
            # the arbitrary -1e9 constant (~1e13 policy grads at init,
            # measured) and the gate heads explode within a few steps.
            # Gate gradients flow through the multiplicative out/MLP
            # masking below, which is the ST estimator's intended path.
            attn = attn.astype(jnp.float32)
            attn = attn + jax.lax.stop_gradient(
                (1.0 - token_mask.astype(jnp.float32))[:, None, None, :]
                * -1e9)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = attn @ v  # (B, H, L, dh)
            if head_mask is not None:
                out = out * head_mask.astype(out.dtype)[:, :, None, None]
            out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        out = mk_dense(d, "proj")(out)
        # gates are f32; cast at application so the residual stream keeps
        # the compute dtype (no-op at f32)
        out = out * token_mask.astype(out.dtype)[:, :, None]
        if attn_gate is not None:
            out = out * attn_gate.astype(out.dtype)[:, None, None]
        x = x + out

        # --- MLP branch ----------------------------------------------------
        y = nn.LayerNorm(name="norm2", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        y = mk_dense(hidden, "fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = mk_dense(d, "fc2")(y)
        y = y * token_mask.astype(y.dtype)[:, :, None]
        if mlp_gate is not None:
            y = y * mlp_gate.astype(y.dtype)[:, None, None]
        x = x + y

        # --- FLOPs bookkeeping (simulator cost model) ----------------------
        # Accounted at the masked-graph length l_book (token_density is
        # rescaled to the same frame above), so capacity selection never
        # changes reported FLOPs: dense-shape terms use l_book and gated
        # terms use the kept-token count l_book * tok. Formula shared with
        # the pipeline-parallel path via vit_block_bookkeeping.
        sparse, dense = vit_block_bookkeeping(
            token_density, head_density, attn_keep, mlp_keep,
            l_book=l_book, d=d, h=h, hidden=hidden,
            policy_flops=policy_flops,
        )

        stats = ViTBlockStats(
            token_density=token_density,
            head_density=head_density,
            attn_density=attn_keep,
            mlp_density=mlp_keep,
            flops_perc=sparse / dense,
            sparse_flops=sparse,
            token_keep=token_keep,
            token_score=token_score,
        )
        return x, token_mask, stats


class LAUDViT(nn.Module):
    """DeiT-style LAUD-ViT (token/head/block skipping).

    ``token_capacity`` (eval-only) enables the *token-selection serving
    path*: right after block ``i``'s token gate fires (at block entry),
    surviving tokens are gathered down to a fixed budget
    ``int(capacity[i] * L)`` so block ``i``'s own attention/MLP and every
    downstream matmul run at the reduced length — the static-shape
    realization of AdaViT's token pruning
    (`DyNetSimulator/adavit/simulate_adavit.py:108` uses the same
    ``L_select = int(L * density)``). Once a token's gate closes it never
    re-enters attention (gates compose), so dropping it is exactly
    equivalent to the masked graph whenever the budget covers the realized
    keep-count; on overflow, kept tokens are dropped lowest-gate-confidence
    first (the class token always survives).
    """

    depth: int = 12
    dim: int = 384
    num_heads: int = 6
    mlp_ratio: float = 4.0
    patch_size: int = 16
    num_classes: int = 1000
    token_skip: bool = True
    head_skip: bool = True
    layer_skip: bool = True
    token_capacity: Any = None  # optional per-block keep fractions (eval)
    stem: str = "patch"  # 'patch' (conv patchify) | 't2t' (tokens-to-token)
    # 'reference' (unfused masked attention) | 'fused' (the qkv-direct
    # Pallas kernel, `ops/pallas/vit_attention.py`) — numerically
    # equivalent; fused is the TPU serving path
    attn_impl: str = "reference"
    # 'dense' | 'int8' | 'int8_qat': W8A8 body matmuls at eval
    # (`ops/quant.py`), checkpoint-compatible — the int8 path for
    # fused-attention-only geometries (T2T's odd heads); INEXACT,
    # validate accuracy. 'int8_qat' additionally fake-quantizes in
    # TRAINING (straight-through gradients) so fine-tuning optimizes
    # under the serving path's int8 numerics.
    linear_impl: str = "dense"
    # Tensor-parallel mesh for the fused attention path (see
    # LAUDViTBlock.tp_mesh); propagated to every block.
    tp_mesh: Any = None
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (see LAUDViTBlock.dtype)

    @nn.compact
    def __call__(self, x, temperature, *, training: bool = False):
        b, hh, ww, c = x.shape
        if self.stem == "t2t":
            from laudnet_tpu.models.t2t import T2TStem, t2t_stem_flops

            x = T2TStem(embed_dim=self.dim, name="t2t_stem",
                        param_dtype=self.param_dtype)(x)
            n = x.shape[1]
            flops = jnp.asarray(t2t_stem_flops(self.dim), jnp.float32)
        else:
            x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                        strides=self.patch_size, name="patch_embed",
                        dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)
            n = x.shape[1] * x.shape[2]
            x = x.reshape(b, n, self.dim)
            flops = jnp.asarray(
                c * self.dim * self.patch_size**2 * n, jnp.float32
            )

        cls = self.param(
            "cls_token", jax.nn.initializers.truncated_normal(0.02),
            (1, 1, self.dim), self.param_dtype,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1)
        pos = self.param(
            "pos_embed", jax.nn.initializers.truncated_normal(0.02),
            (1, n + 1, self.dim), self.param_dtype,
        )
        x = x + pos
        if self.dtype is not None:
            # cls/pos params are f32 masters; re-enter the compute dtype
            # so the residual stream stays AMP-typed
            x = x.astype(self.dtype)

        token_mask = jnp.ones((b, n + 1), jnp.float32)
        select = self.token_capacity is not None and not training
        stats_all = []
        cur_len = n + 1
        for i in range(self.depth):
            cap = None
            if select:
                # AdaViT's L_select = int(L * density) truncation; applied
                # inside the block, before its attention (see LAUDViTBlock)
                k = min(max(2, int(self.token_capacity[i] * (n + 1))),
                        cur_len)
                if k < cur_len:
                    cap = k
                    cur_len = k
            x, token_mask, st = LAUDViTBlock(
                dim=self.dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, token_skip=self.token_skip,
                head_skip=self.head_skip, layer_skip=self.layer_skip,
                capacity=cap, book_len=n + 1, attn_impl=self.attn_impl,
                linear_impl=self.linear_impl, tp_mesh=self.tp_mesh,
                name=f"block_{i}", dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, token_mask, temperature, training=training)
            stats_all.append(st)
            flops += st.sparse_flops

        x = nn.LayerNorm(name="norm", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        logits = nn.Dense(self.num_classes, name="head",
                          dtype=self.dtype,
                          param_dtype=self.param_dtype)(x[:, 0])
        flops += self.dim * self.num_classes

        stack = lambda f: jnp.stack([f(s) for s in stats_all])
        return LAUDViTOutput(
            logits=logits,
            token_density=stack(lambda s: s.token_density),
            head_density=stack(lambda s: s.head_density),
            attn_density=stack(lambda s: s.attn_density),
            mlp_density=stack(lambda s: s.mlp_density),
            flops_perc=stack(lambda s: s.flops_perc),
            flops=flops,
            token_keep=stack(lambda s: s.token_keep),
        )


def vit_dense_flops(model: LAUDViT, input_size: int = 224,
                    in_chans: int = 3) -> float:
    """Closed-form dense multiply-adds of a :class:`LAUDViT`, matching the
    in-graph bookkeeping with all gates open (``block_flops(1,1,1,1)`` +
    policy heads + stem + classifier). This is the ``full_flops`` the
    sparsity losses target (reference measures the dense teacher the same
    way, `train/main.py:297`)."""
    d, h = model.dim, model.num_heads
    dh = d // h
    hidden = int(d * model.mlp_ratio)
    if model.stem == "t2t":
        from laudnet_tpu.models.t2t import t2t_stem_flops

        stem = float(t2t_stem_flops(d))
        n = (input_size // 16) ** 2  # T2T stem reduces 4*2*2 = 16x
    else:
        n = (input_size // model.patch_size) ** 2
        stem = float(in_chans * d * model.patch_size**2 * n)
    l = n + 1
    policy = 0
    if model.layer_skip:
        policy += d * 4
    if model.head_skip:
        policy += d * 2 * h
    if model.token_skip:
        policy += l * d * 2
    block = (
        policy
        + 3 * l * d * d  # qkv
        + 2 * h * l * l * dh  # attention scores + weighted values
        + l * d * d  # output projection
        + 2 * l * d * hidden  # mlp fc1 + fc2
    )
    return stem + model.depth * block + d * model.num_classes


def laud_deit_small(**kwargs) -> LAUDViT:
    """LAUD-DeiT-S: 12 blocks, dim 384, 6 heads (BASELINE config #4)."""
    return LAUDViT(depth=12, dim=384, num_heads=6, mlp_ratio=4.0, **kwargs)


def laud_deit_tiny(**kwargs) -> LAUDViT:
    return LAUDViT(depth=12, dim=192, num_heads=3, mlp_ratio=4.0, **kwargs)


def laud_deit_base(**kwargs) -> LAUDViT:
    return LAUDViT(depth=12, dim=768, num_heads=12, mlp_ratio=4.0, **kwargs)


def laud_t2t_vit_19_backbone(**kwargs) -> LAUDViT:
    """The T2T-ViT-19 transformer trunk geometry (dim 448, 7 heads, 14
    blocks, mlp ratio 3) with the LAUD paradigms; the tokens-to-token stem is
    approximated by the conv patchifier (the paradigms and costs live in the
    trunk, which is what LAUDNet gates)."""
    return LAUDViT(depth=14, dim=448, num_heads=7, mlp_ratio=3.0, **kwargs)


def laud_t2t_vit_19(**kwargs) -> LAUDViT:
    """Full LAUD-T2T-ViT-19: tokens-to-token performer stem + gated trunk
    (panel (c) of the paper; stem simulated at
    `DyNetSimulator/adavit/simulate_adavit.py:58-74`)."""
    return LAUDViT(depth=14, dim=448, num_heads=7, mlp_ratio=3.0,
                   stem="t2t", **kwargs)
