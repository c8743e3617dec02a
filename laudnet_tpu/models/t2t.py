"""Tokens-to-Token (T2T) stem with performer attention.

The reference's ViT family is T2T-ViT (the paper's panel (c)); its repo only
*simulates* the stem's latency (`DyNetSimulator/adavit/simulate_adavit.py:
37-74`). This is a native implementation of the published T2T-ViT
architecture: two soft-split (unfold) + token-performer stages and a final
projection, producing the 14x14 token grid the LAUD trunk gates.

The token performer is linear attention with positive random features
(exp(w^T x - |x|^2/2)); the feature matrix is a fixed (non-trainable)
Gaussian draw, matching the published design.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def t2t_stem_flops(embed_dim: int, token_dim: int = 64) -> float:
    """Analytic multiply-adds of the T2T stem (dense — never gated)."""

    def performer(l, din, d):
        m = d // 2
        return l * (3 * din * d + 2 * d * m  # kqv + q/k random features
                    + 2 * d * m + m  # kptv, qp@kptv, denom einsums
                    + d * d  # proj
                    + 2 * d * d)  # mlp

    return float(
        performer(56 * 56, 147, token_dim)
        + performer(28 * 28, 9 * token_dim, token_dim)
        + 196 * 9 * token_dim * embed_dim
    )


def unfold(x, kernel: int, stride: int, padding: int):
    """torch.nn.Unfold for NHWC: (B, H, W, C) -> (B, L, k*k*C) patches."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    out_h = (h + 2 * padding - kernel) // stride + 1
    out_w = (w + 2 * padding - kernel) // stride + 1
    patches = []
    for ki in range(kernel):
        for kj in range(kernel):
            patches.append(
                x[:, ki:ki + out_h * stride:stride,
                  kj:kj + out_w * stride:stride, :]
            )
    # torch Unfold channel order: c * k * k with channel-major; keep
    # (ki, kj, c) order — consistent within this framework.
    out = jnp.concatenate(patches, axis=-1)
    return out.reshape(b, out_h * out_w, kernel * kernel * c), (out_h, out_w)


class TokenPerformer(nn.Module):
    """Performer (linear-attention) token transformer block."""

    dim: int  # output/model dim
    kernel_ratio: float = 0.5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        d = self.dim
        m = int(d * self.kernel_ratio)

        y = nn.LayerNorm(name="norm1", param_dtype=self.param_dtype)(x)
        qkv = nn.Dense(3 * d, name="kqv", param_dtype=self.param_dtype)(y)
        k, q, v = jnp.split(qkv, 3, axis=-1)

        # Published token_performer init: orthogonal_((m, d)) * sqrt(m) —
        # orthonormal rows scaled so w^T x has variance |x|^2 * m / d.
        # (A plain normal/sqrt(m) draw makes all m features collapse to
        # ~exp(-|x|^2/2) and the linear attention near-uniform.)
        w = self.param(
            "w",
            lambda key, shape: (
                jax.random.orthogonal(key, shape[1])[: shape[0]]
                * shape[0] ** 0.5
            ),
            (m, d),
        )
        # Fixed random features: stop_gradient zeroes the gradient, and
        # train/optim.py::make_sgd masks this leaf out of weight decay
        # (torch keeps requires_grad=False params out of the optimizer).
        w = jax.lax.stop_gradient(w)

        def prm_exp(t):
            xd = (t**2).sum(-1, keepdims=True) / 2.0
            wtx = t @ w.T
            return jnp.exp(wtx - xd) / m**0.5

        kp = prm_exp(k)  # (B, L, m)
        qp = prm_exp(q)
        denom = qp @ kp.sum(axis=1)[:, :, None]  # (B, L, 1)
        kptv = jnp.einsum("bld,blm->bdm", v, kp)
        attn = jnp.einsum("blm,bdm->bld", qp, kptv) / (denom + 1e-8)
        attn = nn.Dense(d, name="proj", param_dtype=self.param_dtype)(attn)

        # residual on the value stream (T2T design: input dim may differ
        # from the model dim, so the skip rides on v)
        x = v + attn
        y = nn.LayerNorm(name="norm2", param_dtype=self.param_dtype)(x)
        h = nn.Dense(d, name="fc1", param_dtype=self.param_dtype)(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2", param_dtype=self.param_dtype)(h)
        return x + h


class T2TStem(nn.Module):
    """Two unfold+performer stages + projection -> (B, 196, embed_dim)."""

    token_dim: int = 64
    embed_dim: int = 448
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        t, _ = unfold(images, 7, 4, 2)  # (B, 56*56, 147)
        t = TokenPerformer(self.token_dim, name="attn1",
                           param_dtype=self.param_dtype)(t)
        b = t.shape[0]
        t = t.reshape(b, 56, 56, self.token_dim)
        t, _ = unfold(t, 3, 2, 1)  # (B, 28*28, 9*token_dim)
        t = TokenPerformer(self.token_dim, name="attn2",
                           param_dtype=self.param_dtype)(t)
        t = t.reshape(b, 28, 28, self.token_dim)
        t, _ = unfold(t, 3, 2, 1)  # (B, 14*14, 9*token_dim)
        return nn.Dense(self.embed_dim, name="project",
                        param_dtype=self.param_dtype)(t)


# --- conv-folded stem (serving fast path) ----------------------------------


def _folded_unfold_ln_dense(xmap, norm1, dense, k, s, pad, eps=1e-6):
    """unfold(k,s,pad) -> LayerNorm -> Dense, folded into convs.

    For a patch row u (the k*k*C unfolded vector), LayerNorm+Dense is
        ((u - mu) / sqrt(var + eps)) @ (gamma ⊙ W) + (beta @ W + b)
    with per-patch scalars mu/var. Since u @ (gamma ⊙ W) is exactly a
    conv of the raw (B,H,W,C) map with the kernel reshaped to
    (k,k,C,dout) — the unfold emits (ki,kj,c)-ordered rows — and
    mu / E[u^2] are 1-channel convs with an all-ones kernel, the
    (B, L, k*k*C) patch tensor never materializes. Bit-matched to the
    unfold path up to fp reassociation (tests)."""
    from jax import lax

    c = xmap.shape[-1]
    din = k * k * c
    gamma = norm1["scale"].astype(jnp.float32)
    beta = norm1["bias"].astype(jnp.float32)
    w = dense["kernel"].astype(jnp.float32)  # (din, dout)
    b = dense["bias"].astype(jnp.float32)
    wg = w * gamma[:, None]
    dout = w.shape[1]

    def conv(z, kern):
        return lax.conv_general_dilated(
            z, kern.astype(z.dtype), (s, s), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = conv(xmap, wg.reshape(k, k, c, dout)).astype(jnp.float32)
    # LN statistics in f32: E[u^2]-mu^2 cancels catastrophically in bf16
    # (every other LN here upcasts too, e.g. _performer_tail's norm2)
    xf = xmap.astype(jnp.float32)
    ones = jnp.ones((k, k, c, 1), jnp.float32)
    mu = conv(xf, ones) / din
    ex2 = conv(xf * xf, ones) / din
    inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
    const = beta @ w + b
    return ((y - mu * wg.sum(0)) * inv + const).astype(xmap.dtype)


def _performer_tail(p, kqv, d, kernel_ratio=0.5):
    """TokenPerformer after its kqv projection (exact re-implementation
    of `TokenPerformer.__call__` from the split on): linear attention
    with positive random features, proj, v-residual, norm2, MLP."""
    b, l, _ = kqv.shape
    m = int(d * kernel_ratio)
    k, q, v = jnp.split(kqv, 3, axis=-1)
    w = p["w"].astype(kqv.dtype)

    def prm_exp(t):
        xd = (t**2).sum(-1, keepdims=True) / 2.0
        return jnp.exp(t @ w.T - xd) / m**0.5

    kp, qp = prm_exp(k), prm_exp(q)
    denom = qp @ kp.sum(axis=1)[:, :, None]
    kptv = jnp.einsum("bld,blm->bdm", v, kp)
    attn = jnp.einsum("blm,bdm->bld", qp, kptv) / (denom + 1e-8)
    attn = attn @ p["proj"]["kernel"].astype(kqv.dtype) \
        + p["proj"]["bias"].astype(kqv.dtype)
    x = v + attn

    n2 = p["norm2"]
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)
         * n2["scale"].astype(jnp.float32)
         + n2["bias"].astype(jnp.float32)).astype(x.dtype)
    h = y @ p["fc1"]["kernel"].astype(x.dtype) + p["fc1"]["bias"].astype(
        x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["fc2"]["kernel"].astype(x.dtype) + p["fc2"]["bias"].astype(
        x.dtype)
    return x + h


def t2t_stem_conv_apply(params, images, *, embed_dim: int = 448,
                        token_dim: int = 64):
    """Conv-folded forward of :class:`T2TStem` over its param subtree
    (``variables["params"]["t2t_stem"]``) — the serving fast path used
    by `infer/fused_vit.py::build_fused_vit(stem='t2t')`.

    Equal to ``T2TStem.apply`` (same params, fp-reassociation-level
    drift) but never materializes the (B, 3136, 147) / (B, 784, 576)
    unfolded patch tensors: each unfold+LayerNorm+kqv chain runs as
    three convs on the raw map (`_folded_unfold_ln_dense`), and the
    final unfold+projection is a plain 3x3/2 conv."""
    from jax import lax

    b = images.shape[0]
    p1, p2 = params["attn1"], params["attn2"]
    t = _folded_unfold_ln_dense(images, p1["norm1"], p1["kqv"], 7, 4, 2)
    t = _performer_tail(p1, t.reshape(b, 56 * 56, 3 * token_dim), token_dim)
    t = t.reshape(b, 56, 56, token_dim)
    t = _folded_unfold_ln_dense(t, p2["norm1"], p2["kqv"], 3, 2, 1)
    t = _performer_tail(p2, t.reshape(b, 28 * 28, 3 * token_dim), token_dim)
    t = t.reshape(b, 28, 28, token_dim)
    proj = params["project"]
    out = lax.conv_general_dilated(
        t, proj["kernel"].astype(t.dtype).reshape(3, 3, token_dim,
                                                  embed_dim),
        (2, 2), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + proj["bias"].astype(t.dtype)
    return out.reshape(b, 14 * 14, embed_dim)
