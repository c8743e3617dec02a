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
        return l * (3 * din * d + 2 * d * m + 2 * l * 0  # qkv + features
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

        w = self.param(
            "w", lambda key, shape: jax.random.normal(key, shape) / m**0.5,
            (m, d),
        )
        w = jax.lax.stop_gradient(w)  # fixed random features

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
