"""Fused qkv-direct ViT attention kernel (`ops/pallas/vit_attention.py`,
VERDICT r2 next-step #1): numerical equivalence to the masked reference
graph, gradients, and model-level wiring (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.ops.pallas.vit_attention import (
    fused_vit_attention,
    reference_vit_attention,
)


def _case(B, L, H, dh, seed=0):
    rng = np.random.default_rng(seed)
    D = H * dh
    qkv = jnp.asarray(rng.standard_normal((B, L, 3 * D)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.3), jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # cls token always kept
    hm = jnp.asarray((rng.random((B, H)) > 0.5), jnp.float32)
    return qkv, mask, hm, dh**-0.5


@pytest.mark.parametrize("B,L,H,dh", [
    (4, 19, 4, 64),   # even heads -> strip kernel
    (2, 33, 6, 64),
    (4, 19, 7, 64),   # odd heads -> zero-padded fake head (T2T's 7)
    (4, 19, 3, 8),    # sub-pair head width -> whole-block variant
    (1, 5, 2, 64),    # tiny batch/length edge
])
def test_fused_matches_reference(B, L, H, dh):
    qkv, mask, hm, scale = _case(B, L, H, dh)
    for head_mask in (hm, None):
        ref = reference_vit_attention(qkv, mask, head_mask, H, scale)
        out = fused_vit_attention(qkv, mask, head_mask, H, scale, 2, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_fused_gradients_match_reference():
    qkv, mask, hm, scale = _case(2, 17, 4, 16)

    def f_fused(a, m, g):
        return (fused_vit_attention(a, m, g, 4, scale, 2, True) ** 2).sum()

    def f_ref(a, m, g):
        return (reference_vit_attention(a, m, g, 4, scale) ** 2).sum()

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(qkv, mask, hm)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(qkv, mask, hm)
    for a, b in zip(g1, g2):
        # the key-mask gradient flows through the -1e9 additive term, so
        # its magnitude is ~1e9 — compare relatively
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-3)


def test_key_mask_excludes_dropped_tokens():
    """A dropped key must contribute nothing: perturbing its k/v rows
    leaves every kept query's output unchanged."""
    qkv, mask, _, scale = _case(2, 11, 2, 16, seed=3)
    dropped = int(np.asarray(1 - mask[0]).nonzero()[0][0])
    out1 = fused_vit_attention(qkv, mask, None, 2, scale, 2, True)
    qkv2 = qkv.at[0, dropped, 32:].add(100.0)  # k and v sections
    out2 = fused_vit_attention(qkv2, mask, None, 2, scale, 2, True)
    np.testing.assert_allclose(
        np.asarray(out1[0, 0]), np.asarray(out2[0, 0]), atol=1e-5)


def test_model_level_fused_equals_reference():
    """LAUDViT(attn_impl='fused') is numerically equivalent to the
    reference graph for dense, gated, and token-selection serving."""
    from laudnet_tpu.models import laud_deit_tiny

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
                    jnp.float32)
    ref = laud_deit_tiny()
    v = jax.jit(lambda: ref.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                                 training=False))()
    for kw in (dict(),
               dict(token_capacity=(1.0, 0.7) + (0.5,) * 10)):
        o_ref = laud_deit_tiny(**kw).apply(v, x, 0.1, training=False)
        o_fus = laud_deit_tiny(attn_impl="fused", **kw).apply(
            v, x, 0.1, training=False)
        np.testing.assert_allclose(np.asarray(o_fus.logits),
                                   np.asarray(o_ref.logits), atol=1e-4)
        assert float(o_fus.flops) == float(o_ref.flops)


@pytest.mark.parametrize("B,L,H,dh", [
    (2, 19, 4, 64),   # even heads -> fused Pallas backward (strip)
    (2, 19, 7, 64),   # odd heads -> zero-padded fake-head backward
])
def test_fused_pallas_backward_matches_reference(B, L, H, dh):
    """The strip-geometry backward is itself a Pallas kernel
    (`_fused_bwd_strips`): dqkv / dkey_mask / dhead_mask must match the
    unfused reference vjp (which the whole-block geometries still use)."""
    qkv, mask, hm, scale = _case(B, L, H, dh, seed=11)

    for head_mask in (hm, None):
        def f_fused(a, m, g):
            out = fused_vit_attention(a, m, g, H, scale, 2, True)
            return (out.astype(jnp.float32) ** 2).sum()

        def f_ref(a, m, g):
            out = reference_vit_attention(a, m, g, H, scale)
            return (out.astype(jnp.float32) ** 2).sum()

        if head_mask is None:
            g1 = jax.grad(f_fused, argnums=(0, 1))(qkv, mask, None)
            g2 = jax.grad(f_ref, argnums=(0, 1))(qkv, mask, None)
        else:
            g1 = jax.grad(f_fused, argnums=(0, 1, 2))(qkv, mask, head_mask)
            g2 = jax.grad(f_ref, argnums=(0, 1, 2))(qkv, mask, head_mask)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=2e-3)
