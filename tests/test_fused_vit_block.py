"""Fully fused transformer-block kernel + serving engine
(`ops/pallas/vit_block.py`, `infer/fused_vit.py`): bit-equivalence to the
flax model on the dense and token-selection paths (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.infer.fused_vit import build_fused_vit
from laudnet_tpu.models.laud_vit import LAUDViT
from laudnet_tpu.ops.pallas.vit_block import fused_vit_block

GEOM = dict(depth=2, dim=256, num_heads=4, mlp_ratio=2.0, num_classes=11)


def _x(b=2, s=64, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, s, s, 3)),
        jnp.float32)


def test_block_kernel_matches_reference_ops():
    """The kernel's LN/attention/MLP pipeline equals the composed jnp ops
    (with a ragged token mask)."""
    rng = np.random.default_rng(0)
    b, l, d, h = 2, 19, 256, 4
    hidden = 512
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = jnp.asarray((rng.random((b, l)) > 0.3), jnp.float32)
    mask = mask.at[:, 0].set(1.0)

    def mkd(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    params = {
        "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "ln2": {"scale": mkd((d,)) + 1.0, "bias": mkd((d,))},
        "qkv": {"kernel": mkd((d, 3 * d)), "bias": mkd((3 * d,))},
        "proj": {"kernel": mkd((d, d)), "bias": mkd((d,))},
        "fc1": {"kernel": mkd((d, hidden)), "bias": mkd((hidden,))},
        "fc2": {"kernel": mkd((hidden, d)), "bias": mkd((d,))},
    }

    def ln(y, p):
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return (y - mu) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]

    def reference(x):
        h1 = ln(x, params["ln1"])
        qkv = h1 @ params["qkv"]["kernel"] + params["qkv"]["bias"]
        qh = qkv.reshape(b, l, 3, h, d // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qh[0], qh[1], qh[2]
        s = (q @ k.transpose(0, 1, 3, 2)) * (d // h) ** -0.5
        s = s + (1.0 - mask)[:, None, None, :] * -1e9
        o = (jax.nn.softmax(s, -1) @ v).transpose(0, 2, 1, 3).reshape(
            b, l, d)
        proj = o @ params["proj"]["kernel"] + params["proj"]["bias"]
        x2 = x + proj * mask[:, :, None]
        h2 = ln(x2, params["ln2"])
        u = jax.nn.gelu(h2 @ params["fc1"]["kernel"]
                        + params["fc1"]["bias"], approximate=False)
        y = u @ params["fc2"]["kernel"] + params["fc2"]["bias"]
        return x2 + y * mask[:, :, None]

    ref = reference(x)
    out = fused_vit_block(x, mask.reshape(b, 1, l), mask.reshape(b, l, 1),
                          params, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_vit_dense_matches_model():
    x = _x()
    dense = LAUDViT(token_skip=False, head_skip=False, layer_skip=False,
                    **GEOM)
    v = jax.jit(lambda: dense.init({"params": jax.random.PRNGKey(0)}, x,
                                   1.0, training=False))()
    ref = dense.apply(v, x, 0.1, training=False).logits
    fwd = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                          fast_math=False, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref),
                               atol=2e-5)


def test_fused_vit_selection_matches_model():
    x = _x(seed=3)
    base = LAUDViT(head_skip=False, layer_skip=False, **GEOM)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(1)}, x,
                                  1.0, training=False))()
    caps = (1.0, 0.5)
    sel = LAUDViT(head_skip=False, layer_skip=False, token_capacity=caps,
                  **GEOM)
    ref = sel.apply(v, x, 0.1, training=False).logits
    fwd = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                          token_capacity=caps, fast_math=False, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref),
                               atol=2e-5)


def test_block_kernel_fake_head_matches_reference_ops():
    """Odd head counts (T2T's 7) ride a zero-padded fake head: the padded
    kernel must equal the unpadded jnp reference at the LOGICAL head
    count — the fake head's q/k/v are zero, its attention output is zero,
    and the zero proj rows discard it."""
    from laudnet_tpu.infer.fused_vit import _pad_fake_head

    rng = np.random.default_rng(11)
    b, l, d, h = 2, 19, 192, 3  # dh=64 -> aligned pairs, odd head count
    hidden = 384
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = jnp.asarray((rng.random((b, l)) > 0.3), jnp.float32)
    mask = mask.at[:, 0].set(1.0)

    def mkd(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    blk = {
        "norm1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "norm2": {"scale": mkd((d,)) + 1.0, "bias": mkd((d,))},
        "qkv": {"kernel": mkd((d, 3 * d)), "bias": mkd((3 * d,))},
        "proj": {"kernel": mkd((d, d)), "bias": mkd((d,))},
        "fc1": {"kernel": mkd((d, hidden)), "bias": mkd((hidden,))},
        "fc2": {"kernel": mkd((hidden, d)), "bias": mkd((d,))},
    }

    def ln(y, p):
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return (y - mu) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]

    def reference(x):
        h1 = ln(x, blk["norm1"])
        qkv = h1 @ blk["qkv"]["kernel"] + blk["qkv"]["bias"]
        qh = qkv.reshape(b, l, 3, h, d // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qh[0], qh[1], qh[2]
        s = (q @ k.transpose(0, 1, 3, 2)) * (d // h) ** -0.5
        s = s + (1.0 - mask)[:, None, None, :] * -1e9
        o = (jax.nn.softmax(s, -1) @ v).transpose(0, 2, 1, 3).reshape(
            b, l, d)
        proj = o @ blk["proj"]["kernel"] + blk["proj"]["bias"]
        x2 = x + proj * mask[:, :, None]
        h2 = ln(x2, blk["norm2"])
        u = jax.nn.gelu(h2 @ blk["fc1"]["kernel"]
                        + blk["fc1"]["bias"], approximate=False)
        y = u @ blk["fc2"]["kernel"] + blk["fc2"]["bias"]
        return x2 + y * mask[:, :, None]

    padded = _pad_fake_head(blk, d, h)
    assert padded["qkv"]["kernel"].shape == (d, 3 * 4 * 64)
    assert padded["proj"]["kernel"].shape == (4 * 64, d)
    params = {"ln1": padded["norm1"], "ln2": padded["norm2"],
              "qkv": padded["qkv"], "proj": padded["proj"],
              "fc1": padded["fc1"], "fc2": padded["fc2"]}
    out = fused_vit_block(x, mask.reshape(b, 1, l), mask.reshape(b, l, 1),
                          params, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(reference(x)),
                               atol=2e-5)


def test_fused_vit_odd_heads_matches_model():
    """build_fused_vit pads the fake head automatically for odd-head
    models (dense + selection + head gating)."""
    geom = dict(depth=2, dim=192, num_heads=3, mlp_ratio=2.0,
                num_classes=11)
    x = _x(seed=13)
    base = LAUDViT(layer_skip=False, **geom)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(5)}, x,
                                  1.0, training=False))()
    import flax

    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    bias = v["params"]["block_1"]["head_policy"]["bias"]
    v["params"]["block_1"]["head_policy"]["bias"] = bias.at[2].set(-5.0)

    caps = (1.0, 0.5)
    sel = LAUDViT(layer_skip=False, token_capacity=caps, **geom)
    ref = sel.apply(v, x, 0.1, training=False)
    assert float(jnp.asarray(ref.head_density).mean()) < 1.0
    fwd = build_fused_vit(v, depth=2, dim=192, num_heads=3,
                          token_capacity=caps, head_gating=True,
                          fast_math=False, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref.logits),
                               atol=2e-5)


def test_fused_vit_odd_heads_int8_close():
    """The int8 block engine accepts the padded odd-head geometry: the
    all-zero fake-head columns quantize to zero codes (eps-floored
    scale), so the padded int8 engine stays close to the bf16 one."""
    geom = dict(depth=2, dim=192, num_heads=3, mlp_ratio=2.0,
                num_classes=11, token_skip=False, head_skip=False,
                layer_skip=False)
    x = _x(seed=17)
    base = LAUDViT(**geom)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(6)}, x,
                                  1.0, training=False))()
    ref = np.asarray(base.apply(v, x, 0.1, training=False).logits)
    q = np.asarray(build_fused_vit(v, depth=2, dim=192, num_heads=3,
                                   int8=True, interpret=True)(x))
    rel = np.linalg.norm(q - ref) / np.linalg.norm(ref)
    assert 0 < rel < 0.05, rel
    assert (q.argmax(-1) == ref.argmax(-1)).all()


def test_t2t_stem_conv_fold_matches_module():
    """The conv-folded stem (`t2t_stem_conv_apply` — unfold+LN+kqv as
    three convs, patch tensors never materialized) equals the unfold
    module forward up to fp reassociation."""
    from laudnet_tpu.models.t2t import T2TStem, t2t_stem_conv_apply

    x = _x(b=1, s=224, seed=23)
    stem = T2TStem(embed_dim=192)
    v = jax.jit(lambda: stem.init(jax.random.PRNGKey(0), x))()
    ref = np.asarray(stem.apply(v, x))
    out = np.asarray(t2t_stem_conv_apply(v["params"], x, embed_dim=192))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_fused_vit_t2t_stem_matches_model():
    """stem='t2t' runs the conv-folded performer stem as the engine
    prologue — the full T2T-ViT serving path (odd heads + tokens-to-
    token stem). The fold reassociates fp math, so tolerate small logit
    drift but require identical predictions."""
    geom = dict(depth=2, dim=192, num_heads=3, mlp_ratio=2.0,
                num_classes=11, stem="t2t")
    x = _x(b=1, s=224, seed=19)  # T2TStem is built for 224 inputs
    base = LAUDViT(head_skip=False, layer_skip=False, **geom)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(7)}, x,
                                  1.0, training=False))()
    caps = (1.0, 0.5)
    sel = LAUDViT(head_skip=False, layer_skip=False, token_capacity=caps,
                  **geom)
    ref = np.asarray(sel.apply(v, x, 0.1, training=False).logits)
    fwd = build_fused_vit(v, depth=2, dim=192, num_heads=3, stem="t2t",
                          token_capacity=caps, fast_math=False, interpret=True)
    out = np.asarray(fwd(x))
    np.testing.assert_allclose(out, ref, atol=5e-3)
    assert (out.argmax(-1) == ref.argmax(-1)).all()


def test_block_kernel_rejects_unaligned_geometry():
    x = jnp.zeros((1, 5, 192))
    params = {
        "ln1": {"scale": jnp.ones(192), "bias": jnp.zeros(192)},
        "ln2": {"scale": jnp.ones(192), "bias": jnp.zeros(192)},
        "qkv": {"kernel": jnp.zeros((192, 576)), "bias": jnp.zeros(576)},
        "proj": {"kernel": jnp.zeros((192, 192)), "bias": jnp.zeros(192)},
        "fc1": {"kernel": jnp.zeros((192, 384)), "bias": jnp.zeros(384)},
        "fc2": {"kernel": jnp.zeros((384, 192)), "bias": jnp.zeros(192)},
    }
    with pytest.raises(AssertionError, match="128-aligned"):
        fused_vit_block(x, jnp.ones((1, 1, 5)), jnp.ones((1, 5, 1)),
                        params, num_heads=3, interpret=True)


def test_block_kernel_mlp_chunking_bit_identical():
    """The opt-in mlp_chunk row slicing (VMEM relief for wide geometries,
    e.g. DeiT-B) equals the whole-block MLP — fc1/gelu/fc2 are
    row-independent. (Bit-equal on TPU, where MXU accumulation order is
    row-invariant; CPU Eigen retiles by row count, so tolerate ulps.)"""
    rng = np.random.default_rng(7)
    b, l, d, h = 2, 19, 256, 4
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = jnp.ones((b, l), jnp.float32)

    def mkd(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    params = {
        "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "ln2": {"scale": mkd((d,)) + 1.0, "bias": mkd((d,))},
        "qkv": {"kernel": mkd((d, 3 * d)), "bias": mkd((3 * d,))},
        "proj": {"kernel": mkd((d, d)), "bias": mkd((d,))},
        "fc1": {"kernel": mkd((d, 512)), "bias": mkd((512,))},
        "fc2": {"kernel": mkd((512, d)), "bias": mkd((d,))},
    }
    km, rm = mask.reshape(b, 1, l), mask.reshape(b, l, 1)
    whole = fused_vit_block(x, km, rm, params, num_heads=h, interpret=True)
    chunked = fused_vit_block(x, km, rm, params, num_heads=h, mlp_chunk=16,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                               atol=5e-6, rtol=5e-5)


def test_snap_capacity_to_tiles():
    """MXU tile snapping: floor to 8-sublane grid always; floor to the
    128-lane grid when that drops <10% of tokens (measured +8% on the
    DeiT-S schedule)."""
    from laudnet_tpu.infer.fused_vit import snap_capacity_to_tiles

    assert snap_capacity_to_tiles(137) == 128   # 5.9% drop -> lane tile
    assert snap_capacity_to_tiles(98) == 96     # below 128: sublane grid
    assert snap_capacity_to_tiles(160) == 160   # 20% to 128: keep 8-grid
    assert snap_capacity_to_tiles(130) == 128
    assert snap_capacity_to_tiles(203) == 200
    assert snap_capacity_to_tiles(5) == 8       # floor of the grid


def test_fused_vit_snapped_matches_model_at_snapped_caps():
    """snap_capacities=True must equal the flax model run with the
    equivalent (snapped) capacity fractions — snapping changes the
    budget, not the selection semantics."""
    x = _x(seed=5)
    base = LAUDViT(head_skip=False, layer_skip=False, **GEOM)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(2)}, x,
                                  1.0, training=False))()
    # L = (64/16)^2 + 1 = 17; cap 0.7 -> k=11, snapped -> 8
    caps = (1.0, 0.7)
    snapped_caps = (1.0, 8 / 17)
    ref = LAUDViT(head_skip=False, layer_skip=False,
                  token_capacity=snapped_caps, **GEOM).apply(
        v, x, 0.1, training=False).logits
    fwd = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                          token_capacity=caps, snap_capacities=True,
                          fast_math=False, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref),
                               atol=2e-5)


def test_fused_vit_head_gated_matches_model():
    """head_gating=True applies the model's eval per-head gates inside
    the kernel (lane-expanded multiply) — bit-matched to the flax graph,
    with some heads forced CLOSED so the gate actually bites; also
    combined with token selection."""
    x = _x(seed=9)
    base = LAUDViT(token_skip=False, layer_skip=False, head_skip=True,
                   **GEOM)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(3)}, x,
                                  1.0, training=False))()
    # close head 1 of block 0 and head 3 of block 1 (keep-logit -5)
    import flax

    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    for blk, head in (("blocks_0", 1), ("blocks_1", 3)):
        name = blk if blk in v["params"] else blk.replace("blocks_", "block_")
        bias = v["params"][name]["head_policy"]["bias"]
        v["params"][name]["head_policy"]["bias"] = bias.at[head].set(-5.0)

    ref = base.apply(v, x, 0.1, training=False)
    fwd = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                          head_gating=True, fast_math=False, interpret=True)
    assert float(jnp.asarray(ref.head_density).mean()) < 1.0  # gates bit
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref.logits),
                               atol=2e-5)

    sel = LAUDViT(layer_skip=False, head_skip=True,
                  token_capacity=(1.0, 0.5), **GEOM)
    vsel = jax.jit(lambda: sel.init({"params": jax.random.PRNGKey(4)}, x,
                                    1.0, training=False))()
    vsel = (flax.core.unfreeze(vsel)
            if hasattr(flax.core, "unfreeze") else dict(vsel))
    name = ("blocks_0" if "blocks_0" in vsel["params"] else "block_0")
    bias = vsel["params"][name]["head_policy"]["bias"]
    vsel["params"][name]["head_policy"]["bias"] = bias.at[0].set(-5.0)
    ref2 = sel.apply(vsel, x, 0.1, training=False).logits
    fwd2 = build_fused_vit(vsel, depth=2, dim=256, num_heads=4,
                           token_capacity=(1.0, 0.5), head_gating=True,
                           fast_math=False, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd2(x)), np.asarray(ref2),
                               atol=2e-5)


def test_fused_vit_segments_equal_per_block():
    """The multi-layer segment kernel (default) is bit-equal to the
    per-block kernel path on dense and selection (same math, same
    accumulation order per layer — only kernel boundaries move)."""
    x = _x(seed=29)
    base = LAUDViT(head_skip=False, layer_skip=False, **GEOM)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(8)}, x,
                                  1.0, training=False))()
    for caps in (None, (1.0, 0.5)):
        # dense paths need an explicit segment cap (default True only
        # engages on selection — measured policy)
        seg = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                              token_capacity=caps,
                              segments=True if caps else 2,
                              interpret=True)(x)
        blk = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                              token_capacity=caps, segments=False,
                              interpret=True)(x)
        np.testing.assert_allclose(np.asarray(seg), np.asarray(blk),
                                   atol=2e-6)


def test_segment_interior_policy_gates_in_compute_dtype():
    """An interior (non-gather) token-policy layer inside a segment must
    round its logits to the compute dtype BEFORE the keep/drop compare,
    exactly like the out-of-kernel path: a logit pair that ties in bf16
    (1 vs 1 + 2^-9, which rounds to 1) but not in f32 must KEEP the
    token in bf16 serving (r4 fix — an f32 compare dropped it)."""
    from laudnet_tpu.ops.pallas.vit_block import fused_vit_segment

    rng = np.random.default_rng(3)
    b, l, d, h = 2, 8, 256, 2
    hidden = 256

    def mkd(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.bfloat16)

    def layer(policy_bias=None):
        p = {
            "ln1": {"scale": jnp.ones(d, jnp.bfloat16),
                    "bias": jnp.zeros(d, jnp.bfloat16)},
            "ln2": {"scale": jnp.ones(d, jnp.bfloat16),
                    "bias": jnp.zeros(d, jnp.bfloat16)},
            "qkv": {"kernel": mkd((d, 3 * d)), "bias": mkd((3 * d,))},
            "proj": {"kernel": mkd((d, d)), "bias": mkd((d,))},
            "fc1": {"kernel": mkd((d, hidden)), "bias": mkd((hidden,))},
            "fc2": {"kernel": mkd((hidden, d)), "bias": mkd((d,))},
        }
        if policy_bias is not None:
            p["token_policy"] = {
                "kernel": jnp.zeros((d, 2), jnp.bfloat16),
                "bias": jnp.asarray(policy_bias, jnp.float32),
            }
        return p

    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    mask0 = jnp.ones((b, l), jnp.float32)
    params = [layer(), layer(policy_bias=[1.0, 1.0 + 2.0**-9])]
    _, mask = fused_vit_segment(x, mask0, params, num_heads=h,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.ones((b, l), np.float32))


# --- fast_math serving default (VERDICT r4 #8: move the serving headline) ---

def test_fast_math_close_to_exact_and_same_top1():
    """The serving default (fast_math=True: deferred softmax
    normalization + one-pass LN + tanh GELU) tracks the exact kernels to
    ~1e-3 on f32 logits over a 2-layer model and NEVER changes the
    argmax class on a random batch — the serving-relevant invariant."""
    from laudnet_tpu.infer.fused_vit import build_fused_vit

    m = LAUDViT(depth=2, dim=256, num_heads=4, mlp_ratio=2.0,
                num_classes=11, token_skip=False, head_skip=False,
                layer_skip=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    exact = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                            fast_math=False, interpret=True)(x)
    fast = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                           interpret=True)(x)  # default ON
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=5e-3)
    assert (np.asarray(fast).argmax(-1)
            == np.asarray(exact).argmax(-1)).all()


def test_fast_math_selection_path_same_tokens_and_close():
    """fast_math on the token-selection path (segment kernels): the
    KEPT TOKEN SET must be identical to the exact path (gates compare
    logits in the compute dtype before any fast-math op touches them at
    f32 granularity) and logits stay close."""
    from laudnet_tpu.infer.fused_vit import build_fused_vit

    m = LAUDViT(depth=2, dim=256, num_heads=4, mlp_ratio=2.0,
                num_classes=11, head_skip=False, layer_skip=False,
                token_capacity=(1.0, 0.6))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(3)}, x, 1.0, training=False)
    exact = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                            token_capacity=(1.0, 0.6), fast_math=False,
                            interpret=True)(x)
    fast = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                           token_capacity=(1.0, 0.6), interpret=True)(x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=5e-3)


def test_gelu_tanh_error_bound():
    """tanh GELU's deviation from the erf form stays under 5e-4
    everywhere (the documented fast_math accuracy bound)."""
    from laudnet_tpu.ops.pallas.vit_block import _gelu_exact, _gelu_tanh

    x = jnp.linspace(-8.0, 8.0, 4001)
    err = float(jnp.abs(_gelu_tanh(x) - _gelu_exact(x)).max())
    assert err < 5e-4
