"""LAUD-ViT tests: shapes, gating semantics, density accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.models.laud_vit import LAUDViT, laud_deit_tiny


def tiny_vit(**kw):
    d = dict(depth=2, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
             num_classes=10)
    d.update(kw)
    return LAUDViT(**d)


def test_forward_eval_shapes():
    m = tiny_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out = m.apply(v, x, 0.1, training=False)
    assert out.logits.shape == (2, 10)
    assert out.token_density.shape == (2,)
    assert out.flops_perc.shape == (2,)
    fp = np.asarray(out.flops_perc)
    assert (fp > 0).all() and (fp <= 1.0 + 1e-6).all()


def test_training_uses_gumbel_and_is_differentiable():
    m = tiny_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    def loss(params):
        out = m.apply({"params": params}, x, 5.0, training=True,
                      rngs={"gumbel": jax.random.PRNGKey(2)})
        return (out.flops_perc.mean() - 0.5) ** 2 + 0.0 * out.logits.sum()

    g = jax.grad(loss)(v["params"])
    tp = g["block_0"]["token_policy"]["kernel"]
    assert float(jnp.abs(tp).sum()) > 0


def test_masked_tokens_do_not_affect_output():
    """Zeroing a token's mask must make the block output independent of that
    token's content (key-masked attention + residual gating)."""
    m = tiny_vit(layer_skip=False, head_skip=False, token_skip=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    from laudnet_tpu.models.laud_vit import LAUDViTBlock

    blk = LAUDViTBlock(dim=64, num_heads=4, mlp_ratio=2.0, token_skip=False,
                       head_skip=False, layer_skip=False)
    tokens = jax.random.normal(jax.random.PRNGKey(2), (1, 17, 64))
    bv = blk.init({"params": jax.random.PRNGKey(3)}, tokens,
                  jnp.ones((1, 17)), 1.0, training=False)

    mask = jnp.ones((1, 17)).at[0, 5].set(0.0)
    out1, _, _ = blk.apply(bv, tokens, mask, 1.0, training=False)
    tokens2 = tokens.at[0, 5].set(123.0)
    out2, _, _ = blk.apply(bv, tokens2, mask, 1.0, training=False)
    # all other token positions unaffected by token 5's content
    np.testing.assert_allclose(
        np.asarray(out1[0, :5]), np.asarray(out2[0, :5]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out1[0, 6:]), np.asarray(out2[0, 6:]), atol=1e-5
    )


def test_all_gates_open_gives_flops_perc_one():
    m = tiny_vit(token_skip=False, head_skip=False, layer_skip=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out = m.apply(v, x, 0.1, training=False)
    np.testing.assert_allclose(np.asarray(out.flops_perc), 1.0, atol=1e-6)


def test_head_mask_zeroes_head_contribution():
    from laudnet_tpu.models.laud_vit import LAUDViTBlock

    blk = LAUDViTBlock(dim=64, num_heads=4, mlp_ratio=2.0, token_skip=False,
                       head_skip=True, layer_skip=False)
    tokens = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 64))
    bv = blk.init({"params": jax.random.PRNGKey(3)}, tokens,
                  jnp.ones((2, 9)), 1.0, training=False)
    out, _, st = blk.apply(bv, tokens, jnp.ones((2, 9)), 0.1, training=False)
    assert 0.0 <= float(st.head_density) <= 1.0


def test_token_selection_matches_masked_graph():
    """With budget >= realized keep count, the token-selection serving path
    reproduces the masked-graph class logits exactly (dropped tokens never
    re-enter attention, so removal == masking)."""
    kw = dict(depth=3, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
              num_classes=10, head_skip=False, layer_skip=False)
    dense = tiny_vit(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = dense.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    # bias some token gates shut so masks actually close
    params = jax.device_get(v["params"])
    for i in range(3):
        k = params[f"block_{i}"]["token_policy"]["kernel"]
        bias = np.zeros(2, np.float32)
        bias[1] = 2.0  # favor 'skip' logit -> ~most tokens closed
        params[f"block_{i}"]["token_policy"]["bias"] = jnp.asarray(bias)
    v = {"params": params}

    out_d = dense.apply(v, x, 0.1, training=False)
    kept = float(out_d.token_density.min())
    assert kept < 1.0  # gates actually closed

    sel = tiny_vit(token_capacity=(1.0, 1.0, 1.0), **kw)
    out_s = sel.apply(v, x, 0.1, training=False)
    np.testing.assert_allclose(np.asarray(out_s.logits),
                               np.asarray(out_d.logits), rtol=1e-4, atol=1e-4)

    # tight budget: still runs, logits finite, shapes static
    sel2 = tiny_vit(token_capacity=(0.5, 0.4, 0.3), **kw)
    out_t = sel2.apply(v, x, 0.1, training=False)
    assert np.isfinite(np.asarray(out_t.logits)).all()


def test_t2t_stem_and_full_model():
    from laudnet_tpu.models.t2t import T2TStem, unfold
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    t, hw = unfold(x, 7, 4, 2)
    assert t.shape == (1, 56 * 56, 147) and hw == (56, 56)

    stem = T2TStem(embed_dim=448)
    v = stem.init(jax.random.PRNGKey(1), x)
    tokens = stem.apply(v, x)
    assert tokens.shape == (1, 196, 448)
    assert np.isfinite(np.asarray(tokens)).all()

    from laudnet_tpu.models.laud_vit import LAUDViT

    model = LAUDViT(depth=1, dim=448, num_heads=7, mlp_ratio=3.0, stem="t2t",
                    num_classes=10)
    mv = model.init({"params": jax.random.PRNGKey(2)}, x, 1.0, training=False)
    out = model.apply(mv, x, 0.1, training=False)
    assert out.logits.shape == (1, 10)
    assert float(out.flops) > 0


def test_calibrate_token_capacity():
    from laudnet_tpu.infer import calibrate_token_capacity

    m = tiny_vit(depth=2, head_skip=False, layer_skip=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    batches = [jax.random.normal(jax.random.PRNGKey(i), (2, 32, 32, 3))
               for i in range(3)]
    caps = calibrate_token_capacity(
        lambda b: m.apply(v, b, 0.1, training=False), batches, margin=0.02
    )
    assert len(caps) == 2
    assert all(0 < c <= 1.0 for c in caps)


def test_calibrate_token_capacity_covers_per_image_tail():
    """quantile=1.0 capacities must cover EVERY calibration image's realized
    keep count (per-image calibration, not batch means), so the selection
    path reproduces the masked-graph logits exactly on the calibration set.
    """
    kw = dict(depth=3, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
              num_classes=10, head_skip=False, layer_skip=False)
    m = tiny_vit(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    # bias gates so masks close input-dependently (some images keep more)
    params = jax.device_get(v["params"])
    for i in range(3):
        bias = np.zeros(2, np.float32)
        bias[1] = 1.0
        params[f"block_{i}"]["token_policy"]["bias"] = jnp.asarray(bias)
    v = {"params": params}

    out = m.apply(v, x, 0.1, training=False)
    keep = np.asarray(out.token_keep)  # (depth, B)
    assert keep.shape == (3, 4)
    # per-image keeps must actually differ for this test to mean anything
    assert keep.std(axis=1).max() > 0

    from laudnet_tpu.infer import calibrate_token_capacity

    caps = calibrate_token_capacity(
        lambda b: m.apply(v, b, 0.1, training=False), [x],
        quantile=1.0, margin=1e-6,
    )
    # capacity covers the per-image max, which is above the batch mean
    for d in range(3):
        assert caps[d] >= keep[d].max() - 1e-6
    if keep.std(axis=1).max() > 1e-6:
        assert any(caps[d] > keep[d].mean() + 1e-9 for d in range(3))

    sel = tiny_vit(token_capacity=caps, **kw)
    out_s = sel.apply(v, x, 0.1, training=False)
    np.testing.assert_allclose(np.asarray(out_s.logits),
                               np.asarray(out.logits), rtol=1e-4, atol=1e-4)


def test_token_overflow_drops_least_confident():
    """When the budget is below the realized keep count, the least-confident
    kept tokens (by gate logit margin) are dropped, not the highest-index."""
    from laudnet_tpu.models.laud_vit import LAUDViTBlock

    blk = LAUDViTBlock(dim=64, num_heads=4, mlp_ratio=2.0, token_skip=True,
                       head_skip=False, layer_skip=False)
    tokens = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 64))
    bv = blk.init({"params": jax.random.PRNGKey(3)}, tokens,
                  jnp.ones((1, 9)), 1.0, training=False)
    _, mask, st = blk.apply(bv, tokens, jnp.ones((1, 9)), 0.1,
                            training=False)
    score = np.asarray(st.token_score)[0]
    kept = np.where(np.asarray(mask)[0] > 0)[0]
    if len(kept) > 3:
        # emulate the model's truncation ranking
        conf = 1.0 / (1.0 + np.exp(-score))
        rank = np.asarray(mask)[0] * 2.0 + conf
        rank[0] += 4.0
        k = len(kept) - 1
        idx = np.sort(np.argsort(-rank)[:k])
        surviving = set(idx) & set(kept)
        dropped = set(kept) - surviving
        # the dropped kept-token must have the lowest confidence among
        # non-class kept tokens
        non_cls = [t for t in kept if t != 0]
        worst = min(non_cls, key=lambda t: conf[t])
        assert dropped == {worst}
    assert 0 in kept  # class token forced open


def test_vit_dense_flops_matches_graph():
    """Closed-form vit_dense_flops == in-graph flops when every gate is open
    (all-skips-off model has flops_perc == 1 everywhere)."""
    from laudnet_tpu.models.laud_vit import vit_dense_flops

    m = tiny_vit(token_skip=False, head_skip=False, layer_skip=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out = m.apply(v, x, 0.1, training=False)
    np.testing.assert_allclose(
        float(out.flops), vit_dense_flops(m, input_size=32), rtol=1e-6
    )


def test_policy_params_grouped_as_masker():
    from laudnet_tpu.train.optim import param_group_labels

    m = tiny_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    labels = param_group_labels(v["params"])
    b0 = labels["block_0"]
    assert b0["token_policy"]["kernel"] == "masker"
    assert b0["head_policy"]["kernel"] == "masker"
    assert b0["layer_policy"]["kernel"] == "masker"
    assert b0["qkv"]["kernel"] == "backbone"


def test_token_selection_flops_match_masked_graph():
    """Capacity selection is an execution strategy, not a model change: with
    budget covering the realized keeps, reported FLOPs must equal the masked
    graph's (regression: the in-block gather once double-counted the
    reduction by mixing the post-gather length with pre-gather density)."""
    kw = dict(depth=3, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
              num_classes=10, head_skip=False, layer_skip=False)
    m = tiny_vit(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    params = jax.device_get(v["params"])
    for i in range(3):
        bias = np.zeros(2, np.float32)
        bias[1] = 2.0
        params[f"block_{i}"]["token_policy"]["bias"] = jnp.asarray(bias)
    v = {"params": params}
    out_m = m.apply(v, x, 0.1, training=False)
    sel = tiny_vit(token_capacity=(1.0, 1.0, 1.0), **kw)
    out_s = sel.apply(v, x, 0.1, training=False)
    np.testing.assert_allclose(float(out_s.flops), float(out_m.flops),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_s.flops_perc),
                               np.asarray(out_m.flops_perc), rtol=1e-6)

    # truncating budgets that still COVER the realized keeps: accounting
    # must stay in the masked frame (book_len threads the full length)
    from laudnet_tpu.infer import calibrate_token_capacity

    caps = calibrate_token_capacity(
        lambda b: m.apply(v, b, 0.1, training=False), [x],
        quantile=1.0, margin=1e-6,
    )
    sel2 = tiny_vit(token_capacity=caps, **kw)
    out_t = sel2.apply(v, x, 0.1, training=False)
    np.testing.assert_allclose(float(out_t.flops), float(out_m.flops),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t.logits),
                               np.asarray(out_m.logits), rtol=1e-4,
                               atol=1e-4)


def test_performer_random_features_published_init():
    """TokenPerformer's fixed feature matrix follows the published
    token_performer init: orthonormal rows scaled by sqrt(m), so
    w @ w.T == m * I (r4 fix — a normal/sqrt(m) draw collapses the
    features to near rank-1)."""
    from laudnet_tpu.models.t2t import TokenPerformer

    tp = TokenPerformer(dim=64)
    x = jnp.zeros((1, 5, 147), jnp.float32)
    v = tp.init({"params": jax.random.PRNGKey(0)}, x)
    w = np.asarray(v["params"]["w"])
    m = w.shape[0]
    assert w.shape == (32, 64)
    np.testing.assert_allclose(w @ w.T, m * np.eye(m), atol=1e-4)


def test_token_policy_gradients_bounded_at_init():
    """Regression: the additive -1e9 attention key mask must NOT leak a
    gradient into the token gates (it once contributed
    dL/d(gate) ~ 1e9 * sum dL/d(score) — ~1e13 policy grads at init and
    NaN within a few steps). Gate grads flow only through the
    multiplicative output masking and must stay O(1) at init."""
    import numpy as np

    model = LAUDViT(depth=2, dim=64, num_heads=4, mlp_ratio=2.0,
                    patch_size=8, num_classes=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)

    def loss(params):
        out = model.apply({"params": params}, x, jnp.float32(5.0),
                          training=True,
                          rngs={"gumbel": jax.random.PRNGKey(7)})
        return (out.logits.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    gmax = max(
        float(jnp.abs(v).max())
        for p, v in jax.tree_util.tree_leaves_with_path(g)
        if "policy" in jax.tree_util.keystr(p)
    )
    assert gmax < 1e3, f"policy grads exploded again: {gmax:.3e}"
