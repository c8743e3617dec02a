"""Layer-skip inference engine: parity with the dense-masked linen graph."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.infer import build_layer_skip_resnet
from laudnet_tpu.models import laud_resnet


def test_layerskip_matches_dense_masked_graph():
    model = laud_resnet.LAUDResNet(
        layers=(2, 2, 2, 2), num_classes=10, input_size=64,
        dyn_mode=("layer",) * 4,
        mask_spatial_granularity=(16, 8, 4, 2),
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                           training=False)

    # Bias some gates shut so the cond actually skips blocks.
    params = variables["params"]
    rng = np.random.default_rng(3)
    for scope in list(params):
        if scope.startswith("layer") and rng.random() < 0.5:
            bias = params[scope]["masker_spatial"]["conv"]["bias"]
            params[scope]["masker_spatial"]["conv"]["bias"] = (
                bias.at[0].set(-5.0).at[1].set(5.0)
            )
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    want = model.apply(variables, x, 0.1, training=False)
    fwd = build_layer_skip_resnet(variables, layers=(2, 2, 2, 2))
    got_logits, n_run = jax.jit(fwd)(x)

    np.testing.assert_allclose(
        np.asarray(got_logits[0]), np.asarray(want.logits[0]),
        rtol=1e-4, atol=1e-4,
    )
    # some but not all blocks ran (gates were biased shut randomly)
    total_blocks = 8
    kept = int(n_run)
    expected_kept = int(np.asarray(jnp.concatenate(
        [s for s in want.spatial_s3]
    )).sum())
    assert kept == expected_kept
    assert 0 < kept < total_blocks


def test_layer_skip_vit_matches_model():
    """Batch-1 ViT layer-skip engine: lax.cond real skipping, bit-matched
    to the flax layer-gated graph with some branches forced closed."""
    import flax
    import jax.numpy as jnp

    from laudnet_tpu.infer import build_layer_skip_vit
    from laudnet_tpu.models.laud_vit import LAUDViT

    geom = dict(depth=2, dim=256, num_heads=4, mlp_ratio=2.0,
                num_classes=11)
    m = LAUDViT(token_skip=False, head_skip=False, layer_skip=True, **geom)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 64, 64, 3)),
        jnp.float32)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                               training=False))()
    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    # close block_0's attention branch and block_1's MLP branch
    # (layer_policy bias layout: [attn_on, mlp_on, attn_off, mlp_off])
    b0 = v["params"]["block_0"]["layer_policy"]["bias"]
    v["params"]["block_0"]["layer_policy"]["bias"] = b0.at[0].set(-5.0)
    b1 = v["params"]["block_1"]["layer_policy"]["bias"]
    v["params"]["block_1"]["layer_policy"]["bias"] = b1.at[1].set(-5.0)

    out = m.apply(v, x, 0.1, training=False)
    fwd = jax.jit(build_layer_skip_vit(v, depth=2, dim=256, num_heads=4,
                                       interpret=True))
    logits, n_run = fwd(x)
    assert int(n_run) == 2  # 4 branches, 2 forced closed
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out.logits),
                               atol=2e-5)


def test_layerskip_rejects_multi_image_batches():
    """The gate reads image 0's logits; B>1 must raise the documented
    batch-1 contract error instead of silently gating the whole batch on
    image 0 (r4 review finding)."""
    import pytest

    model = laud_resnet.LAUDResNet(
        layers=(1, 1, 1, 1), num_classes=10, input_size=64,
        dyn_mode=("layer",) * 4,
    )
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)
    fwd = build_layer_skip_resnet(variables, (1, 1, 1, 1))
    with pytest.raises(ValueError, match="batch-1"):
        fwd(x)
