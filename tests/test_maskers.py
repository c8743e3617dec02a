"""Masker head tests: shapes, eval determinism, bias-init quirk, FLOPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.models.maskers import (
    ChannelMaskerConvLinear,
    ChannelMaskerMLP,
    SpatialMasker,
)


def init_and_apply(module, x, training=False, **kwargs):
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = module.init(rngs, x, 1.0, training=False)
    apply_rngs = {"gumbel": jax.random.PRNGKey(1)} if training else None
    out, _ = module.apply(
        variables, x, kwargs.get("temperature", 1.0), training=training,
        rngs=apply_rngs, mutable=["batch_stats"],
    )
    return variables, out


def test_spatial_masker_shapes_and_flops():
    m = SpatialMasker(mask_channel_group=1, mask_size=7)
    x = jnp.ones((2, 28, 28, 64))
    variables, (mask, sparsity, flops) = init_and_apply(m, x)
    assert mask.shape == (2, 7, 7, 1)
    # flops: pooled volume + conv per-pixel quirk (out*in + in)
    assert flops == 64 * 7 * 7 + (2 * 64 + 64) * 7 * 7
    assert 0.0 <= float(sparsity) <= 1.0


def test_spatial_masker_bias_init_opens_gate():
    m = SpatialMasker(mask_channel_group=1, mask_size=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 32))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, 1.0, training=False)
    bias = variables["params"]["conv"]["bias"]
    assert float(bias[0]) == 5.0  # open logit bias
    # with bias gap 5.0 the gate starts fully open at eval
    mask, sparsity, _ = m.apply(variables, x, 1.0, training=False)
    assert float(sparsity) == 1.0


@pytest.mark.parametrize("layers", [1, 2])
def test_channel_masker_mlp(layers):
    g = 32
    m = ChannelMaskerMLP(channel_dyn_group=g, layers=layers, reduction=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 14, 14, 128))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, 1.0, training=False)
    mask, sparsity, flops = m.apply(variables, x, 1.0, training=False)
    assert mask.shape == (2, g)
    width = max(g // 16, 16)
    expected = 128 * 14 * 14 + (
        128 * width + width * 2 * g if layers == 2 else 128 * 2 * g
    )
    assert flops == expected
    # bias layout quirk: [:g]=2.0, element g untouched, [g+1:]=-2.0
    bias_name = "fc2" if layers == 2 else "fc"
    bias = variables["params"][bias_name]["bias"]
    assert float(bias[0]) == 2.0 and float(bias[g - 1]) == 2.0
    assert float(bias[g + 1]) == -2.0
    assert abs(float(bias[g])) < 2.0  # random default, not the close value


def test_channel_masker_conv_linear():
    g = 16
    m = ChannelMaskerConvLinear(channel_dyn_group=g, reduction=16)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 14, 14, 256))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, 1.0, training=False)
    (mask, sparsity, flops), _ = m.apply(
        variables, x, 1.0, training=False, mutable=["batch_stats"]
    )
    assert mask.shape == (2, g)
    red = 256 // 16
    assert flops == red * 14 * 14 + 256 * red + red * 2 * g
    assert "bn" in variables["batch_stats"]


def test_training_mode_uses_gumbel_rng():
    m = SpatialMasker(mask_channel_group=1, mask_size=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 16))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, 1.0, training=False)
    m1, _, _ = m.apply(variables, x, 5.0, training=True,
                       rngs={"gumbel": jax.random.PRNGKey(1)})
    m2, _, _ = m.apply(variables, x, 5.0, training=True,
                       rngs={"gumbel": jax.random.PRNGKey(2)})
    m1a = np.asarray(m1)
    assert np.allclose(m1a, np.round(m1a), atol=1e-5)
    assert not np.array_equal(np.asarray(m1), np.asarray(m2))
