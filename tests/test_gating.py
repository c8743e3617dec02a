"""Gating primitive tests: eval determinism, ST gradient, distribution."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.ops import gating


def test_eval_gate_is_deterministic_comparison_with_tie_on():
    logits = jnp.asarray(
        [[[1.0, 0.5], [0.5, 0.5]], [[0.2, 0.7], [-1.0, 2.0]]]
    )  # (B=2, 2, G=2)
    mask = gating.binary_gate(logits, 1.0, training=False)
    # on >= off keeps; ties keep (torch `>=`, `models/utils.py:60`)
    # sample 0: on=[1.0, 0.5] vs off=[0.5, 0.5] -> [1, 1 (tie)]
    # sample 1: on=[0.2, 0.7] vs off=[-1.0, 2.0] -> [1, 0]
    np.testing.assert_array_equal(np.asarray(mask), [[1.0, 1.0], [1.0, 0.0]])


def test_train_gate_is_binary_and_straight_through():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (4, 2, 8))

    def f(l):
        m = gating.binary_gate(l, 0.5, training=True, key=jax.random.PRNGKey(1))
        return (m * 3.0).sum()

    mask = gating.binary_gate(logits, 0.5, training=True, key=jax.random.PRNGKey(1))
    # Forward values are binary up to ST float residue ((1-s)+s), same as torch.
    m = np.asarray(mask)
    assert np.allclose(m, np.round(m), atol=1e-5)
    grads = jax.grad(f)(logits)
    # Straight-through: gradient flows to both the on and off logits.
    assert float(jnp.abs(grads).sum()) > 0


def test_gumbel_softmax_hard_sums_to_one():
    key = jax.random.PRNGKey(42)
    logits = jax.random.normal(key, (16, 2, 4))
    y = gating.gumbel_softmax(jax.random.PRNGKey(7), logits, 1.0, axis=-2, hard=True)
    np.testing.assert_allclose(np.asarray(y.sum(axis=-2)), 1.0, atol=1e-6)


def test_gumbel_softmax_marginals_track_logits():
    # With strongly separated logits the hard sample should follow them.
    logits = jnp.zeros((2000, 2, 1)).at[:, 0, :].set(3.0)
    y = gating.gumbel_softmax(jax.random.PRNGKey(3), logits, 1.0, axis=-2, hard=True)
    frac_on = float(y[:, 0, 0].mean())
    assert frac_on > 0.9


def test_low_temperature_approaches_argmax():
    key = jax.random.PRNGKey(5)
    logits = jax.random.normal(key, (64, 2, 4)) * 10.0
    y = gating.gumbel_softmax(jax.random.PRNGKey(9), logits, 0.01, axis=-2, hard=True)
    agree = (jnp.argmax(y, axis=-2) == jnp.argmax(logits, axis=-2)).mean()
    assert float(agree) > 0.95
