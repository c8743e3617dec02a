"""Pallas fused block-sparse bottleneck tail: correctness vs dense graph.

Runs in interpreter mode on CPU; the TPU compile/perf path is exercised by
bench_sparse on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from laudnet_tpu.ops.pallas.masked_block import fold_bn, masked_bottleneck_tail


def dense_tail(x1, identity, mask_cells, w2, a2, b2, w3, a3, b3, patch):
    """The dense-masked graph the kernel must reproduce."""
    h = lax.conv_general_dilated(
        x1, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    h = jnp.maximum(h * a2 + b2, 0.0)
    y = h @ w3 * a3 + b3
    mask = jnp.repeat(jnp.repeat(mask_cells, patch, 1), patch, 2)[..., None]
    return jnp.maximum(y * mask + identity, 0.0)


@pytest.mark.parametrize("patch,hm,c,co", [(4, 4, 8, 16), (2, 8, 16, 32)])
def test_kernel_matches_dense(patch, hm, c, co):
    rng = np.random.default_rng(0)
    b = 2
    h = hm * patch
    x1 = jnp.asarray(rng.standard_normal((b, h, h, c)), jnp.float32)
    identity = jnp.asarray(rng.standard_normal((b, h, h, co)), jnp.float32)
    mask = jnp.asarray(rng.random((b, hm, hm)) > 0.4, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((c, co)) * 0.1, jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    a3 = jnp.asarray(rng.standard_normal((co,)) * 0.1 + 1.0, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

    want = dense_tail(x1, identity, mask, w2, a2, b2, w3, a3, b3, patch)
    with pltpu.force_tpu_interpret_mode():
        got = masked_bottleneck_tail(
            x1, identity, mask, w2, a2, b2, w3, a3, b3,
            patch=patch, capacity=hm * hm,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_capacity_drops_patches():
    rng = np.random.default_rng(1)
    b, patch, hm, c, co = 1, 4, 4, 8, 8
    h = hm * patch
    x1 = jnp.asarray(rng.standard_normal((b, h, h, c)), jnp.float32)
    identity = jnp.asarray(rng.standard_normal((b, h, h, co)), jnp.float32)
    mask = jnp.ones((b, hm, hm), jnp.float32)  # all active
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    w3 = jnp.eye(c, co, dtype=jnp.float32)
    ones = jnp.ones((c,), jnp.float32)
    zeros = jnp.zeros((c,), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        full = masked_bottleneck_tail(
            x1, identity, mask, w2, ones, zeros, w3, ones[:co], zeros[:co],
            patch=patch, capacity=hm * hm,
        )
        half = masked_bottleneck_tail(
            x1, identity, mask, w2, ones, zeros, w3, ones[:co], zeros[:co],
            patch=patch, capacity=hm * hm // 2,
        )
    # capacity binds: half the cells fall back to relu(identity)
    assert not np.allclose(np.asarray(full), np.asarray(half))
    # the first K cells in raster order are computed identically
    np.testing.assert_allclose(
        np.asarray(half[0, :patch * 2]), np.asarray(full[0, :patch * 2]),
        rtol=1e-5, atol=1e-5,
    )


def test_fold_bn():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    scale = jnp.asarray(rng.random(8) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(8), jnp.float32)
    var = jnp.asarray(rng.random(8) + 0.1, jnp.float32)
    a, b = fold_bn(scale, bias, mean, var, eps=1e-5)
    want = (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(x * a + b), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
