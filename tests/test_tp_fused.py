"""Partition-aware fused attention: shard_map TP path vs the replicated
fused kernel (r4 VERDICT #1 — the fused Pallas kernels and --tp must
compose). Runs on the 8-device virtual CPU mesh in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.ops.pallas.vit_attention import fused_vit_attention
from laudnet_tpu.parallel.mesh import make_mesh
from laudnet_tpu.parallel.tp import tp_fused_vit_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _inputs(b, l, h, dh, seed=0, gated=True):
    rng = np.random.default_rng(seed)
    d = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)), jnp.float32)
    km = jnp.asarray(rng.random((b, l)) > 0.3, jnp.float32).at[:, 0].set(1.0)
    hm = (jnp.asarray(rng.random((b, h)) > 0.3, jnp.float32)
          if gated else None)
    return qkv, km, hm


@pytest.mark.parametrize("h,gated", [(4, True), (4, False), (6, True)])
def test_tp_fused_attention_matches_replicated(h, gated):
    """tp2 shard_map output == replicated fused kernel output, bit-exact.
    h=6/tp2 gives ODD local head counts (DeiT-S geometry) — exercises the
    per-shard fake-head path."""
    mesh = make_mesh(model_parallel=2)  # dp4 x tp2
    b, l, dh = 8, 16, 64
    qkv, km, hm = _inputs(b, l, h, dh, gated=gated)
    scale = dh**-0.5

    ref = fused_vit_attention(qkv, km, hm, h, scale, 8, True)
    out = jax.jit(lambda a, m, g: tp_fused_vit_attention(
        a, m, g, h, scale, mesh, interpret=True))(qkv, km, hm)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tp_fused_attention_grad_parity():
    """The kernel's custom_vjp differentiates through shard_map: dqkv and
    dhead_mask match the replicated fused backward exactly."""
    mesh = make_mesh(model_parallel=2)
    b, l, h, dh = 8, 16, 4, 64
    qkv, km, hm = _inputs(b, l, h, dh, seed=1)
    scale = dh**-0.5

    def loss_tp(a, m, g):
        return (tp_fused_vit_attention(a, m, g, h, scale, mesh,
                                       interpret=True) ** 2).sum()

    def loss_ref(a, m, g):
        return (fused_vit_attention(a, m, g, h, scale, 8, True) ** 2).sum()

    g_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 2)))(qkv, km, hm)
    g_ref = jax.grad(loss_ref, argnums=(0, 2))(qkv, km, hm)
    for got, want in zip(g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_tp_fused_attention_rejects_indivisible_heads():
    mesh = make_mesh(model_parallel=2)
    qkv, km, hm = _inputs(2, 8, 7, 64)
    with pytest.raises(ValueError, match="not divisible"):
        tp_fused_vit_attention(qkv, km, hm, 7, 0.125, mesh, interpret=True)


def test_laud_vit_tp_mesh_matches_unsharded_fused():
    """End-to-end: LAUDViT(attn_impl='fused', tp_mesh=mesh) under a dp4xtp2
    mesh produces the same logits as the single-device fused model with the
    same params — the done-criterion of VERDICT r4 item 1."""
    from laudnet_tpu.models.laud_vit import LAUDViT
    from laudnet_tpu.parallel import VIT_TP_RULES, shard_params

    mesh = make_mesh(model_parallel=2)
    base = LAUDViT(depth=2, dim=256, num_heads=4, patch_size=16,
                   num_classes=10, attn_impl="fused")
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, 32, 32, 3)),
        jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                          training=False)
    want = base.apply(variables, x, 0.1, training=False).logits

    tp_model = base.clone(tp_mesh=mesh)
    params_tp = shard_params(variables["params"], mesh, VIT_TP_RULES)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, xx: tp_model.apply(
        {"params": p}, xx, 0.1, training=False).logits)(params_tp, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
