"""int8 dense-masked CNN serving (`LAUDResNet(conv_impl='int8')`): the
per-input gating stays fully dynamic — masker heads, BN and mask algebra
run float — and only the conv arithmetic quantizes (W8A8, `QuantConv`)."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.models import laud_resnet


GEOM = dict(layers=(1, 1, 1, 1), num_classes=10, input_size=64,
            dyn_mode=("channel",) * 4, channel_dyn_granularity=(2, 2, 2, 2),
            channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1))


def test_int8_dense_masked_close_to_float():
    m = laud_resnet.LAUDResNet(**GEOM)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    ref = m.apply(v, x, 0.1, training=False)
    q = laud_resnet.LAUDResNet(conv_impl="int8", **GEOM).apply(
        v, x, 0.1, training=False)
    rel = float(jnp.linalg.norm(q.logits - ref.logits)
                / jnp.linalg.norm(ref.logits))
    assert 0 < rel < 0.1, rel
    assert (jnp.argmax(q.logits, -1) == jnp.argmax(ref.logits, -1)).all()
    # bookkeeping stays intact (masks still drive it; small drift allowed
    # where a quantized feature flips a near-boundary gate)
    np.testing.assert_allclose(np.asarray(q.flops_perc),
                               np.asarray(ref.flops_perc), atol=0.2)


def test_int8_param_tree_is_checkpoint_compatible():
    m = laud_resnet.LAUDResNet(**GEOM)
    q = laud_resnet.LAUDResNet(conv_impl="int8", **GEOM)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    vq = q.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vq))
    # eval-only: the training graph is identical dense math
    rt = q.apply(v, x, 1.0, training=True,
                 rngs={"gumbel": jax.random.PRNGKey(2)},
                 mutable=["batch_stats"])[0]
    rd = m.apply(v, x, 1.0, training=True,
                 rngs={"gumbel": jax.random.PRNGKey(2)},
                 mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(rt.logits),
                                  np.asarray(rd.logits))


def test_int8_composes_with_spatial_and_sparse_execution():
    geom = dict(layers=(1, 1, 1, 1), num_classes=10, input_size=64,
                dyn_mode=("spatial",) * 4,
                mask_spatial_granularity=(4, 4, 2, 1),
                channel_masker=("MLP",) * 4,
                channel_masker_layers=(1, 1, 1, 1))
    m = laud_resnet.LAUDResNet(**geom)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    ref = m.apply(v, x, 0.1, training=False)
    q = laud_resnet.LAUDResNet(conv_impl="int8", **geom).apply(
        v, x, 0.1, training=False)
    rel = float(jnp.linalg.norm(q.logits - ref.logits)
                / jnp.linalg.norm(ref.logits))
    assert rel < 0.1, rel
    # the fixed-capacity sparse engine also runs int8 (gathered patches
    # through QuantConv), staying close to its own float version
    sparse_f = laud_resnet.LAUDResNet(
        execution="sparse", patch_capacity=(1.0,) * 4, **geom).apply(
        v, x, 0.1, training=False)
    sparse_q = laud_resnet.LAUDResNet(
        execution="sparse", patch_capacity=(1.0,) * 4, conv_impl="int8",
        **geom).apply(v, x, 0.1, training=False)
    rel_s = float(jnp.linalg.norm(sparse_q.logits - sparse_f.logits)
                  / jnp.linalg.norm(sparse_f.logits))
    assert rel_s < 0.1, rel_s


def test_int8_qat_training_and_eval():
    """conv_impl='int8_qat': fake-quant float convs in TRAINING (the QAT
    graph; straight-through gradients reach every conv kernel), real s8
    at EVAL (identical to conv_impl='int8'), same param tree as dense."""
    qat = laud_resnet.LAUDResNet(conv_impl="int8_qat", **GEOM)
    dense = laud_resnet.LAUDResNet(**GEOM)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = dense.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                   training=False)
    # same param tree: dense checkpoints load into the QAT model
    vq = qat.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                  training=False)
    assert (jax.tree_util.tree_structure(vq)
            == jax.tree_util.tree_structure(v))

    # training forward: fake-quant numerics, close to the dense graph
    rngs = {"gumbel": jax.random.PRNGKey(2)}
    out_qat, _ = qat.apply(v, x, 1.0, training=True, rngs=rngs,
                           mutable=["batch_stats"])
    out_dense, _ = dense.apply(v, x, 1.0, training=True, rngs=rngs,
                               mutable=["batch_stats"])
    rel = float(jnp.linalg.norm(out_qat.logits - out_dense.logits)
                / jnp.linalg.norm(out_dense.logits))
    assert 0 < rel < 0.2, rel

    # straight-through gradients reach the conv kernels
    def loss(params):
        out, _ = qat.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, 1.0,
            training=True, rngs=rngs, mutable=["batch_stats"])
        return (out.logits ** 2).mean()

    g = jax.grad(loss)(v["params"])
    gk = g["layer1_0"]["conv2"]["kernel"]
    assert jnp.isfinite(gk).all() and float(jnp.abs(gk).max()) > 0

    # eval: int8_qat serves the REAL s8 path, bit-equal to conv_impl='int8'
    q_eval = qat.apply(v, x, 0.1, training=False)
    q_int8 = laud_resnet.LAUDResNet(conv_impl="int8", **GEOM).apply(
        v, x, 0.1, training=False)
    np.testing.assert_array_equal(np.asarray(q_eval.logits),
                                  np.asarray(q_int8.logits))
