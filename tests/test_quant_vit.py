"""W8A8 int8 serving path (`ops/quant.py`, `fused_vit_block_int8`,
`build_fused_vit(int8=True)`): quantizer error bounds, kernel equivalence
to the plain-JAX quantized reference (interpret mode), and end-to-end
closeness to the bf16 engine."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.infer.fused_vit import build_fused_vit
from laudnet_tpu.models.laud_vit import LAUDViT
from laudnet_tpu.ops.pallas.vit_block import fused_vit_block_int8
from laudnet_tpu.ops.quant import int8_linear, quantize_rows, quantize_weight

GEOM = dict(depth=2, dim=256, num_heads=4, mlp_ratio=2.0, num_classes=11)


def test_quantize_weight_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96)) * 0.05, jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (96,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    # symmetric rounding: error <= scale/2 per element
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-8).all()


def test_quantize_rows_masked_rows_stay_zero():
    x = jnp.zeros((3, 16), jnp.float32).at[0].set(1.5)
    q, s = quantize_rows(x)
    assert np.asarray(q[1:]).sum() == 0 and float(q[0].max()) == 127


def test_int8_linear_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.05, jnp.float32)
    wq, ws = quantize_weight(w)
    got = int8_linear(x, wq, ws, b)
    ref = x @ w + b
    # w8a8 relative error on well-scaled data is ~1e-2
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def _block_params(rng, d, hidden):
    def mkd(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    return {
        "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "ln2": {"scale": mkd((d,)) + 1.0, "bias": mkd((d,))},
        "qkv": {"kernel": mkd((d, 3 * d)), "bias": mkd((3 * d,))},
        "proj": {"kernel": mkd((d, d)), "bias": mkd((d,))},
        "fc1": {"kernel": mkd((d, hidden)), "bias": mkd((hidden,))},
        "fc2": {"kernel": mkd((hidden, d)), "bias": mkd((d,))},
    }


def _quantize_block(params):
    qp = {"ln1": params["ln1"], "ln2": params["ln2"]}
    for name in ("qkv", "proj", "fc1", "fc2"):
        kq, ks = quantize_weight(params[name]["kernel"])
        qp[name] = {"kernel_q": kq, "scale": ks,
                    "bias": params[name]["bias"]}
    return qp


def test_int8_block_matches_quantized_reference():
    """The int8 kernel equals the same quantized math composed from
    `ops/quant.py` plain-JAX ops (f32 inputs -> f32 attention in both, so
    the only difference is op scheduling)."""
    rng = np.random.default_rng(2)
    b, l, d, h = 2, 19, 256, 4
    hidden = 512
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = jnp.asarray((rng.random((b, l)) > 0.3), jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    params = _block_params(rng, d, hidden)
    qp = _quantize_block(params)

    def ln(y, p):
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return (y - mu) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]

    def reference(x):
        h1 = ln(x, params["ln1"])
        qkv = int8_linear(h1.reshape(b * l, d), qp["qkv"]["kernel_q"],
                          qp["qkv"]["scale"], qp["qkv"]["bias"])
        qkv = qkv.reshape(b, l, 3, h, d // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = (q @ k.transpose(0, 1, 3, 2)) * (d // h) ** -0.5
        s = s + (1.0 - mask)[:, None, None, :] * -1e9
        o = (jax.nn.softmax(s, -1) @ v).transpose(0, 2, 1, 3).reshape(
            b, l, d)
        proj = int8_linear(o.reshape(b * l, d), qp["proj"]["kernel_q"],
                           qp["proj"]["scale"],
                           qp["proj"]["bias"]).reshape(b, l, d)
        x2 = x + proj * mask[:, :, None]
        h2 = ln(x2, params["ln2"])
        u = jax.nn.gelu(
            int8_linear(h2.reshape(b * l, d), qp["fc1"]["kernel_q"],
                        qp["fc1"]["scale"], qp["fc1"]["bias"]),
            approximate=False)
        y = int8_linear(u, qp["fc2"]["kernel_q"], qp["fc2"]["scale"],
                        qp["fc2"]["bias"]).reshape(b, l, d)
        return x2 + y * mask[:, :, None]

    ref = reference(x)
    out = fused_vit_block_int8(x, mask.reshape(b, 1, l),
                               mask.reshape(b, l, 1), qp, num_heads=h,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def _x(b=2, s=64, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, s, s, 3)),
        jnp.float32)


def test_int8_fused_vit_close_to_bf16_engine():
    """End-to-end int8 engine vs the exact engine: logits within w8a8
    error, argmax preserved on a random-init model (the bench reports the
    measured agreement on real weights as the honesty metric)."""
    x = _x(b=4, seed=7)
    dense = LAUDViT(token_skip=False, head_skip=False, layer_skip=False,
                    **GEOM)
    v = jax.jit(lambda: dense.init({"params": jax.random.PRNGKey(0)}, x,
                                   1.0, training=False))()
    exact = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                            interpret=True)(x)
    q = build_fused_vit(v, depth=2, dim=256, num_heads=4, int8=True,
                        interpret=True)(x)
    rel = float(jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact))
    assert rel < 0.05, rel
    assert (jnp.argmax(q, -1) == jnp.argmax(exact, -1)).all()


def test_int8_head_gated_composes():
    """head_gating + int8 in the block kernel: the gate multiplies the
    attention output inside the quantized kernel, staying close to the
    bf16 head-gated engine (some heads forced closed so the gate bites)."""
    import flax

    x = _x(seed=17)
    base = LAUDViT(token_skip=False, layer_skip=False, head_skip=True,
                   **GEOM)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(3)}, x,
                                  1.0, training=False))()
    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    bias = v["params"]["block_0"]["head_policy"]["bias"]
    v["params"]["block_0"]["head_policy"]["bias"] = bias.at[1].set(-5.0)

    exact = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                            head_gating=True, interpret=True)(x)
    q = build_fused_vit(v, depth=2, dim=256, num_heads=4, head_gating=True,
                        int8=True, interpret=True)(x)
    rel = float(jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact))
    assert rel < 0.05, rel
    assert (jnp.argmax(q, -1) == jnp.argmax(exact, -1)).all()


def test_int8_fused_engine_shards_over_data_mesh():
    """The int8 block engine partitions along the batch grid under
    shard_map exactly like the bf16 one (ServingEngine's mesh path) —
    per-shard outputs equal the single-device engine."""
    from jax.sharding import PartitionSpec as P

    from laudnet_tpu.parallel.mesh import make_mesh

    x = _x(b=8, seed=13)
    dense = LAUDViT(token_skip=False, head_skip=False, layer_skip=False,
                    **GEOM)
    v = jax.jit(lambda: dense.init({"params": jax.random.PRNGKey(0)}, x,
                                   1.0, training=False))()
    fwd = build_fused_vit(v, depth=2, dim=256, num_heads=4, int8=True,
                          interpret=True)
    mesh = make_mesh()
    sharded = jax.jit(jax.shard_map(fwd, mesh=mesh, in_specs=P("data"),
                                    out_specs=P("data"), check_vma=False))
    a, b = np.asarray(sharded(x)), np.asarray(fwd(x))
    # CPU Eigen retiles matmuls by batch size, so a 1-ulp pre-quant
    # difference can flip an int8 code between the B=1 shards and the
    # B=8 reference — tolerate a few flipped quanta, require the same
    # predictions (on TPU the MXU accumulation order is batch-invariant)
    assert np.abs(a - b).max() < 0.05, np.abs(a - b).max()
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_linear_impl_int8_checkpoint_compatible():
    """`LAUDViT(linear_impl='int8')` loads the SAME variables as the dense
    model (QuantDense mirrors nn.Dense param names/inits), quantizes only
    at eval, and stays close to dense logits — the int8 path for
    fused-attention-only geometries (T2T's odd 7 heads)."""
    geom = dict(depth=2, dim=224, num_heads=7, mlp_ratio=2.0,
                num_classes=11, token_skip=False, head_skip=False,
                layer_skip=False)
    x = _x(b=2, s=64, seed=11)
    dense = LAUDViT(**geom)
    v = jax.jit(lambda: dense.init({"params": jax.random.PRNGKey(0)}, x,
                                   1.0, training=False))()
    qmodel = LAUDViT(linear_impl="int8", **geom)
    ref = dense.apply(v, x, 0.1, training=False).logits
    q = qmodel.apply(v, x, 0.1, training=False).logits
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert 0 < rel < 0.05, rel
    assert (jnp.argmax(q, -1) == jnp.argmax(ref, -1)).all()
    # training always runs dense math (identical graph, bit-equal)
    rt = qmodel.apply(v, x, 1.0, training=True,
                      rngs={"gumbel": jax.random.PRNGKey(2)}).logits
    rd = dense.apply(v, x, 1.0, training=True,
                     rngs={"gumbel": jax.random.PRNGKey(2)}).logits
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(rd))
    # fresh init of the int8 model produces the same param tree
    vq = jax.jit(lambda: qmodel.init({"params": jax.random.PRNGKey(0)}, x,
                                     1.0, training=False))()
    assert (jax.tree_util.tree_structure(vq)
            == jax.tree_util.tree_structure(v))


def test_fake_quant_straight_through():
    """QAT fake-quant: forward equals the dequantized int8 values;
    backward is the identity (straight-through)."""
    from laudnet_tpu.ops.quant import (fake_quant_rows, fake_quant_weight,
                                       quantize_weight)

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.05, jnp.float32)
    fq = fake_quant_weight(w)
    q, s = quantize_weight(w)
    np.testing.assert_allclose(np.asarray(fq),
                               np.asarray(q, np.float32) * np.asarray(s),
                               atol=1e-7)
    g = jax.grad(lambda w: (fake_quant_weight(w) ** 2).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(fq), atol=1e-6)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    gx = jax.grad(lambda x: fake_quant_rows(x).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.ones_like(gx))


def test_linear_impl_int8_qat_trains_under_int8_numerics():
    """'int8_qat': the TRAINING forward runs fake-quant (close to the
    eval int8 engine, not to the dense graph), and gradients flow to
    every body matmul weight."""
    geom = dict(depth=2, dim=224, num_heads=7, mlp_ratio=2.0,
                num_classes=11, token_skip=False, head_skip=False,
                layer_skip=False)
    x = _x(b=2, s=64, seed=19)
    dense = LAUDViT(**geom)
    v = jax.jit(lambda: dense.init({"params": jax.random.PRNGKey(0)}, x,
                                   1.0, training=False))()
    qat = LAUDViT(linear_impl="int8_qat", **geom)
    train_logits = qat.apply(v, x, 1.0, training=True,
                             rngs={"gumbel": jax.random.PRNGKey(1)}).logits
    eval_int8 = LAUDViT(linear_impl="int8", **geom).apply(
        v, x, 0.1, training=False).logits
    dense_logits = dense.apply(v, x, 1.0, training=True,
                               rngs={"gumbel": jax.random.PRNGKey(1)}).logits
    d_int8 = float(jnp.linalg.norm(train_logits - eval_int8))
    d_dense = float(jnp.linalg.norm(train_logits - dense_logits))
    assert 0 < d_int8 < d_dense  # QAT graph tracks int8, not dense

    def loss(params):
        out = qat.apply({"params": params}, x, 1.0, training=True,
                        rngs={"gumbel": jax.random.PRNGKey(1)})
        return (out.logits ** 2).mean()

    g = jax.grad(loss)(v["params"])
    for name in ("qkv", "proj", "fc1", "fc2"):
        gn = float(jnp.abs(g["block_0"][name]["kernel"]).max())
        assert gn > 0, name


def test_int8_fused_vit_selection_path():
    """Token selection composes with the int8 kernel (the policy heads and
    top-k stay float; only the block matmuls quantize)."""
    x = _x(seed=3)
    base = LAUDViT(head_skip=False, layer_skip=False, **GEOM)
    v = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(1)}, x,
                                  1.0, training=False))()
    caps = (1.0, 0.5)
    exact = build_fused_vit(v, depth=2, dim=256, num_heads=4,
                            token_capacity=caps, interpret=True)(x)
    q = build_fused_vit(v, depth=2, dim=256, num_heads=4, int8=True,
                        token_capacity=caps, interpret=True)(x)
    rel = float(jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact))
    assert rel < 0.05, rel
