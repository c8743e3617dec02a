"""bf16 mixed-precision (AMP) training path.

The reference pins ``use_amp=False`` (`train/main.py:138`) because fp16
AMP destabilizes the Gumbel gating; on TPU bf16 keeps the f32 exponent
range, so the TPU-native framework enables it: body convs/matmuls/norms
compute in bfloat16 (the MXU's native dtype), while params stay f32
masters, gating heads force f32 (`models/maskers.py`), softmax reduces in
f32 and losses reduce in f32 (`train/losses.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.models.laud_resnet import LAUDResNet
from laudnet_tpu.models.laud_vit import LAUDViT, vit_dense_flops
from laudnet_tpu.models.laud_regnet import lad_regnet_y_400mf
from laudnet_tpu.train import optim
from laudnet_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)


def _tiny_resnet(**kw):
    return LAUDResNet(
        layers=(1, 1, 1, 1), num_classes=4, input_size=32,
        dyn_mode=("spatial",) * 4,
        mask_spatial_granularity=(1, 1, 1, 1), **kw,
    )


def test_resnet_amp_dtypes_and_f32_gating():
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    model = _tiny_resnet(dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)
    # params are f32 master copies regardless of compute dtype
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(p.dtype == jnp.float32 for p in leaves)
    out = model.apply(variables, x, 1.0, training=False)
    assert out.logits.dtype == jnp.bfloat16
    # gating stats are computed in f32 (maskers force f32 internally)
    assert out.flops_perc.dtype == jnp.float32
    assert np.isfinite(np.asarray(out.logits, np.float32)).all()


def test_resnet_amp_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    f32_model = _tiny_resnet()
    amp_model = _tiny_resnet(dtype=jnp.bfloat16)
    variables = f32_model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                               training=False)
    ref = f32_model.apply(variables, x, 1.0, training=False)
    amp = amp_model.apply(variables, x, 1.0, training=False)
    a = np.asarray(amp.logits, np.float32)
    r = np.asarray(ref.logits, np.float32)
    # bf16 has ~3 decimal digits; logits are O(1) at init
    np.testing.assert_allclose(a, r, atol=0.15)
    # gate decisions of a fresh (biased-open) model survive the rounding
    np.testing.assert_allclose(np.asarray(amp.flops_perc),
                               np.asarray(ref.flops_perc), atol=1e-2)


def test_vit_amp_forward_and_train_step():
    model = LAUDViT(depth=2, dim=64, num_heads=4, mlp_ratio=2.0,
                    patch_size=8, num_classes=4, dtype=jnp.bfloat16)
    teacher = LAUDViT(depth=2, dim=64, num_heads=4, mlp_ratio=2.0,
                      patch_size=8, num_classes=4, token_skip=False,
                      head_skip=False, layer_skip=False,
                      dtype=jnp.bfloat16)
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=4, base_lr=0.05,
                      target_rate=0.5, lambda_act=10.0, t_last_epoch=1,
                      full_flops=vit_dense_flops(model, input_size=32))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (4,)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)
    out = model.apply(variables, x, 1.0, training=False)
    assert out.logits.dtype == jnp.bfloat16
    teacher_vars = teacher.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                                training=False)
    optimizer = optim.make_sgd(variables["params"])
    state = create_train_state(model, optimizer, x,
                               rng=jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, teacher, teacher_vars,
                                      optimizer, cfg))
    losses = []
    for i in range(4):
        state, m = step_fn(state, x, y, jax.random.PRNGKey(10 + i))
        losses.append(float(m["loss"]))
        # the loss reduces in f32 even though the model emits bf16 logits
        assert m["loss"].dtype == jnp.float32
    assert np.isfinite(losses).all()
    # params stay f32 after updates (grads flow back through the casts)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(p.dtype == jnp.float32 for p in leaves)


def test_regnet_amp_forward():
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    model = lad_regnet_y_400mf(num_classes=4, input_size=32,
                               dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)
    out = model.apply(variables, x, 1.0, training=False)
    assert out.logits.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out.logits, np.float32)).all()
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(variables["params"]))
