"""Sparsity-training convergence: the full loop (Gumbel-ST + temperature
anneal + bounds criterion + KD) actually drives activation rate toward the
target — the behavioral claim behind the reference recipe
(`train_scripts.sh`: lambda_act 10, target 0.5, T 5.0->0.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.models.laud_vit import LAUDViT, vit_dense_flops
from laudnet_tpu.train import optim
from laudnet_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)


def test_vit_act_rate_converges_toward_target():
    model = LAUDViT(depth=2, dim=64, num_heads=4, mlp_ratio=2.0,
                    patch_size=8, num_classes=4)
    teacher = LAUDViT(depth=2, dim=64, num_heads=4, mlp_ratio=2.0,
                      patch_size=8, num_classes=4, token_skip=False,
                      head_skip=False, layer_skip=False)
    steps = 40
    cfg = TrainConfig(
        num_epochs=1, steps_per_epoch=steps, base_lr=0.1,
        target_rate=0.5, lambda_act=10.0,
        t_last_epoch=1, full_flops=vit_dense_flops(model, input_size=32),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (8,)), jnp.int32)

    variables = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)
    teacher_vars = teacher.init({"params": jax.random.PRNGKey(1)}, x,
                                1.0, training=False)
    optimizer = optim.make_sgd(variables["params"])
    state = create_train_state(model, optimizer, x,
                               rng=jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(model, teacher, teacher_vars,
                                      optimizer, cfg))
    rates = []
    for i in range(steps):
        state, m = step_fn(state, x, y, jax.random.PRNGKey(100 + i))
        rates.append(float(m["act_rate"]))
    # gates start biased open (~1.0); the sparsity loss must pull the
    # activation rate down toward the 0.5 target
    assert rates[0] > 0.85, rates[0]
    assert min(rates[-5:]) < rates[0] - 0.15, (rates[0], rates[-5:])
    assert np.isfinite(rates).all()
