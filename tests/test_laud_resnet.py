"""LAUD-ResNet forward tests: shapes, stats contract, FLOPs sanity, modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.models import laud_resnet, resnet


def tiny_model(dyn_mode, **kw):
    """A 1-1-1-1 bottleneck stack at 64px input for fast CPU tests."""
    defaults = dict(
        layers=(1, 1, 1, 1),
        num_classes=10,
        input_size=64,
        dyn_mode=(dyn_mode,) * 4,
        mask_spatial_granularity=(4, 4, 2, 1),
        channel_dyn_granularity=(1, 1, 1, 1),
        channel_masker=("MLP",) * 4,
        channel_masker_layers=(1, 1, 1, 1),
    )
    defaults.update(kw)
    return laud_resnet.LAUDResNet(**defaults)


@pytest.mark.parametrize("dyn_mode", ["spatial", "channel", "both", "layer"])
def test_forward_modes(dyn_mode):
    model = tiny_model(dyn_mode)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1)}, x, 1.0, training=False
    )
    out = model.apply(variables, x, 0.1, training=False)
    assert out.logits.shape == (2, 10)
    assert out.flops_perc.shape == (4,)  # one per block
    assert len(out.spatial_s3) == 4
    assert float(out.flops) > 0
    # densities in [0, 1]
    fp = np.asarray(out.flops_perc)
    assert (fp > 0).all() and (fp <= 1.0 + 1e-6).all()


def test_fresh_model_runs_dense_flops_percentage_near_one():
    # Masker bias init pushes gates open: a fresh model at eval keeps ~all.
    model = tiny_model("spatial")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out = model.apply(variables, x, 0.1, training=False)
    np.testing.assert_allclose(np.asarray(out.flops_perc), 1.0, atol=1e-5)


def test_training_mode_updates_batch_stats_and_uses_gumbel():
    model = tiny_model("both")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out, mutated = model.apply(
        variables, x, 5.0, training=True,
        rngs={"gumbel": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert out.logits.shape == (2, 10)


def test_gradients_flow_to_maskers():
    model = tiny_model("spatial")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, 5.0, training=True,
            rngs={"gumbel": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
        )
        # sparsity-style loss so masker grads exist even without labels
        return (out.flops_perc.mean() - 0.5) ** 2 + out.logits.sum() * 0.0

    grads = jax.grad(loss_fn)(variables["params"])
    masker_grad = grads["layer1_0"]["masker_spatial"]["conv"]["kernel"]
    assert float(jnp.abs(masker_grad).sum()) > 0


def test_dense_flops_match_formula_when_gates_open():
    """Fresh gates are fully open, so out.flops equals the dense count plus
    masker overhead; check against the analytic dense formula."""
    model = tiny_model("layer")
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out = model.apply(variables, x, 0.1, training=False)
    dense = resnet.resnet_dense_flops((1, 1, 1, 1), input_size=64, num_classes=10)
    # out.flops includes masker flops, so it is >= dense but close
    assert float(out.flops) >= dense
    assert float(out.flops) < dense * 1.02


def test_static_teacher_forward():
    model = resnet.ResNet(layers=(1, 1, 1, 1), num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    logits = model.apply(variables, x, training=False)
    assert logits.shape == (2, 10)


def test_jit_forward_no_recompile_across_temperature():
    """Temperature is a traced argument, so changing it must not retrace.
    Counted via a side effect at trace time rather than jit cache
    internals (`_cache_size` can be evicted under memory pressure, which
    made the internals-based assert flaky in full-suite runs)."""
    model = tiny_model("spatial")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    traces = []

    @jax.jit
    def fwd(v, x, t):
        traces.append(1)
        return model.apply(v, x, t, training=False)

    out1 = fwd(variables, x, jnp.float32(0.1))
    out2 = fwd(variables, x, jnp.float32(1.0))
    assert len(traces) == 1
    assert out1.logits.shape == out2.logits.shape


def test_basicblock_teachers():
    from laudnet_tpu.models import resnet18
    m = resnet18(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = m.apply(v, x, training=False)
    assert out.shape == (1, 10)


def test_extra_schedulers():
    from laudnet_tpu.train.schedules import lr_at
    lr = lr_at(0, base_lr=0.1, total_epochs=90, steps_per_epoch=100,
               scheduler="rmsprop_step", lr_decay_rate=0.9, lr_decay_step=3)
    assert abs(float(lr) - 0.1) < 1e-6
    lr2 = lr_at(350, base_lr=0.1, total_epochs=90, steps_per_epoch=100,
                scheduler="rmsprop_step", lr_decay_rate=0.9, lr_decay_step=3)
    assert float(lr2) < 0.1
    lr3 = lr_at(3100, base_lr=0.1, total_epochs=90, steps_per_epoch=100,
                scheduler="exponential", lr_decay_rate=0.1, lr_decay_step=30)
    assert abs(float(lr3) - 0.01) < 1e-6
