"""Static channel-pruning export: exactness vs the dynamic masked graph."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.infer import export_pruned_resnet
from laudnet_tpu.models import laud_resnet


def test_export_matches_dynamic_model_for_fixed_masks():
    layers = (1, 1, 1, 1)
    gran = (2, 2, 2, 2)
    model = laud_resnet.LAUDResNet(
        layers=layers, num_classes=10, input_size=64,
        dyn_mode=("channel",) * 4,
        channel_dyn_granularity=gran,
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                           training=False)

    # force each block's masker to a FIXED mask: zero the kernel, set the
    # paired biases to +/-20 so the eval comparison is unambiguous
    params = jax.device_get(variables["params"])
    rng = np.random.default_rng(3)
    masks = []
    scopes = [s for s in sorted(params) if s.startswith("layer")]
    for scope in scopes:
        fc = params[scope]["masker_channel"]["fc"]
        g = fc["bias"].shape[0] // 2
        m = (rng.random(g) > 0.4).astype(np.float32)
        m[0] = 1.0  # keep at least one group
        bias = np.concatenate([np.where(m > 0, 20.0, -20.0),
                               np.where(m > 0, -20.0, 20.0)]).astype(
            np.float32)
        params[scope]["masker_channel"]["fc"] = {
            "kernel": jnp.zeros_like(fc["kernel"]),
            "bias": jnp.asarray(bias),
        }
        masks.append(m)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    out_dyn = model.apply(variables, x, 0.1, training=False)
    # confirm the forced masks were realized
    realized = np.concatenate([np.asarray(v) for v in out_dyn.channel_s])
    expected = np.asarray([m.mean() for m in masks])
    np.testing.assert_allclose(realized, expected, atol=1e-6)

    fwd = export_pruned_resnet(variables, masks, layers=layers,
                               channel_dyn_granularity=gran, input_size=64)
    got = jax.jit(fwd)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out_dyn.logits),
                               rtol=2e-4, atol=2e-4)
