"""AOT StableHLO serving artifacts: export -> deserialize -> same logits."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.infer.aot import (
    export_serving_fn,
    load_serving_artifact,
    save_serving_artifact,
)
from laudnet_tpu.models.laud_vit import LAUDViT


def test_roundtrip_tiny_vit(tmp_path):
    m = LAUDViT(depth=2, dim=64, num_heads=4, mlp_ratio=2.0, patch_size=8,
                num_classes=10, head_skip=False, layer_skip=False,
                token_capacity=(1.0, 0.5))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)

    path = save_serving_artifact(str(tmp_path / "vit"), m, v, (2, 32, 32, 3),
                                 metadata=dict(note="test"))
    meta = json.load(open(str(tmp_path / "vit.json")))
    assert meta["batch_shape"] == [2, 32, 32, 3]
    assert meta["model"] == "LAUDViT"

    serve = load_serving_artifact(path)
    got = serve(x)
    want = m.apply(v, x, 0.1, training=False).logits
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_roundtrip_int8_engine():
    """The W8A8 block engine exports through jax.export and round-trips
    (interpret mode on CPU; on TPU the kernels serialize as custom calls
    — the bf16 path is verified there, see docs/SERVING.md §4)."""
    from laudnet_tpu.infer.fused_vit import build_fused_vit

    m = LAUDViT(depth=2, dim=256, num_heads=4, mlp_ratio=2.0,
                num_classes=11, token_skip=False, head_skip=False,
                layer_skip=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                               training=False))()
    fwd = build_fused_vit(v, depth=2, dim=256, num_heads=4, int8=True,
                          interpret=True)
    blob = export_serving_fn(fwd, (2, 64, 64, 3))
    from jax import export as jax_export

    served = jax_export.deserialize(blob).call
    np.testing.assert_allclose(np.asarray(served(x)), np.asarray(fwd(x)),
                               rtol=1e-5, atol=1e-5)


def test_export_rejects_wrong_shape(tmp_path):
    def f(x):
        return x * 2.0

    blob = export_serving_fn(f, (4, 3))
    from jax import export as jax_export

    exp = jax_export.deserialize(blob)
    np.testing.assert_allclose(
        np.asarray(exp.call(jnp.ones((4, 3)))), 2.0)
    try:
        exp.call(jnp.ones((5, 3)))
        raised = False
    except Exception:
        raised = True
    assert raised  # fixed geometry is part of the artifact contract
