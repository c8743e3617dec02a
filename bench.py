"""Headline benchmark: LAUD-ResNet101 eval throughput vs dense ResNet-101.

Runs on whatever `jax.devices()[0]` is (the driver provides one real TPU
chip). Prints ONE JSON line:
``{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}`` where
``vs_baseline`` is LAUD img/s divided by dense ResNet-101 img/s on the same
chip — the reference's headline claim is LAUD-R101 target-0.5 beating dense
R101 wall-clock (BASELINE.md north star).

Currently benches the dense-masked eval path (correctness oracle); the
block-sparse inference engine will replace it as the LAUD number improves.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: TPU compiles here are remote and slow (30-120 s);
# caching makes repeated bench runs take seconds instead of minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
SIZE = 224
DTYPE = jnp.bfloat16
CHAIN = 30  # forwards chained inside one jitted fori_loop
REPEATS = 3

_loop_overhead = [None]


def _chain_time(step_fn, x) -> float:
    """Seconds per call of ``step_fn(x) -> logits``.

    Methodology (this tunneled TPU does not synchronize on
    block_until_ready and has ~20 ms readback round-trips): chain CHAIN
    calls inside one jitted fori_loop with a data dependency, fence with a
    scalar readback, and subtract the separately calibrated per-iteration
    loop overhead (~0.25-0.9 ms on the axon relay)."""

    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            y = step_fn(x)
            s = y.reshape(-1)[0].astype(jnp.float32)
            x = x + (s * 1e-20).astype(x.dtype)
            return (x, acc + s)

        _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.float32(0.0)))
        return acc

    float(chained(x))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def _throughput(step_fn, x) -> float:
    if _loop_overhead[0] is None:
        _loop_overhead[0] = _chain_time(lambda x: x[0, 0, 0, :], x)
    return BATCH / max(_chain_time(step_fn, x) - _loop_overhead[0], 1e-9)


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def main_r101_target05():
    """Headline: LAUD-ResNet101 channel target-0.5 deployed through the
    exact static export (`infer/export_pruned.py`) vs dense ResNet-101 —
    the BASELINE.json north-star metric shape. Masks here are synthetic 50%
    patterns (released checkpoints are not downloadable in this container);
    throughput depends only on the keep fraction, which the sparsity loss
    drives to the 0.5 target."""
    import numpy as np

    from laudnet_tpu.infer import export_pruned_resnet
    from laudnet_tpu.models import resnet101, uni_resnet101

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)), DTYPE)
    x32 = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)

    model = uni_resnet101(
        dyn_mode=("channel",) * 4, channel_dyn_granularity=(2, 2, 2, 2),
        channel_masker=("MLP",) * 4, channel_masker_layers=(2, 2, 2, 2),
    )
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x32,
                                   1.0, training=False))()
    params = jax.device_get(v["params"])
    scopes = [f"layer{s + 1}_{b}" for s, d in enumerate((3, 4, 23, 3))
              for b in range(d)]
    masks = []
    for scope in scopes:
        g = params[scope]["masker_channel"]["fc2"]["bias"].shape[0] // 2
        m = np.zeros(g, np.float32)
        m[rng.permutation(g)[: max(1, g // 2)]] = 1.0
        masks.append(m)
    vb = _cast({"params": params,
                "batch_stats": jax.device_get(v["batch_stats"])}, DTYPE)
    fwd = export_pruned_resnet(vb, masks, layers=(3, 4, 23, 3),
                               channel_dyn_granularity=(2, 2, 2, 2),
                               input_size=SIZE)
    laud_ips = _throughput(fwd, x)

    dense = resnet101()
    dv = _cast(jax.device_get(jax.jit(
        lambda: dense.init({"params": jax.random.PRNGKey(0)}, x32,
                           training=False))()), DTYPE)
    dense_ips = _throughput(lambda x: dense.apply(dv, x, training=False), x)
    print(json.dumps({
        "metric": ("images/sec/chip LAUD-ResNet101 channel-2222 target-0.5 "
                   "(exact static export) vs dense ResNet-101, bs128 bf16"),
        "value": round(laud_ips, 1),
        "unit": "img/s",
        "vs_baseline": round(laud_ips / dense_ips, 4),
    }))


def main_vit():
    """Headline: LAUD-DeiT-S with fixed-capacity token selection vs plain
    DeiT-S — the ViT-paradigm claim of the paper (panel (c)), realized
    TPU-native. vs_baseline > 1 means LAUD beats dense wall-clock."""
    from laudnet_tpu.models import laud_deit_small

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)), DTYPE)

    base = laud_deit_small()
    v = _cast(
        jax.jit(lambda: base.init({"params": jax.random.PRNGKey(0)},
                                  x.astype(jnp.float32), 1.0,
                                  training=False))(),
        DTYPE,
    )
    caps = (1.0, 1.0, 1.0) + (0.7,) * 4 + (0.5,) * 5  # AdaViT-style schedule
    select = laud_deit_small(token_capacity=caps)
    laud_ips = _throughput(
        lambda x: select.apply(v, x, jnp.asarray(0.1, DTYPE),
                               training=False).logits, x
    )

    plain = laud_deit_small(token_skip=False, head_skip=False,
                            layer_skip=False)
    vp = _cast(
        jax.jit(lambda: plain.init({"params": jax.random.PRNGKey(0)},
                                   x.astype(jnp.float32), 1.0,
                                   training=False))(),
        DTYPE,
    )
    dense_ips = _throughput(
        lambda x: plain.apply(vp, x, jnp.asarray(0.1, DTYPE),
                              training=False).logits, x
    )
    print(
        json.dumps(
            {
                "metric": ("images/sec/chip LAUD-DeiT-S token-select "
                           "(caps 1.0x3/0.7x4/0.5x5) vs dense DeiT-S, "
                           "bs128 bf16"),
                "value": round(laud_ips, 1),
                "unit": "img/s",
                "vs_baseline": round(laud_ips / dense_ips, 4),
            }
        )
    )


def main_resnet():
    from laudnet_tpu.models import resnet101, uni_resnet101

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)), DTYPE)

    # LAUD-ResNet101 channel-2222 (the released-checkpoint config family).
    laud = uni_resnet101(
        dyn_mode=("channel",) * 4,
        channel_dyn_granularity=(2, 2, 2, 2),
        channel_masker=("MLP",) * 4,
        channel_masker_layers=(2, 2, 2, 2),
    )
    laud_vars = jax.jit(
        lambda: laud.init(
            {"params": jax.random.PRNGKey(0)}, x.astype(jnp.float32), 1.0,
            training=False,
        )
    )()
    laud_vars = _cast(laud_vars, DTYPE)

    laud_ips = _throughput(
        lambda x: laud.apply(
            laud_vars, x, jnp.asarray(0.1, DTYPE), training=False
        ).logits,
        x,
    )

    dense = resnet101()
    dense_vars = jax.jit(
        lambda: dense.init(
            {"params": jax.random.PRNGKey(0)}, x.astype(jnp.float32),
            training=False,
        )
    )()
    dense_vars = _cast(dense_vars, DTYPE)
    dense_ips = _throughput(
        lambda x: dense.apply(dense_vars, x, training=False), x
    )

    print(
        json.dumps(
            {
                "metric": "images/sec/chip LAUD-ResNet101 channel-2222 eval bs128 bf16",
                "value": round(laud_ips, 1),
                "unit": "img/s",
                "vs_baseline": round(laud_ips / dense_ips, 4),
            }
        )
    )


def main():
    import sys

    if "--resnet-masked" in sys.argv:
        main_resnet()  # dense-masked graph vs dense (correctness oracle path)
    elif "--vit" in sys.argv:
        main_vit()  # LAUD-DeiT-S token selection (exact dynamic; 1.31x)
    else:
        main_r101_target05()  # north-star: R101 target-0.5 vs dense


if __name__ == "__main__":
    main()
