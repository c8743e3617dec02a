"""FLOPs measurement (the reference's op_counter, TPU-native).

The reference monkey-patches every torch module's forward to accumulate
multiply-adds (`models/op_counter.py:147-192`). Under XLA we don't patch
anything: ``measure_model`` asks the compiler for the exact FLOP count of
the compiled computation (``cost_analysis``), and ``measure_model_analytic``
provides the closed-form multiply-add count matching the reference's
bookkeeping convention (used for ``full_flops`` in the sparsity loss,
`train/main.py:297-311`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def measure_model(apply_fn, *example_args) -> float:
    """Exact compiled FLOPs of ``apply_fn(*example_args)`` via XLA cost
    analysis. Note XLA counts one multiply-add as 2 flops; divide by 2 to
    compare with the reference's multiply-add convention."""
    lowered = jax.jit(apply_fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def measure_model_macs(apply_fn, *example_args) -> float:
    """Compiled multiply-adds (reference convention)."""
    return measure_model(apply_fn, *example_args) / 2.0


def resnet_full_flops(layers, input_size: int = 224, width_mult: float = 1.0,
                      num_classes: int = 1000) -> float:
    """Closed-form dense multiply-adds for the ResNet family, matching the
    in-graph bookkeeping (`laud_resnet.py:112-147`); the reference's
    ``full_flops`` for the sparsity target."""
    from laudnet_tpu.models.resnet import resnet_dense_flops

    return resnet_dense_flops(layers, input_size=input_size,
                              width_mult=width_mult, num_classes=num_classes)
