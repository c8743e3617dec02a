"""AOT export of serving functions (StableHLO artifacts).

The reference deploys PyTorch eager checkpoints; a TPU-native framework
deploys *compiled programs*. This module serializes a jitted serving
forward (model + trained weights, fixed batch geometry) to a portable
StableHLO artifact via ``jax.export`` — loadable in a weightless serving
process with ``load_serving_artifact`` and runnable on any backend
(CPU/TPU) that supports the ops, without the model-building Python code.

Weights are captured as constants so the artifact is self-contained; pair
with `train/checkpoint.py` (orbax) when you want weights separate.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_serving_fn(apply_fn: Callable, batch_shape: Sequence[int],
                      dtype: Any = jnp.float32,
                      platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``apply_fn(images) -> logits`` for a fixed input geometry.

    ``platforms`` defaults to the current backend; pass e.g.
    ``("cpu", "tpu")`` for a multi-platform artifact.
    """
    spec = jax.ShapeDtypeStruct(tuple(batch_shape), dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(apply_fn), **kwargs)(spec)
    return exported.serialize()


def save_serving_artifact(path: str, model, variables,
                          batch_shape: Sequence[int], *,
                          temperature: float = 0.1,
                          dtype: Any = jnp.float32,
                          platforms: Optional[Sequence[str]] = None,
                          metadata: Optional[dict] = None) -> str:
    """Export ``model.apply(variables, x, temperature).logits`` and write
    ``<path>.stablehlo`` + ``<path>.json`` (geometry + user metadata).
    Returns the artifact path."""

    def serve(x):
        return model.apply(variables, x, temperature, training=False).logits

    blob = export_serving_fn(serve, batch_shape, dtype, platforms)
    # user metadata may override the built-in keys (a dict(**kwargs)
    # merge would TypeError on e.g. metadata={'model': ...} AFTER the
    # expensive export, leaving a blob with no sidecar)
    meta = {
        "batch_shape": list(batch_shape),
        "dtype": jnp.dtype(dtype).name,
        "temperature": temperature,
        "model": type(model).__name__,
        **(metadata or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path + ".stablehlo", "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return path + ".stablehlo"


def load_serving_artifact(path: str) -> Callable:
    """Load a ``.stablehlo`` artifact back into a callable (weightless
    serving: no model code or checkpoint needed)."""
    if not path.endswith(".stablehlo"):
        path = path + ".stablehlo"
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
