"""Eval-with-info: per-image FLOPs/sparsity accounting over a dataset.

Rebuild of the reference's ``single_gpu_test_get_info``
(`mmdetection-2.21.0/mmdet/apis/test.py:75-145`) and its CLI
(`tools/test_get_info.py`): run the detector over images, accumulate mean
realized FLOPs, dense FLOPs, flops rate, and per-block sparsities.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np


def evaluate_get_info(apply_fn: Callable, images: Iterable) -> dict:
    """``apply_fn(image_batch) -> outputs`` with an ``additional`` entry.
    Returns aggregated statistics over the iterable."""
    n = 0
    flops = dense = rate = 0.0
    ch, ly, fp = None, None, None
    for batch in images:
        out = apply_fn(batch)
        add = jax.device_get(out["additional"])
        bsz = batch.shape[0]
        n += bsz
        flops += float(add["flops"]) * bsz
        dense += float(add["dense_flops"]) * bsz
        rate += float(add["flops"] / max(float(add["dense_flops"]), 1e-9)) * bsz
        ch = (np.asarray(add["channel_sparsity"]) * bsz
              if ch is None else ch + np.asarray(add["channel_sparsity"]) * bsz)
        ly = (np.asarray(add["layer_sparsity"]) * bsz
              if ly is None else ly + np.asarray(add["layer_sparsity"]) * bsz)
        fp = (np.asarray(add["flops_perc"]) * bsz
              if fp is None else fp + np.asarray(add["flops_perc"]) * bsz)
    if n == 0:
        raise ValueError("evaluate_get_info: empty image iterable")
    return {
        "n_images": n,
        "mean_flops": flops / n,
        "mean_dense_flops": dense / n,
        "mean_flops_rate": rate / n,
        "mean_channel_sparsity": ch / n,
        "mean_layer_sparsity": ly / n,
        "mean_flops_perc": fp / n,
    }
