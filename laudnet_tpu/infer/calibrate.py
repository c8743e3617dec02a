"""Capacity calibration for the static-shape serving paths.

The serving paths (ViT token selection, CNN patch capacity) need fixed
budgets; this module measures the realized densities of a trained model
over calibration data and converts a quantile (+ safety margin) into
per-block capacities — the step that makes capacity-based execution
*exact* in practice (budget >= realized keep-count => bit-equivalence with
the masked graph; see `models/laud_vit.py` token_capacity docs).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np


def calibrate_token_capacity(apply_fn: Callable, batches: Iterable,
                             quantile: float = 0.99,
                             margin: float = 0.05) -> Sequence[float]:
    """``apply_fn(images) -> LAUDViTOutput``; returns per-block keep
    fractions covering ``quantile`` of calibration batches plus ``margin``.
    """
    per_block = []
    for images in batches:
        out = apply_fn(images)
        per_block.append(np.asarray(out.token_density))
    dens = np.stack(per_block)  # (n_batches, depth)
    caps = np.quantile(dens, quantile, axis=0) + margin
    return tuple(float(min(c, 1.0)) for c in caps)


def calibrate_patch_capacity(apply_fn: Callable, batches: Iterable,
                             quantile: float = 0.99,
                             margin: float = 0.05) -> Sequence[float]:
    """Same for CNN spatial blocks: ``apply_fn(images) -> LAUDOutput``;
    returns per-stage capacities from the conv3-mask densities."""
    per_stage = []
    for images in batches:
        out = apply_fn(images)
        per_stage.append(
            np.asarray([float(np.asarray(s).max()) for s in out.spatial_s3])
        )
    dens = np.stack(per_stage)
    caps = np.quantile(dens, quantile, axis=0) + margin
    return tuple(float(min(c, 1.0)) for c in caps)
