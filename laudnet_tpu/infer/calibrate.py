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


def calibrate_channel_masks(mask_fn: Callable, batches: Iterable,
                            keep_threshold: float = 0.5):
    """Majority-vote channel-group masks for the static exporter.

    ``mask_fn(images) -> list of (B, G_b) per-block 0/1 masks`` (e.g. a
    model.apply wrapper capturing each block's channel mask). Returns one
    binary mask per block: groups kept on at least ``keep_threshold`` of
    calibration samples (always >= 1 group). Feed the result to
    :func:`laudnet_tpu.infer.export_pruned_resnet`; re-validate accuracy —
    this converts the dynamic policy into a static one.
    """
    sums, counts = None, 0
    for images in batches:
        masks = [np.asarray(m) for m in mask_fn(images)]
        if sums is None:
            sums = [m.sum(axis=0) for m in masks]
        else:
            sums = [s + m.sum(axis=0) for s, m in zip(sums, masks)]
        counts += masks[0].shape[0]
    out = []
    for s in sums:
        keep = (s / counts >= keep_threshold).astype(np.float32)
        if keep.sum() == 0:
            keep[int(np.argmax(s))] = 1.0
        out.append(keep)
    return out


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
